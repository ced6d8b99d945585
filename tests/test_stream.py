"""Native streaming fbin reader."""

import numpy as np

from mysteryann_tpu.io import write_fbin
from mysteryann_tpu.io.stream import stream_fbin, load_fbin_to_device


def test_stream_matches_full_read(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(1000, 24)).astype(np.float32)
    p = str(tmp_path / "a.fbin")
    write_fbin(p, a)
    got, rows = [], []
    for row, chunk in stream_fbin(p, chunk_rows=130):
        rows.append(row)
        got.append(chunk)
    assert rows == list(range(0, 1000, 130))
    np.testing.assert_array_equal(np.concatenate(got), a)


def test_stream_exact_multiple(tmp_path):
    a = np.arange(512 * 4, dtype=np.float32).reshape(512, 4)
    p = str(tmp_path / "b.fbin")
    write_fbin(p, a)
    chunks = list(stream_fbin(p, chunk_rows=128))
    assert [r for r, _ in chunks] == [0, 128, 256, 384]
    np.testing.assert_array_equal(np.concatenate([c for _, c in chunks]), a)


def test_load_to_device(tmp_path):
    a = np.random.default_rng(1).normal(size=(300, 16)).astype(np.float32)
    p = str(tmp_path / "c.fbin")
    write_fbin(p, a)
    buf = load_fbin_to_device(p, chunk_rows=77)
    np.testing.assert_allclose(np.asarray(buf), a, rtol=1e-7)


def test_stream_python_fallback(tmp_path, monkeypatch):
    from mysteryann_tpu import native

    monkeypatch.setattr(native, "lib", lambda: None)
    a = np.random.default_rng(2).normal(size=(100, 8)).astype(np.float32)
    p = str(tmp_path / "d.fbin")
    write_fbin(p, a)
    got = np.concatenate([c for _, c in stream_fbin(p, chunk_rows=33)])
    np.testing.assert_array_equal(got, a)


def test_stream_rejects_trailing_bytes(tmp_path):
    # native and python paths must BOTH reject a corrupt file (the
    # native opener reads only the header, so validation lives in
    # stream_fbin itself)
    import pytest
    from mysteryann_tpu.io import write_fbin
    rng = np.random.default_rng(0)
    p = str(tmp_path / "bad.fbin")
    write_fbin(p, rng.standard_normal((50, 8)).astype(np.float32))
    with open(p, "ab") as f:
        f.write(b"\x00" * 12)
    with pytest.raises(ValueError, match="bytes"):
        list(stream_fbin(p, chunk_rows=16))
