"""Dataset-prep layer: npy export, frame pooling, registry, CLI."""

import os

import numpy as np
import pytest

from mysteryann_tpu.io import read_fbin
from mysteryann_tpu.io.datasets import (REGISTRY, export_fbin_from_npy,
                                        pool_frame_embeddings,
                                        pool_frame_embeddings_batch, prepare)


def test_export_fbin_from_npy(tmp_path):
    rng = np.random.default_rng(0)
    shards = []
    rows = []
    for i, n in enumerate((100, 37, 263)):
        a = rng.normal(size=(n, 24)).astype(np.float64)  # f64 on purpose
        p = str(tmp_path / f"s{i}.npy")
        np.save(p, a)
        shards.append(p)
        rows.append(a.astype(np.float32))
    out = str(tmp_path / "out.fbin")
    npts, dim = export_fbin_from_npy(shards, out, chunk_rows=50)
    assert (npts, dim) == (400, 24)
    got = read_fbin(out)
    np.testing.assert_array_equal(got, np.concatenate(rows))


def test_export_normalize(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(50, 8)).astype(np.float32) * 7
    p = str(tmp_path / "a.npy")
    np.save(p, a)
    out = str(tmp_path / "n.fbin")
    export_fbin_from_npy([p], out, normalize=True)
    got = read_fbin(out)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-5)


def test_export_dim_mismatch(tmp_path):
    np.save(str(tmp_path / "a.npy"), np.zeros((4, 8), np.float32))
    np.save(str(tmp_path / "b.npy"), np.zeros((4, 9), np.float32))
    with pytest.raises(ValueError):
        export_fbin_from_npy([str(tmp_path / "a.npy"),
                              str(tmp_path / "b.npy")],
                             str(tmp_path / "o.fbin"))


def test_pool_frame_embeddings_matches_reference_math():
    rng = np.random.default_rng(2)
    frames = rng.normal(size=(12, 32)).astype(np.float32) * 3
    v = pool_frame_embeddings(frames)
    # reference math (prepare_for_clip_webvid.py:93-99)
    nrm = np.linalg.norm(frames, axis=1, keepdims=True)
    expect = (frames / nrm).mean(axis=0)
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(v, expect, rtol=1e-6)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_pool_batch_matches_loop():
    rng = np.random.default_rng(3)
    counts = np.array([3, 7, 1, 12])
    frames = rng.normal(size=(counts.sum(), 16)).astype(np.float32)
    batched = pool_frame_embeddings_batch(frames, counts)
    off = 0
    for i, c in enumerate(counts):
        single = pool_frame_embeddings(frames[off:off + c])
        np.testing.assert_allclose(batched[i], single, rtol=2e-5, atol=2e-6)
        off += c


def test_registry_complete():
    assert set(REGISTRY) == {"t2i-10M", "laion-10M", "webvid-2.5M"}
    for spec in REGISTRY.values():
        assert spec.dim in (200, 512)
        assert spec.metric in ("ip", "cosine")
        assert spec.remotes
    # byte-range math matches reference prepare_data.sh:23-27
    t2i = REGISTRY["t2i-10M"]
    train = next(r for r in t2i.remotes if r.filename.startswith("query.tr"))
    assert train.byte_range() == 200 * 4 * 10_000_000 + 8


def test_prepare_airgapped_raises(tmp_path, monkeypatch):
    import urllib.request

    def boom(*a, **k):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    with pytest.raises(RuntimeError, match="stage these files"):
        prepare("t2i-10M", str(tmp_path))


def test_prepare_unknown():
    with pytest.raises(ValueError):
        prepare("nope")


def test_export_cli(tmp_path):
    from mysteryann_tpu.cli.export_fbin import main

    rng = np.random.default_rng(4)
    np.save(str(tmp_path / "v0.npy"), rng.normal(size=(5, 8)))
    np.save(str(tmp_path / "v1.npy"), rng.normal(size=(9, 8)))
    out = str(tmp_path / "pooled.fbin")
    assert main(["--npy", str(tmp_path / "v0.npy"), str(tmp_path / "v1.npy"),
                 "--out", out, "--pool_videos"]) == 0
    got = read_fbin(out)
    assert got.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-5)


def test_prepare_data_cli_list(capsys):
    from mysteryann_tpu.cli.prepare_data import main

    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "t2i-10M" in out and "webvid-2.5M" in out
