"""Chunked host->device transfer equals a plain asarray."""

import jax.numpy as jnp
import numpy as np

from mysteryann_tpu.utils.transfer import to_device_chunked


def test_chunked_matches_plain(monkeypatch):
    import mysteryann_tpu.utils.transfer as tr
    # force the chunked path on a small array
    monkeypatch.setattr(tr, "_DIRECT_BYTES", 1024)
    monkeypatch.setattr(tr, "_CHUNK_BYTES", 4096)
    x = np.random.default_rng(3).standard_normal((700, 17)).astype(np.float32)
    got = tr.to_device_chunked(x)
    np.testing.assert_array_equal(np.asarray(got), x)
    # dtype conversion path
    xi = (x * 100).astype(np.int64)
    got_i = tr.to_device_chunked(xi, jnp.int32)
    np.testing.assert_array_equal(np.asarray(got_i), xi.astype(np.int32))


def test_small_and_device_passthrough():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    a = to_device_chunked(x)
    np.testing.assert_array_equal(np.asarray(a), x)
    b = to_device_chunked(a)        # device array passthrough
    assert b is a
    c = to_device_chunked(a, jnp.int32)
    assert c.dtype == jnp.int32
