"""Device-side corpus generator: random access + distribution checks.

CrossModalDeviceSpec defines the corpus as a deterministic function of the
row index (counter-based fold_in keys), which is what lets >HBM-in-f32
corpora (50M x 128) be streamed, quantized, and reranked on device without
a host copy (io/synthetic.py). These tests pin the contract that makes
that safe: same indices yield the same rows — bit-identical at equal batch
shape, float-reassociation-close (~1e-7, from XLA re-tiling the projection
matmul) across different shapes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mysteryann_tpu.io.synthetic import CrossModalDeviceSpec


@pytest.fixture(scope="module")
def spec():
    return CrossModalDeviceSpec(dim=64, seed=11)


def test_random_access_matches_tiles(spec):
    tile = np.asarray(spec.base_tile(0, 2048))
    # same shape, different start -> bit-identical
    again = np.asarray(spec.base_tile(0, 2048))
    np.testing.assert_array_equal(tile, again)
    # arbitrary order, duplicates, different batch shapes -> float-close
    ids = jnp.asarray([7, 7, 2047, 0, 1024, 3], jnp.int32)
    rows = np.asarray(spec.rows(ids))
    np.testing.assert_allclose(rows, tile[np.asarray(ids)],
                               rtol=0, atol=1e-6)
    mid = np.asarray(spec.base_tile(1000, 48))
    np.testing.assert_allclose(mid, tile[1000:1048], rtol=0, atol=1e-6)


def test_streams_are_disjoint(spec):
    b = np.asarray(spec.rows(jnp.arange(16, dtype=jnp.int32)))
    q = np.asarray(spec.rows(jnp.arange(16, dtype=jnp.int32),
                             query_side=True))
    assert not np.allclose(b, q)


def test_distribution_shape(spec):
    base = np.asarray(spec.base_tile(0, 4096))
    queries = np.asarray(spec.queries(256))
    # ip metric -> unit norm (CLIP-style)
    np.testing.assert_allclose(np.linalg.norm(base, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(queries, axis=1), 1.0,
                               atol=1e-5)
    # manifold structure: true neighbors concentrate (not a uniform cloud),
    # but queries still see many distinct base points (not degenerate)
    top = np.argsort(-(queries @ base.T), axis=1)[:, :10]
    distinct = len(np.unique(top))
    assert 50 < distinct < 2000, distinct


def test_seed_changes_corpus():
    a = np.asarray(CrossModalDeviceSpec(dim=32, seed=1).base_tile(0, 8))
    b = np.asarray(CrossModalDeviceSpec(dim=32, seed=2).base_tile(0, 8))
    assert not np.allclose(a, b)
