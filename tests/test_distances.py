import numpy as np
import jax.numpy as jnp

from mysteryann_tpu.ops import (
    Metric,
    pairwise_dist,
    point_dist,
    normalize_rows,
)
from mysteryann_tpu.ops.distances import prepare_vectors


def _np_l2(q, b):
    return ((q[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def test_pairwise_ip_negated(rng):
    q = rng.standard_normal((7, 32)).astype(np.float32)
    b = rng.standard_normal((13, 32)).astype(np.float32)
    d = np.asarray(pairwise_dist(jnp.array(q), jnp.array(b), Metric.IP, precision="highest"))
    np.testing.assert_allclose(d, -(q @ b.T), rtol=1e-5, atol=1e-5)


def test_pairwise_l2(rng):
    q = rng.standard_normal((5, 48)).astype(np.float32)
    b = rng.standard_normal((9, 48)).astype(np.float32)
    d = np.asarray(pairwise_dist(jnp.array(q), jnp.array(b), Metric.L2, precision="highest"))
    np.testing.assert_allclose(d, _np_l2(q, b), rtol=1e-4, atol=1e-4)


def test_pairwise_cosine_matches_normalized_ip(rng):
    q = rng.standard_normal((4, 16)).astype(np.float32) * 3
    b = rng.standard_normal((6, 16)).astype(np.float32) * 5
    qn = prepare_vectors(q, Metric.COSINE)
    bn = prepare_vectors(b, Metric.COSINE)
    d = np.asarray(pairwise_dist(qn, bn, Metric.COSINE, precision="highest"))
    qn_, bn_ = np.asarray(qn), np.asarray(bn)
    np.testing.assert_allclose(d, -(qn_ @ bn_.T), rtol=1e-5, atol=1e-5)
    assert np.all(d >= -1 - 1e-5) and np.all(d <= 1 + 1e-5)


def test_point_dist_consistent_with_pairwise(rng):
    a = rng.standard_normal((8, 24)).astype(np.float32)
    b = rng.standard_normal((8, 24)).astype(np.float32)
    for m in (Metric.IP, Metric.L2):
        pd = np.asarray(point_dist(jnp.array(a), jnp.array(b), m))
        pw = np.asarray(pairwise_dist(jnp.array(a), jnp.array(b), m, precision="highest"))
        np.testing.assert_allclose(pd, np.diag(pw), rtol=1e-4, atol=1e-4)


def test_normalize_rows(rng):
    x = rng.standard_normal((10, 20)).astype(np.float32) * 10
    n = np.asarray(normalize_rows(jnp.array(x)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    # zero row doesn't NaN
    z = np.asarray(normalize_rows(jnp.zeros((1, 4))))
    assert np.all(np.isfinite(z))
