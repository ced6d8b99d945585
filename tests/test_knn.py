import numpy as np

from mysteryann_tpu.ops import Metric, exact_knn, compute_ground_truth
from mysteryann_tpu.io import make_cross_modal


def _brute(q, b, k, metric):
    if metric == "l2":
        d = ((q[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    else:
        d = -(q @ b.T)
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, ids, axis=1), ids


def test_exact_knn_matches_numpy_ip(rng):
    b = rng.standard_normal((500, 32)).astype(np.float32)
    q = rng.standard_normal((40, 32)).astype(np.float32)
    d, i = exact_knn(q, b, k=10, metric="ip", query_batch=16, base_tile=128,
                     precision="highest")
    gd, gi = _brute(q, b, 10, "ip")
    np.testing.assert_allclose(d, gd, rtol=1e-4, atol=1e-4)
    assert (i == gi).mean() > 0.99  # ties may reorder


def test_exact_knn_matches_numpy_l2(rng):
    b = rng.standard_normal((300, 17)).astype(np.float32)
    q = rng.standard_normal((25, 17)).astype(np.float32)
    d, i = exact_knn(q, b, k=5, metric="l2", query_batch=32, base_tile=64,
                     precision="highest")
    gd, gi = _brute(q, b, 5, "l2")
    np.testing.assert_allclose(d, gd, rtol=1e-3, atol=1e-3)
    assert (i == gi).mean() > 0.99


def test_exact_knn_uneven_tiles(rng):
    # N not divisible by tile: padding must never be selected
    b = rng.standard_normal((101, 8)).astype(np.float32)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    d, i = exact_knn(q, b, k=101, metric="l2", base_tile=33, precision="highest")
    assert np.all(i >= 0) and np.all(i < 101)
    assert np.all(np.isfinite(d))
    # all ids present exactly once
    for row in i:
        assert len(set(row.tolist())) == 101


def test_compute_ground_truth_sorted(rng):
    base, q = make_cross_modal(800, 50, 24, metric="ip", seed=3)
    ids, dists = compute_ground_truth(q, base, k=10, metric="ip")
    assert ids.dtype == np.uint32
    assert np.all(np.diff(dists, axis=1) >= -1e-6)  # ascending
