"""Flat MXU index: exactness, metrics, benchmark schema."""

import numpy as np
import pytest

from mysteryann_tpu.flat import FlatIndex
from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ops import exact_knn
from mysteryann_tpu.utils.metrics import compute_recall


@pytest.mark.parametrize("metric", ["ip", "l2", "cosine"])
def test_flat_exactness(metric, rng):
    base, q = make_cross_modal(3000, 200, 32, metric=metric, seed=51)
    idx = FlatIndex(base, metric=metric, tile=1024)
    ids, dists = idx.search(q, k=10)
    _, gt = exact_knn(q, base, k=10, metric=metric, precision="highest")
    assert compute_recall(ids, gt, 10) > 0.99
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_flat_uneven_batches(rng):
    base, q = make_cross_modal(500, 77, 16, metric="ip", seed=52)
    idx = FlatIndex(base, metric="ip", tile=128)
    ids, _ = idx.search(q, k=5, query_batch=50)  # 77 -> 50 + 27 padded
    assert ids.shape == (77, 5)
    _, gt = exact_knn(q, base, k=5, metric="ip", precision="highest")
    assert compute_recall(ids, gt, 5) > 0.99


def test_flat_benchmark_schema():
    base, q = make_cross_modal(1000, 64, 16, metric="ip", seed=53)
    idx = FlatIndex(base, metric="ip", tile=512)
    r = idx.benchmark(q, k=5, query_batch=64)
    assert r["qps"] > 0 and r["avg_cmps"] == 1000.0
    assert r["ids"].shape == (64, 5)
