"""IVF index: recall vs nprobe, structure, metrics."""

import numpy as np
import pytest

from mysteryann_tpu.ivf import IVFIndex
from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ops import exact_knn
from mysteryann_tpu.utils.metrics import compute_recall


@pytest.fixture(scope="module")
def world():
    base, q = make_cross_modal(20000, 500, 32, metric="ip", seed=71)
    _, gt = exact_knn(q, base, k=10, metric="ip", precision="highest")
    return base, q, gt


def test_ivf_recall_grows_with_nprobe(world):
    base, q, gt = world
    idx = IVFIndex(base, metric="ip", n_clusters=128, kmeans_iters=5)
    recalls = []
    for p in (2, 8, 32):
        ids, dists = idx.search(q, k=10, nprobe=p, query_batch=500)
        recalls.append(compute_recall(ids, gt, 10))
    assert recalls[0] <= recalls[1] <= recalls[2] + 1e-9
    assert recalls[-1] > 0.95, f"recalls {recalls}"
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_ivf_every_point_stored_once(world):
    base, _, _ = world
    idx = IVFIndex(base, metric="ip", n_clusters=64, kmeans_iters=3)
    ids = np.asarray(idx.block_ids)
    stored = ids[ids < idx.n_base]
    assert stored.size == idx.n_base
    assert np.unique(stored).size == idx.n_base


def test_ivf_l2(world):
    base, q, _ = world
    _, gt = exact_knn(q, base, k=10, metric="l2", precision="highest")
    idx = IVFIndex(base, metric="l2", n_clusters=128, kmeans_iters=5)
    ids, _ = idx.search(q, k=10, nprobe=32, query_batch=500)
    assert compute_recall(ids, gt, 10) > 0.93


def test_ivf_benchmark_schema(world):
    base, q, _ = world
    idx = IVFIndex(base, metric="ip", n_clusters=64, kmeans_iters=2)
    r = idx.benchmark(q, k=5, nprobe=4, query_batch=250)
    assert r["qps"] > 0 and r["nprobe"] == 4
    assert r["ids"].shape == (500, 5)
