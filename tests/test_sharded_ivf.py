"""mp-sharded IVF on the virtual 8-device mesh: parity vs single-chip."""

import numpy as np
import pytest

from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ivf import IVFIndex
from mysteryann_tpu.ops import exact_knn
from mysteryann_tpu.parallel import make_mesh
from mysteryann_tpu.parallel.sharded_ivf import ShardedIVF
from mysteryann_tpu.utils.metrics import compute_recall


@pytest.fixture(scope="module")
def world():
    base, q = make_cross_modal(20000, 512, 32, metric="ip", seed=77)
    _, gt = exact_knn(q, base, k=10, metric="ip", precision="highest")
    return base, q, gt


def test_sharded_matches_single_device_f32(world):
    base, q, gt = world
    idx = IVFIndex(base, metric="ip", n_clusters=120, kmeans_iters=4)
    mesh = make_mesh(dp=2, mp=4)
    sidx = ShardedIVF(mesh, idx)  # 120 -> padded to 120 (div by 4)
    ids_s, d_s = sidx.search(q, k=10, nprobe=32)
    ids_1, d_1 = idx.search(q, k=10, nprobe=32, query_batch=512)
    # same clusters scanned, exact f32 distances -> same curves
    np.testing.assert_allclose(d_s, d_1, rtol=1e-5, atol=1e-5)
    assert (ids_s == ids_1).mean() > 0.99  # ties may permute


def test_sharded_int8_recall_and_padding(world):
    base, q, gt = world
    idx = IVFIndex(base, metric="ip", n_clusters=117,  # not divisible by mp
                   kmeans_iters=4, store="int8")
    mesh = make_mesh(dp=2, mp=4)
    sidx = ShardedIVF(mesh, idx)
    assert sidx.n_clusters % 4 == 0 and sidx.nc_real == 117
    ids_s, _ = sidx.search(q, k=10, nprobe=32)
    r = compute_recall(ids_s.astype(np.int64), gt, 10)
    assert r > 0.90, f"sharded int8 recall {r}"
    ids_1, _ = idx.search(q, k=10, nprobe=32, query_batch=512)
    r1 = compute_recall(ids_1.astype(np.int64), gt, 10)
    assert abs(r - r1) < 0.02, (r, r1)


def test_sharded_int8_distinct_gscales_not_cross_cached(world):
    # two same-shape int8 indexes with different global scales must not
    # share a compiled search fn: the fn closes over gscale, so the
    # cache key has to include it (a collision returns distances scaled
    # by the OTHER index's gscale)
    base, q, _ = world
    idx_a = IVFIndex(base, metric="ip", n_clusters=120, kmeans_iters=3,
                     store="int8")
    idx_b = IVFIndex(base * 7.0, metric="ip", n_clusters=120,
                     kmeans_iters=3, store="int8")
    assert idx_a.gscale != idx_b.gscale
    mesh = make_mesh(dp=2, mp=4)
    sa = ShardedIVF(mesh, idx_a)
    sb = ShardedIVF(mesh, idx_b)
    _, da = sa.search(q, k=10, nprobe=32)
    _, db = sb.search(q, k=10, nprobe=32)
    # scaling the corpus by 7 scales IP distances by 7; a gscale cache
    # collision would break this by the ratio of the two gscales
    np.testing.assert_allclose(db, da * 7.0, rtol=0.05, atol=0.05)
