"""mp-sharded fused-table serving vs the single-chip engine (8-device
virtual CPU mesh): results must be BIT-IDENTICAL — same packed rows,
same traced scoring helper, owner-masked psum adds exact zeros."""

import jax
import numpy as np
import pytest

from mysteryann_tpu.graph import build_roargraph
from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ops import exact_knn
from mysteryann_tpu.parallel import ShardedFusedSearcher, make_mesh
from mysteryann_tpu.search.fused import FusedSearcher
from mysteryann_tpu.utils.metrics import compute_recall
from mysteryann_tpu.utils.params import BuildConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def built():
    base, train_q = make_cross_modal(4000, 800, 32, metric="ip", seed=11)
    _, eval_q = make_cross_modal(1, 64, 32, metric="ip", seed=11,
                                 query_seed=5)
    _, knn = exact_knn(train_q, base, k=24, metric="ip",
                       precision="highest")
    cfg = BuildConfig(M_sq=24, M_pjbp=8, L_pjpq=32, metric="ip")
    index = build_roargraph(base, train_q, np.asarray(knn, np.int32), cfg,
                            verbose=False)
    _, gt = exact_knn(eval_q, base, k=10, metric="ip", precision="highest")
    return base, eval_q, index, np.asarray(gt)


@pytest.mark.parametrize("bits,expand", [(8, 1), (8, 2), (4, 2)])
def test_sharded_matches_single_chip(built, bits, expand):
    base, eval_q, index, gt = built
    mesh = make_mesh(dp=2, mp=4)
    ref = FusedSearcher(index, base, bits=bits)
    a = ref.search(eval_q, k=10, L=24, query_batch=64, expand=expand,
                   visited_mode="merge")
    sh = ShardedFusedSearcher(mesh, index, base, bits=bits)
    b = sh.search(eval_q, k=10, L=24, expand=expand)
    np.testing.assert_array_equal(a[0], b[0])          # ids
    np.testing.assert_array_equal(a[1], b[1])          # exact f32 dists
    np.testing.assert_array_equal(a[2], b[2])          # cmps
    np.testing.assert_array_equal(a[3], b[3])          # hops
    assert compute_recall(b[0], gt, 10) > 0.85


def test_sharded_seeded_matches_single_chip(built):
    base, eval_q, index, gt = built
    mesh = make_mesh(dp=2, mp=4)
    ref = FusedSearcher(index, base, bits=8, seed_sample=4)
    a = ref.search(eval_q, k=10, L=24, query_batch=64, expand=2, seeds=8,
                   visited_mode="merge")
    sh = ShardedFusedSearcher(mesh, index, base, bits=8, seed_sample=4)
    b = sh.search(eval_q, k=10, L=24, expand=2, seeds=8)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    assert compute_recall(b[0], gt, 10) > 0.9


def test_sharded_l2_matches_single_chip(built):
    base, eval_q, index, _ = built
    # metric override: serve the same adjacency under L2 on both engines
    import dataclasses
    from mysteryann_tpu.ops.distances import Metric
    idx_l2 = dataclasses.replace(index, metric=Metric.L2)
    mesh = make_mesh(dp=2, mp=4)
    ref = FusedSearcher(idx_l2, base, bits=8)
    a = ref.search(eval_q, k=10, L=24, query_batch=64, expand=2,
                   visited_mode="merge")
    sh = ShardedFusedSearcher(mesh, idx_l2, base, bits=8)
    b = sh.search(eval_q, k=10, L=24, expand=2)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_sharded_fused_arg_validation(built):
    base, eval_q, index, _ = built
    mesh = make_mesh(dp=2, mp=4)
    sh = ShardedFusedSearcher(mesh, index, base)
    with pytest.raises(ValueError, match="seeds"):
        sh.search(eval_q, k=10, L=24, seeds=8)   # no seed_sample at init
    with pytest.raises(ValueError, match="k"):
        sh.search(eval_q, k=30, L=24)
