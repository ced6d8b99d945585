"""End-to-end RoarGraph build + search on synthetic cross-modal data."""

import numpy as np
import pytest

from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ops import exact_knn
from mysteryann_tpu.graph import build_roargraph, RoarGraphIndex
from mysteryann_tpu.search import Searcher
from mysteryann_tpu.utils.params import BuildConfig
from mysteryann_tpu.utils.metrics import compute_recall, compute_rderr


@pytest.fixture(scope="module")
def built():
    base, train_q = make_cross_modal(4000, 1500, 48, metric="ip", seed=11)
    _, eval_q = make_cross_modal(10, 300, 48, metric="ip", seed=99)
    _, knn = exact_knn(train_q, base, k=32, metric="ip", precision="highest")
    cfg = BuildConfig(M_sq=32, M_pjbp=12, L_pjpq=64, metric="ip",
                      query_batch=512, search_batch=512)
    index = build_roargraph(base, train_q, knn, cfg, verbose=False)
    gt_d, gt_i = exact_knn(eval_q, base, k=10, metric="ip",
                           precision="highest")
    return base, eval_q, index, gt_i, gt_d


def test_graph_invariants(built):
    base, _, index, _, _ = built
    g = index.graph
    g.validate()  # no self-edges, no dups, ids in range
    st = g.degree_stats()
    assert st["max"] <= 2 * 12
    assert st["zero"] == 0, f"{st['zero']} zero-degree nodes"
    assert st["avg"] >= 6


def test_search_recall(built):
    base, eval_q, index, gt_i, gt_d = built
    s = Searcher(index, base)
    ids, dists, cmps, hops = s.search(eval_q, k=10, L=128, query_batch=300)
    rec = compute_recall(ids, gt_i, 10)
    assert rec > 0.9, f"recall@10 = {rec}"
    assert np.all(cmps > 0) and np.all(hops > 0)
    rderr = compute_rderr(dists, gt_d, 10, "ip")
    assert rderr < 0.2


def test_recall_improves_with_L(built):
    base, eval_q, index, gt_i, _ = built
    s = Searcher(index, base)
    recs = []
    for L in (16, 64, 256):
        ids, *_ = s.search(eval_q, k=10, L=L, query_batch=300)
        recs.append(compute_recall(ids, gt_i, 10))
    assert recs[0] <= recs[1] + 0.02 and recs[1] <= recs[2] + 0.02
    assert recs[-1] > 0.93, f"recalls {recs}"


def test_save_load_roundtrip(built, tmp_path):
    base, eval_q, index, gt_i, _ = built
    p = str(tmp_path / "proj.index")
    index.save(p)
    loaded = RoarGraphIndex.load(p)
    assert loaded.graph.ep == index.graph.ep
    assert loaded.metric == index.metric
    # same edge sets (padding width may differ)
    n = index.graph.n_nodes
    for i in range(0, n, 997):
        a = set(x for x in index.graph.neighbors[i] if x < n)
        b = set(x for x in loaded.graph.neighbors[i] if x < n)
        assert a == b
    s = Searcher(loaded, base)
    ids, *_ = s.search(eval_q, k=10, L=128, query_batch=300)
    assert compute_recall(ids, gt_i, 10) > 0.9


@pytest.mark.parametrize("engine,expand,bits", [
    ("classic", 1, 8), ("fused", 1, 8),
    # the build-speed knobs (BuildConfig.connectivity_expand/_bits):
    # multi-pop steps + int4 traversal rows — measured recall-neutral at
    # 1M (BASELINE.md), pinned > .88 here like the base engines
    ("fused", 4, 4),
])
def test_connectivity_engines(engine, expand, bits):
    """Both phase-D search engines produce valid, high-recall graphs.

    The fused engine traverses int8 neighbor blocks (exact f32 prune), so
    its graph differs from classic's — quality must not."""
    base, train_q = make_cross_modal(3000, 1000, 48, metric="ip", seed=21)
    _, eval_q = make_cross_modal(10, 256, 48, metric="ip", seed=22)
    _, knn = exact_knn(train_q, base, k=24, metric="ip", precision="highest")
    cfg = BuildConfig(M_sq=24, M_pjbp=10, L_pjpq=48, metric="ip",
                      query_batch=512, search_batch=512,
                      connectivity_engine=engine,
                      connectivity_expand=expand, connectivity_bits=bits)
    index = build_roargraph(base, train_q, knn, cfg, verbose=False)
    index.graph.validate()
    assert index.graph.degree_stats()["zero"] == 0
    _, gt_i = exact_knn(eval_q, base, k=10, metric="ip",
                        precision="highest")
    s = Searcher(index, base)
    ids, *_ = s.search(eval_q, k=10, L=96, query_batch=256)
    rec = compute_recall(ids, gt_i, 10)
    assert rec > 0.88, f"[{engine}] recall@10 = {rec}"


def test_slab_fold_matches_single_jit_fold():
    """The memory-bounded slab fold (>4M path) must be bit-identical to
    the single-jit fold: same merged supply, same fit mask, and the
    searchsorted rev reconstruction must reproduce the dense rev rows."""
    import jax.numpy as jnp
    from mysteryann_tpu.graph.roargraph import (
        _fold_own_rows, _fold_round_device, _fold_slab, _rev_rows_for_ids)

    rng = np.random.default_rng(77)
    n, W, M, c, r0 = 3000, 16, 8, 600, 1200
    supply = np.full((n, W), n, np.int32)
    for i in range(n):  # ragged existing lists
        deg = rng.integers(0, W)
        supply[i, :deg] = rng.choice(n, size=deg, replace=False)
    chunk = rng.integers(0, n + 40, (c, M)).astype(np.int32)  # some sentinels

    a_supply, a_rev, a_fit = _fold_round_device(
        jnp.asarray(supply), jnp.asarray(chunk), jnp.int32(r0))

    b_supply = _fold_own_rows(jnp.asarray(supply), jnp.asarray(chunk),
                              jnp.int32(r0))
    fits = []
    for lo in range(0, n, 1000):
        b_supply, fit_s = _fold_slab(b_supply, jnp.asarray(chunk),
                                     jnp.int32(r0), jnp.int32(lo), sn=1000)
        fits.append(np.asarray(fit_s))
    np.testing.assert_array_equal(np.asarray(b_supply), np.asarray(a_supply))
    np.testing.assert_array_equal(np.concatenate(fits), np.asarray(a_fit))

    ids = np.array([5, 77, 1200, 1201, 2999, n, n, n], np.int32)  # sorted
    rev_b = _rev_rows_for_ids(jnp.asarray(chunk), jnp.int32(r0),
                              jnp.asarray(ids), n=n, W=W)
    np.testing.assert_array_equal(
        np.asarray(rev_b)[:5], np.asarray(a_rev)[ids[:5]])


def test_merge_forward_reverse_matches_host_oracle():
    """The device forward∪reverse merge must reproduce the former host
    implementation exactly: dedup'd own-then-reverse stable compaction on
    easy rows, occlusion prune on overfull rows."""
    from mysteryann_tpu.graph.roargraph import (_batched_prune_rows,
                                                _merge_forward_reverse)
    from mysteryann_tpu.ops.distances import Metric, prepare_vectors

    rng = np.random.default_rng(5)
    n, A, R, cap = 800, 8, 24, 8
    base = rng.standard_normal((n, 16)).astype(np.float32)
    base_dev = prepare_vectors(base, Metric.IP)
    own = np.full((n, A), n, np.int32)
    rev = np.full((n, R), n, np.int32)
    for i in range(n):
        d = rng.integers(0, A + 1)
        own[i, :d] = rng.choice(n, size=d, replace=False)
        rd = rng.integers(0, R + 1)
        rev[i, :rd] = rng.choice(n, size=rd, replace=False)  # may dup own

    got = _merge_forward_reverse(base_dev, own, rev, cap=cap,
                                 metric=Metric.IP, batch=256, fill=False)

    # host oracle (the former implementation, verbatim semantics)
    rev_h = rev.copy()
    dup = (rev_h[:, :, None] == own[:, None, :]).any(axis=2)
    rev_h[dup] = n
    cand = np.concatenate([own, rev_h], axis=1)
    total = (cand < n).sum(axis=1)
    want = np.full((n, cap), n, np.int32)
    easy = total <= cap
    rows = np.nonzero(easy)[0]
    c = cand[rows]
    order = np.argsort(c == n, axis=1, kind="stable")
    want[rows] = np.take_along_axis(c, order, axis=1)[:, :cap]
    hard = np.nonzero(~easy)[0]
    if hard.size:
        want[hard] = _batched_prune_rows(
            base_dev, hard.astype(np.int32), cand[hard], cap, Metric.IP,
            256, fill=False)
    np.testing.assert_array_equal(got, want)


def test_append_novel_matches_host_oracle():
    """Device novel-supply append == the former host implementation."""
    from mysteryann_tpu.graph.roargraph import _append_novel

    rng = np.random.default_rng(9)
    n, M, Ws, cap_add = 700, 6, 12, 10
    proj = np.full((n, M), n, np.int32)
    supply = np.full((n, Ws), n, np.int32)
    for i in range(n):
        d = rng.integers(0, M + 1)
        proj[i, :d] = rng.choice(n, size=d, replace=False)
        sd = rng.integers(0, Ws + 1)
        supply[i, :sd] = rng.choice(n + 3, size=sd, replace=False)  # > n too

    got = _append_novel(proj, supply, cap_add=cap_add, n=n)

    width = M + min(cap_add, Ws)
    novel = supply.copy()
    dup = (supply[:, :, None] == proj[:, None, :]).any(axis=2)
    novel[dup] = n
    novel[novel >= n] = n
    cand = np.concatenate([proj, novel[:, :width - M]], axis=1)
    order = np.argsort(cand == n, axis=1, kind="stable")
    want = np.take_along_axis(cand, order, axis=1).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_device_resident_bc_and_cap_match_host_paths():
    """The device-resident BC/merge/cap pipeline (n<4M fast path) must be
    bit-identical to the host path it replaced: reverse aggregation,
    forward∪reverse merge with device inputs, and degree capping."""
    import jax.numpy as jnp
    from mysteryann_tpu.graph.roargraph import (
        _aggregate_reverse, _aggregate_reverse_device, _cap_degree,
        _merge_forward_reverse)
    from mysteryann_tpu.ops.distances import Metric, prepare_vectors

    rng = np.random.default_rng(11)
    n = 600
    base = rng.standard_normal((n, 16)).astype(np.float32)
    base_dev = prepare_vectors(base, Metric.IP)

    # reverse aggregation: duplicate dists exercise tie stability
    E = 5000
    e_dst = np.sort(rng.integers(0, n, E))
    e_src = rng.integers(0, n, E)
    e_dist = rng.integers(0, 50, E).astype(np.float32)  # many exact ties
    r_max = 6
    want = _aggregate_reverse(e_src.astype(np.int64), e_dst.astype(np.int64),
                              e_dist, n, r_max)
    got = np.asarray(_aggregate_reverse_device(
        jnp.asarray(e_src.astype(np.int32)),
        jnp.asarray(e_dst.astype(np.int32)),
        jnp.asarray(e_dist), n=n, r_max=r_max))
    np.testing.assert_array_equal(got, want)

    # merge with device inputs == merge with host inputs
    A, R, cap = 8, 24, 8
    own = np.full((n, A), n, np.int32)
    rev = np.full((n, R), n, np.int32)
    for i in range(n):
        d = rng.integers(0, A + 1)
        own[i, :d] = rng.choice(n, size=d, replace=False)
        rd = rng.integers(0, R + 1)
        rev[i, :rd] = rng.choice(n, size=rd, replace=False)
    host = _merge_forward_reverse(base_dev, own, rev, cap=cap,
                                  metric=Metric.IP, batch=128, fill=True)
    dev = _merge_forward_reverse(base_dev, jnp.asarray(own),
                                 jnp.asarray(rev), cap=cap,
                                 metric=Metric.IP, batch=128, fill=True)
    assert not isinstance(host, jnp.ndarray) or hasattr(host, "device")
    np.testing.assert_array_equal(np.asarray(dev), host)

    # cap_degree with device input == host input
    wide = np.full((n, 3 * cap), n, np.int32)
    for i in range(n):
        d = rng.integers(0, 3 * cap + 1)
        wide[i, :d] = rng.choice(n, size=d, replace=False)
    host_c = _cap_degree(wide, base_dev, cap, Metric.IP, 128, n)
    dev_c = _cap_degree(jnp.asarray(wide), base_dev, cap, Metric.IP, 128, n)
    np.testing.assert_array_equal(np.asarray(dev_c), host_c)
