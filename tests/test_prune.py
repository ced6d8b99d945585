"""Occlusion prune unit tests: invariants + agreement with a numpy oracle.

The oracle replicates the reference prune semantics
(PruneBiSearchBaseGetBase, reference src/index_bipartite.cpp:1612-1694)
over the *device-computed* distances, so the test pins the sequential
scan/sort/fill logic rather than matmul rounding (covered in
test_distances.py).
"""

import numpy as np
import jax.numpy as jnp

from mysteryann_tpu.graph.prune import batched_occlusion_prune, dists_to_src
from mysteryann_tpu.ops.distances import Metric, pairwise_dist


def _np_prune_from_dists(ids, d_src, pd, n, src_id, cap, fill=True,
                         not_seedable=()):
    """ids [C], d_src [C] (dist to src), pd [C, C] pairwise cand dists."""
    items = []
    seen = set()
    for j in range(len(ids)):
        c = int(ids[j])
        if c >= n or c < 0 or c == src_id or c in seen:
            continue
        seen.add(c)
        items.append((float(d_src[j]), c, j))
    items.sort()
    result = []   # (id, orig_col)
    for d, c, j in items:
        if len(result) >= cap:
            break
        if not result and c in not_seedable:
            continue
        occ = any(float(pd[j, t_j]) < d for _, t_j in result)
        if not occ:
            result.append((c, j))
    out = [c for c, _ in result]
    if fill:
        for d, c, j in items:
            if len(out) >= cap:
                break
            if c not in out:
                out.append(c)
    return out


def _device_dists(src_vecs, cand, base, metric):
    cd = np.asarray(dists_to_src(jnp.array(src_vecs), jnp.array(cand),
                                 jnp.array(base), metric))
    B, C = cand.shape
    pd = np.empty((B, C, C), np.float32)
    for b in range(B):
        vecs = base[np.minimum(cand[b], base.shape[0] - 1)]
        pd[b] = np.asarray(pairwise_dist(jnp.array(vecs), jnp.array(vecs),
                                         metric))
    return cd, pd


def _check(rng, metric, fill, B=8, C=30, cap=8, n=200, d=16):
    base = rng.standard_normal((n, d)).astype(np.float32)
    src_ids = rng.integers(0, n, B).astype(np.int32)
    cand = rng.integers(0, n, (B, C)).astype(np.int32)
    src_vecs = base[src_ids]
    cd, pd = _device_dists(src_vecs, cand, base, metric)
    out, counts = batched_occlusion_prune(
        jnp.array(src_vecs), jnp.array(src_ids), jnp.array(cand),
        jnp.array(cd), jnp.array(base), cap=cap, metric=metric, fill=fill)
    out = np.asarray(out)
    for b in range(B):
        want = _np_prune_from_dists(cand[b], cd[b], pd[b], n,
                                    int(src_ids[b]), cap, fill=fill)
        got = [int(x) for x in out[b] if x < n]
        assert got == want, f"row {b}: {got} != {want}"


def test_prune_matches_oracle_ip(rng):
    _check(rng, Metric.IP, fill=True)


def test_prune_matches_oracle_l2_no_fill(rng):
    _check(rng, Metric.L2, fill=False)


def test_prune_not_seedable(rng):
    n, d, C, cap = 100, 8, 20, 5
    base = rng.standard_normal((n, d)).astype(np.float32)
    src = np.int32(0)
    cand = np.arange(1, C + 1, dtype=np.int32)[None, :]
    src_vecs = base[[0]]
    cd, pd = _device_dists(src_vecs, cand, base, Metric.L2)
    closest = int(cand[0, np.argmin(cd[0])])
    ns = (cand == closest)
    out, _ = batched_occlusion_prune(
        jnp.array(src_vecs), jnp.array([src]), jnp.array(cand),
        jnp.array(cd), jnp.array(base), cap=cap, metric=Metric.L2,
        fill=False, not_seedable=jnp.array(ns))
    got = [int(x) for x in np.asarray(out)[0] if x < n]
    want = _np_prune_from_dists(cand[0], cd[0], pd[0], n, 0, cap,
                                fill=False, not_seedable={closest})
    assert got == want
    assert got[0] != closest


def test_prune_two_pass_readmits_pre_seed_skip():
    """Reference second pass (src/index_bipartite.cpp:1897-1931): a
    not-seedable candidate positioned before the seed is skipped
    permanently in pass 1, but re-scanned — and here readmitted — by
    pass 2 against the pass-1 kept set."""
    n, d, cap = 10, 2, 3
    base = np.zeros((n, d), np.float32)
    base[0] = [0.0, 0.0]        # src
    base[1] = [1.0, 0.0]        # c1: closest, not seedable
    base[2] = [0.0, 2.0]        # c2: seed; pd(c2,c1)=5 > d(c1)=1 → no occl.
    cand = np.array([[1, 2]], np.int32)
    ns = np.array([[True, False]])
    src_vecs = base[[0]]
    cd, _ = _device_dists(src_vecs, cand, base, Metric.L2)
    common = dict(cap=cap, metric=Metric.L2, fill=False,
                  not_seedable=jnp.array(ns))
    one, cnt1 = batched_occlusion_prune(
        jnp.array(src_vecs), jnp.array([np.int32(0)]), jnp.array(cand),
        jnp.array(cd), jnp.array(base), **common)
    two, cnt2 = batched_occlusion_prune(
        jnp.array(src_vecs), jnp.array([np.int32(0)]), jnp.array(cand),
        jnp.array(cd), jnp.array(base), two_pass=True, **common)
    assert [int(x) for x in np.asarray(one)[0] if x < n] == [2]
    assert [int(x) for x in np.asarray(two)[0] if x < n] == [1, 2]
    assert int(cnt1[0]) == 1 and int(cnt2[0]) == 2


def test_prune_degree_bound_and_dedup(rng):
    n, d, B, cap = 300, 12, 4, 10
    base = rng.standard_normal((n, d)).astype(np.float32)
    src_ids = np.zeros(B, np.int32)
    cand = np.tile(np.array([[5, 5, 7, 0, n, 9, 7, 11, 13, 15, 17, 19]],
                            np.int32), (B, 1))
    src_vecs = base[src_ids]
    cd = dists_to_src(jnp.array(src_vecs), jnp.array(cand), jnp.array(base),
                      Metric.IP)
    out, counts = batched_occlusion_prune(
        jnp.array(src_vecs), jnp.array(src_ids), jnp.array(cand), cd,
        jnp.array(base), cap=cap, metric=Metric.IP, fill=True)
    out = np.asarray(out)
    for b in range(B):
        got = [x for x in out[b] if x < n]
        assert len(got) == len(set(got))          # dedup
        assert 0 not in got                        # src excluded
        assert len(got) <= cap
        assert set(got) <= {5, 7, 9, 11, 13, 15, 17, 19}


def test_prune_all_not_seedable_keeps_nothing_pass1():
    """A row with NO seedable candidate keeps nothing in pass 1 (the
    reference's seed-skip while loop runs off the end); pass 2 readmits,
    and the fill pass can still draw from the skipped candidates."""
    n, d, cap = 10, 2, 3
    base = np.zeros((n, d), np.float32)
    base[0] = [0.0, 0.0]
    base[1] = [1.0, 0.0]
    base[2] = [0.0, 2.0]
    cand = np.array([[1, 2]], np.int32)
    ns = np.array([[True, True]])        # everything pre-seeded
    src_vecs = base[[0]]
    cd, _ = _device_dists(src_vecs, cand, base, Metric.L2)
    common = dict(cap=cap, metric=Metric.L2,
                  not_seedable=jnp.array(ns))
    one, cnt1 = batched_occlusion_prune(
        jnp.array(src_vecs), jnp.array([np.int32(0)]), jnp.array(cand),
        jnp.array(cd), jnp.array(base), fill=False, **common)
    assert int(cnt1[0]) == 0, np.asarray(one)
    two, cnt2 = batched_occlusion_prune(
        jnp.array(src_vecs), jnp.array([np.int32(0)]), jnp.array(cand),
        jnp.array(cd), jnp.array(base), fill=False, two_pass=True, **common)
    assert [int(x) for x in np.asarray(two)[0] if x < n] == [1, 2]
    filled, cntf = batched_occlusion_prune(
        jnp.array(src_vecs), jnp.array([np.int32(0)]), jnp.array(cand),
        jnp.array(cd), jnp.array(base), fill=True, **common)
    assert int(cntf[0]) == 2  # fill draws from the full valid set


def test_prune_cand_vecs_bit_identical():
    """Passing pre-gathered candidate rows (dists_to_src return_vecs)
    must produce bit-identical pruning to the in-kernel gather."""
    rng = np.random.default_rng(6)
    n, d, B, C, cap = 500, 16, 8, 40, 8
    base = rng.standard_normal((n, d)).astype(np.float32)
    src = rng.integers(0, n, B).astype(np.int32)
    cand = rng.integers(0, n, (B, C)).astype(np.int32)
    cand[:, -3:] = n  # sentinels
    cand[0, 0] = -1   # negative id (padded input)
    src_vecs = jnp.asarray(base[src])
    cd, cv = dists_to_src(src_vecs, jnp.asarray(cand), jnp.asarray(base),
                          Metric.IP, return_vecs=True)
    a, ca = batched_occlusion_prune(
        src_vecs, jnp.asarray(src), jnp.asarray(cand), cd,
        jnp.asarray(base), cap=cap, metric=Metric.IP)
    b, cb = batched_occlusion_prune(
        src_vecs, jnp.asarray(src), jnp.asarray(cand), cd,
        jnp.asarray(base), cap=cap, metric=Metric.IP, cand_vecs=cv)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
