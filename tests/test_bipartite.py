"""Bipartite index variant: build, two-hop search, persistence."""

import numpy as np
import pytest

from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ops import exact_knn
from mysteryann_tpu.graph import BipartiteIndex, BipartiteSearcher, build_bipartite
from mysteryann_tpu.utils.params import BuildConfig
from mysteryann_tpu.utils.metrics import compute_recall


@pytest.fixture(scope="module")
def world():
    # the bipartite variant assumes dense training-query coverage
    # (NeurIPS OOD track: Nq >= N); sparse Nq leaves bases unreachable
    base, train_q = make_cross_modal(1500, 4500, 24, metric="ip", seed=21)
    _, eval_q = make_cross_modal(10, 150, 24, metric="ip", seed=88)
    _, knn = exact_knn(train_q, base, k=16, metric="ip", precision="highest")
    cfg = BuildConfig(M_sq=16, M_pjbp=16, metric="ip")
    # Zipfian concept popularity gives hub bases huge reverse in-degree;
    # the two-hop fan-out is O(width^2), so cap base rows (closest kept)
    index = build_bipartite(base, train_q, knn, cfg, base_row_cap=24)
    _, gt = exact_knn(eval_q, base, k=10, metric="ip", precision="highest")
    return base, eval_q, index, gt


def test_structure(world):
    base, _, index, _ = world
    n, n_total = index.n_base, index.n_total
    nb = index.neighbors
    # query rows point only at bases; base rows point only at queries
    q_valid = nb[n:][nb[n:] < n_total]
    assert np.all(q_valid < n)
    b_valid = nb[:n][nb[:n] < n_total]
    assert np.all(b_valid >= n)
    # each query row has at most M_pjbp - 1 edges (top-1 excluded)
    q_deg = (nb[n:] < n_total).sum(axis=1)
    assert q_deg.max() <= 15
    # every query contributes one reverse edge, up to the per-base cap
    rev_edges = (nb[:n] < n_total).sum()
    assert 0 < rev_edges <= 4500
    assert (nb[:n] < n_total).sum(axis=1).max() <= 24


def test_two_hop_search_recall(world):
    base, eval_q, index, gt = world
    s = BipartiteSearcher(index, base, seed=3)
    ids, dists, cmps, hops = s.search(eval_q, k=10, L=64, query_batch=150)
    rec = compute_recall(ids, gt, 10)
    assert rec > 0.8, f"bipartite recall@10 = {rec}"
    assert np.all(ids[:, 0] < index.n_base)
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_save_load(world, tmp_path):
    base, eval_q, index, gt = world
    p = str(tmp_path / "bip.index")
    index.save(p)
    loaded = BipartiteIndex.load(p)
    assert loaded.n_base == index.n_base
    assert loaded.n_total == index.n_total
    s = BipartiteSearcher(loaded, base, seed=3)
    ids, *_ = s.search(eval_q, k=10, L=64, query_batch=150)
    assert compute_recall(ids, gt, 10) > 0.8


def test_two_hop_chunk_matches_unchunked(world):
    # the bounded hop-2 expansion (beam.py two_hop_chunk) must reproduce
    # the single-shot [B, M^2] fan-out exactly: chunks dedup against the
    # same visited set in first-occurrence order
    base, eval_q, index, gt = world
    s = BipartiteSearcher(index, base, seed=3)
    full = s.search(eval_q, k=10, L=64, query_batch=150,
                    two_hop_chunk=int(index.neighbors.shape[1]))
    for c in (3, 7):
        chunked = s.search(eval_q, k=10, L=64, query_batch=150,
                           two_hop_chunk=c)
        for a, b in zip(full, chunked):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_base_row_cap(world):
    base, _, _, _ = world
    _, train_q = make_cross_modal(10, 500, 24, metric="ip", seed=4)
    _, knn = exact_knn(train_q, base, k=8, metric="ip", precision="highest")
    cfg = BuildConfig(M_sq=8, M_pjbp=8, metric="ip")
    idx = build_bipartite(base, train_q, knn, cfg, base_row_cap=3)
    assert (idx.neighbors[: idx.n_base] < idx.n_total).sum(axis=1).max() <= 3
