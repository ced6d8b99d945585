"""Beam search engine tests on a brute-force kNN graph (SURVEY §7 step 3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ops import exact_knn, Metric
from mysteryann_tpu.search import beam_search, search_batched


def _knn_graph(base, m, metric):
    """Exact kNN graph (self-edge stripped) as padded int32 [N, m]."""
    _, ids = exact_knn(base, base, k=m + 1, metric=metric, precision="highest")
    n = base.shape[0]
    out = np.full((n, m), n, np.int32)
    for i in range(n):
        row = [j for j in ids[i] if j != i][:m]
        out[i, : len(row)] = row
    return out


def _recall(found, gt):
    hits = sum(len(set(f.tolist()) & set(g.tolist())) for f, g in zip(found, gt))
    return hits / gt.size


@pytest.fixture(scope="module")
def small_world():
    base, queries = make_cross_modal(2000, 64, 32, n_concepts=1, metric="ip", seed=5)
    graph = _knn_graph(base, 16, "ip")
    _, gt = exact_knn(queries, base, k=10, metric="ip", precision="highest")
    return base, queries, graph, gt


def test_beam_search_recall_beats_random(small_world):
    base, queries, graph, gt = small_world
    r = beam_search(jnp.array(base), jnp.array(graph), jnp.array([0]),
                    jnp.array(queries), k=10, L=64, metric=Metric.IP)
    rec = _recall(np.asarray(r.ids), gt)
    assert rec > 0.8, f"recall {rec}"
    assert np.all(np.asarray(r.cmps) > 0)
    assert np.all(np.asarray(r.hops) > 0)


def test_beam_search_recall_grows_with_L(small_world):
    base, queries, graph, gt = small_world
    recalls = []
    for L in (16, 64, 200):
        r = beam_search(jnp.array(base), jnp.array(graph), jnp.array([0]),
                        jnp.array(queries), k=10, L=L, metric=Metric.IP)
        recalls.append(_recall(np.asarray(r.ids), gt))
    assert recalls[0] <= recalls[1] + 0.02 and recalls[1] <= recalls[2] + 0.02
    assert recalls[-1] > 0.95, f"recalls {recalls}"


def test_beam_search_results_sorted_and_unique(small_world):
    base, queries, graph, gt = small_world
    r = beam_search(jnp.array(base), jnp.array(graph), jnp.array([0]),
                    jnp.array(queries), k=10, L=32, metric=Metric.IP)
    ids = np.asarray(r.ids)
    dists = np.asarray(r.dists)
    assert np.all(np.diff(dists, axis=1) >= -1e-6)
    for row in ids:
        assert len(set(row.tolist())) == len(row)
        assert np.all(row < base.shape[0])


def test_beam_search_l2(small_world):
    base, queries, _, _ = small_world
    graph = _knn_graph(base, 16, "l2")
    _, gt = exact_knn(queries, base, k=10, metric="l2", precision="highest")
    r = beam_search(jnp.array(base), jnp.array(graph), jnp.array([0]),
                    jnp.array(queries), k=10, L=100, metric=Metric.L2)
    assert _recall(np.asarray(r.ids), gt) > 0.9


def test_beam_search_multi_entry_points(small_world):
    base, queries, graph, gt = small_world
    r = beam_search(jnp.array(base), jnp.array(graph),
                    jnp.array([0, 17, 333, 1999]),
                    jnp.array(queries), k=10, L=64, metric=Metric.IP)
    assert _recall(np.asarray(r.ids), gt) > 0.8


def test_beam_search_expand_gt_1(small_world):
    base, queries, graph, gt = small_world
    r = beam_search(jnp.array(base), jnp.array(graph), jnp.array([0]),
                    jnp.array(queries), k=10, L=64, metric=Metric.IP, expand=4)
    assert _recall(np.asarray(r.ids), gt) > 0.8


def test_search_batched_padding(small_world):
    base, queries, graph, gt = small_world
    ids, dists, cmps, hops = search_batched(
        jnp.array(base), jnp.array(graph), jnp.array([0]), queries,
        k=10, L=64, metric="ip", query_batch=50)  # 64 queries → uneven
    assert ids.shape == (64, 10)
    assert _recall(ids, gt) > 0.8


def test_beam_search_per_query_seeds(small_world):
    base, queries, graph, gt = small_world
    # seed each query with its own GT neighbors: recall must be ~perfect
    # and hops can't be fewer than the pool demands
    seed_ids = jnp.array(np.asarray(gt)[:, :8].astype(np.int32))
    r = beam_search(jnp.array(base), jnp.array(graph), jnp.array([0]),
                    jnp.array(queries), k=10, L=64, metric=Metric.IP,
                    seed_ids=seed_ids, visited_mode="merge")
    assert _recall(np.asarray(r.ids), gt) > 0.95
