"""Multi-chip sharding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ops import exact_knn
from mysteryann_tpu.parallel import (
    make_mesh,
    sharded_exact_knn,
    distributed_beam_search,
    query_parallel_search,
)
from mysteryann_tpu.search import beam_search
from mysteryann_tpu.ops.distances import Metric


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def world():
    base, queries = make_cross_modal(1600, 64, 32, n_concepts=1, metric="ip", seed=13)
    # kNN graph for search tests
    _, ids = exact_knn(base, base, k=9, metric="ip", precision="highest")
    n = base.shape[0]
    graph = np.full((n, 8), n, np.int32)
    for i in range(n):
        row = [j for j in ids[i] if j != i][:8]
        graph[i, : len(row)] = row
    _, gt = exact_knn(queries, base, k=10, metric="ip", precision="highest")
    return base, queries, graph, gt


def _recall(found, gt):
    hits = sum(len(set(f.tolist()) & set(g.tolist())) for f, g in zip(found, gt))
    return hits / gt.size


def test_sharded_knn_matches_single(world):
    base, queries, _, _ = world
    mesh = make_mesh(dp=2, mp=4)
    d, i = sharded_exact_knn(mesh, jnp.array(queries), jnp.array(base),
                             k=10, metric=Metric.IP)
    sd, si = exact_knn(queries, base, k=10, metric="ip")
    assert (np.asarray(i) == si).mean() > 0.99
    np.testing.assert_allclose(np.asarray(d), sd, rtol=1e-4, atol=1e-4)


def test_distributed_beam_matches_single_device(world):
    base, queries, graph, gt = world
    mesh = make_mesh(dp=2, mp=4)
    r = distributed_beam_search(
        mesh, jnp.array(base), jnp.array(graph), jnp.array([0], jnp.int32),
        jnp.array(queries), k=10, L=64, metric=Metric.IP)
    single = beam_search(jnp.array(base), jnp.array(graph),
                         jnp.array([0], jnp.int32), jnp.array(queries),
                         k=10, L=64, metric=Metric.IP)
    # identical traversal: same ids, cmps, hops
    assert (np.asarray(r.ids) == np.asarray(single.ids)).mean() > 0.999
    np.testing.assert_array_equal(np.asarray(r.hops), np.asarray(single.hops))
    np.testing.assert_array_equal(np.asarray(r.cmps), np.asarray(single.cmps))
    assert _recall(np.asarray(r.ids), gt) > 0.75


def test_distributed_beam_l2(world):
    base, queries, _, _ = world
    _, ids = exact_knn(base, base, k=9, metric="l2", precision="highest")
    n = base.shape[0]
    graph = np.full((n, 8), n, np.int32)
    for i in range(n):
        row = [j for j in ids[i] if j != i][:8]
        graph[i, : len(row)] = row
    mesh = make_mesh(dp=4, mp=2)
    r = distributed_beam_search(
        mesh, jnp.array(base), jnp.array(graph), jnp.array([3], jnp.int32),
        jnp.array(queries), k=10, L=64, metric=Metric.L2)
    _, gt = exact_knn(queries, base, k=10, metric="l2", precision="highest")
    assert _recall(np.asarray(r.ids), gt) > 0.75


def test_distributed_beam_merge_mode(world):
    """No-visited-state mode (the 100M-class path): same results as the
    bitmask mode up to pool-boundary ties."""
    base, queries, graph, gt = world
    mesh = make_mesh(dp=2, mp=4)
    rb = distributed_beam_search(
        mesh, jnp.array(base), jnp.array(graph), jnp.array([0], jnp.int32),
        jnp.array(queries), k=10, L=64, metric=Metric.IP,
        visited_mode="bitmask")
    rm = distributed_beam_search(
        mesh, jnp.array(base), jnp.array(graph), jnp.array([0], jnp.int32),
        jnp.array(queries), k=10, L=64, metric=Metric.IP,
        visited_mode="merge")
    assert (np.asarray(rm.ids) == np.asarray(rb.ids)).mean() > 0.99
    np.testing.assert_array_equal(np.asarray(rm.hops), np.asarray(rb.hops))
    # merge mode may re-score ids reached twice — cmps >= bitmask's
    assert np.all(np.asarray(rm.cmps) >= np.asarray(rb.cmps))
    assert _recall(np.asarray(rm.ids), gt) > 0.75


def test_query_parallel_search(world):
    base, queries, graph, gt = world
    mesh = make_mesh(dp=4, mp=2)
    r = query_parallel_search(
        mesh, jnp.array(base), jnp.array(graph), jnp.array([0], jnp.int32),
        jnp.array(queries), k=10, L=64, metric=Metric.IP)
    assert _recall(np.asarray(r.ids), gt) > 0.75


def test_mesh_validation():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(dp=16, mp=16)
