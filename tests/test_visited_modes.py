"""pool visited-mode must return identical results to the bitmask mode.

The soundness argument (see beam.py docstring): the pool's L-th (dist, id)
key is monotonically non-increasing, so a dropped candidate can never
re-enter — pool membership alone suffices for dedup. cmps may only grow
(re-scored ids rejected at the merge).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ops import exact_knn
from mysteryann_tpu.search import beam_search


@pytest.fixture(scope="module")
def world():
    base, queries = make_cross_modal(3000, 128, 32, n_concepts=1, metric="ip", seed=17)
    _, ids = exact_knn(base, base, k=13, metric="ip", precision="highest")
    n = base.shape[0]
    graph = np.full((n, 12), n, np.int32)
    for i in range(n):
        row = [j for j in ids[i] if j != i][:12]
        graph[i, : len(row)] = row
    return base, queries, graph


def test_merge_mode_recall_parity(world):
    base, queries, graph = world
    args = (jnp.array(base), jnp.array(graph), jnp.array([0], jnp.int32),
            jnp.array(queries))
    a = beam_search(*args, k=10, L=64, visited_mode="bitmask")
    b = beam_search(*args, k=10, L=64, visited_mode="merge")
    # dead dup slots may shift rare boundary candidates; recall must match
    same = (np.asarray(a.ids) == np.asarray(b.ids)).mean()
    assert same > 0.98, f"id agreement {same}"
    # no duplicate ids in results
    for row in np.asarray(b.ids):
        assert len(set(row.tolist())) == len(row)


@pytest.mark.parametrize("L", [16, 64])
@pytest.mark.parametrize("expand", [1, 4])
def test_pool_matches_bitmask(world, L, expand):
    base, queries, graph = world
    args = (jnp.array(base), jnp.array(graph), jnp.array([0], jnp.int32),
            jnp.array(queries))
    a = beam_search(*args, k=10, L=L, expand=expand, visited_mode="bitmask")
    b = beam_search(*args, k=10, L=L, expand=expand, visited_mode="pool")
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_allclose(np.asarray(a.dists), np.asarray(b.dists),
                               rtol=1e-6)
    # pool mode may re-score but never under-count
    assert np.all(np.asarray(b.cmps) >= np.asarray(a.cmps))


def test_pool_mode_l2(world):
    base, queries, _ = world
    _, ids = exact_knn(base, base, k=13, metric="l2", precision="highest")
    n = base.shape[0]
    graph = np.full((n, 12), n, np.int32)
    for i in range(n):
        row = [j for j in ids[i] if j != i][:12]
        graph[i, : len(row)] = row
    from mysteryann_tpu.ops.distances import Metric
    args = (jnp.array(base), jnp.array(graph), jnp.array([5], jnp.int32),
            jnp.array(queries))
    a = beam_search(*args, k=10, L=48, metric=Metric.L2,
                    visited_mode="bitmask")
    b = beam_search(*args, k=10, L=48, metric=Metric.L2, visited_mode="pool")
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
