"""High-level query API over a built index.

Equivalent of the reference's search drivers: load index + base, then
``SearchRoarGraph`` per query (reference src/index_bipartite.cpp:2311-2420,
driven by tests/test_search_roargraph.cpp:203-209). Here a Searcher holds
device-resident base vectors + adjacency and streams fixed-shape query
batches through the jitted lockstep beam search.
"""

from __future__ import annotations

import time
from typing import TYPE_CHECKING, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mysteryann_tpu.ops.distances import Metric, prepare_vectors
from mysteryann_tpu.search.beam import beam_search

if TYPE_CHECKING:  # avoid circular import (graph.roargraph uses search.beam)
    from mysteryann_tpu.graph.roargraph import RoarGraphIndex


class Searcher:
    def __init__(self, index: "RoarGraphIndex", base: np.ndarray):
        self.metric = index.metric
        self.base = prepare_vectors(base, self.metric)   # device
        self.neighbors = jnp.asarray(index.graph.neighbors)
        self.eps = jnp.asarray([index.graph.ep], jnp.int32)
        if self.metric == Metric.L2:
            self.base_sqnorm = jnp.sum(self.base * self.base, axis=-1)
        else:
            self.base_sqnorm = None

    def search(
        self, queries: np.ndarray, k: int, L: int,
        query_batch: int = 1024, expand: int = 1,
        visited_mode: str = "bitmask",
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Returns (ids [Q,k], dists [Q,k], cmps [Q], hops [Q])."""
        q = np.asarray(prepare_vectors(np.asarray(queries, np.float32),
                                       self.metric))
        nq = q.shape[0]
        qb = min(query_batch, nq)
        out_i = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        out_c = np.empty((nq,), np.int32)
        out_h = np.empty((nq,), np.int32)
        for s in range(0, nq, qb):
            e = min(s + qb, nq)
            batch = q[s:e]
            if e - s < qb:
                batch = np.concatenate(
                    [batch, np.zeros((qb - (e - s), q.shape[1]), np.float32)])
            r = beam_search(self.base, self.neighbors, self.eps,
                            jnp.asarray(batch), k=k, L=L, metric=self.metric,
                            base_sqnorm=self.base_sqnorm, expand=expand,
                            visited_mode=visited_mode)
            out_i[s:e] = np.asarray(r.ids)[: e - s]
            out_d[s:e] = np.asarray(r.dists)[: e - s]
            out_c[s:e] = np.asarray(r.cmps)[: e - s]
            out_h[s:e] = np.asarray(r.hops)[: e - s]
        return out_i, out_d, out_c, out_h

    def benchmark(self, queries: np.ndarray, k: int, L: int,
                  query_batch: int = 1024, warmup: int = 1,
                  expand: int = 1, visited_mode: str = "bitmask") -> dict:
        """Timed sweep entry — the reference driver's per-L_pq row
        (tests/test_search_roargraph.cpp:190,231-236)."""
        q = np.asarray(prepare_vectors(np.asarray(queries, np.float32),
                                       self.metric))
        qb = min(query_batch, q.shape[0])
        for _ in range(warmup):  # compile + warm cache (reference warms 100q)
            np.asarray(beam_search(
                self.base, self.neighbors, self.eps, jnp.asarray(q[:qb]),
                k=k, L=L, metric=self.metric, base_sqnorm=self.base_sqnorm,
                expand=expand, visited_mode=visited_mode).ids[:1])
        t0 = time.perf_counter()
        ids, dists, cmps, hops = self.search(q, k, L, query_batch=qb,
                                             expand=expand,
                                             visited_mode=visited_mode)
        jax.block_until_ready(ids)
        dt = time.perf_counter() - t0
        return {
            "L_pq": L, "k": k,
            "qps": q.shape[0] / dt,
            "avg_cmps": float(cmps.mean()),
            "avg_hops": float(hops.mean()),
            "mean_latency_ms": 1000.0 * dt / max(1, q.shape[0] // qb),
            "ids": ids, "dists": dists,
        }
