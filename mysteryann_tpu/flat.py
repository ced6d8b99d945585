"""Flat (brute-force) MXU index — exact search as a serving mode.

The reference exists because CPUs cannot brute-force million-scale
corpora per query (hence graphs + SIMD, reference distance.h/
index_bipartite.cpp). A v5e MXU computes an 8192-query × 1M-base × 128-d
distance block at tens of TFLOP/s — brute force IS the fast path at this
scale (fence-timed: ~236k QPS f32 at k=10 on 1M×128, see BASELINE.md;
vs ~1-5k QPS for lockstep graph traversal dominated by random-row
gathers at ~1.7 GB/s effective). This is the TPU-KNN-paper regime
(PAPERS.md).

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
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mysteryann_tpu.index import register_index
from mysteryann_tpu.ops.distances import Metric, prepare_vectors
from mysteryann_tpu.ops.gather import gather_rows_any
from mysteryann_tpu.ops.knn import (exact_knn_device, int8_global_knn_device,
                                    int8_knn_device, quantize_global_int8,
                                    quantize_rows_int8)


@partial(jax.jit, static_argnames=("k", "metric"))
def _rerank_f32(base, q, cand_i, k: int, metric: Metric):
    """Exact f32 rescoring of per-query candidate ids (pallas gather)."""
    B, kk = cand_i.shape
    d = base.shape[1]
    vecs = gather_rows_any(base, cand_i.reshape(-1)).reshape(B, kk, d)
    ip = jnp.einsum("bd,bkd->bk", q, vecs, preferred_element_type=jnp.float32)
    if metric in (Metric.IP, Metric.COSINE):
        dists = -ip
    else:
        dists = (jnp.sum(q * q, 1, keepdims=True) - 2.0 * ip
                 + jnp.sum(vecs * vecs, 2))
    neg, pos = jax.lax.top_k(-dists, k)
    return -neg, jnp.take_along_axis(cand_i, pos, axis=1)


@register_index("flat")
class FlatIndex:
    """Device-resident exact-search index.

    ``precision="int8"`` scans with per-row symmetric int8 on the MXU
    (2x the bf16 rate, 4x less HBM traffic) and reranks the
    k·oversample head with exact f32 — reported distances stay exact,
    recall loss is confined to scan-boundary candidates the oversample
    absorbs.

    ``precision="bf16"`` scans a bf16-RESIDENT copy of the table (half
    the HBM bytes per sweep — the lever at multi-tile scale where the
    scan is bandwidth-bound, e.g. 10M×128 = 39 tiles) and reranks the
    k·oversample head with exact f32, so reported distances stay exact.
    At single-tile 1M the scan is compute-bound and bf16 gains ~1%
    (scripts/probe_flat5.py); at 10M the f32 sweep moves 5.1 GB per
    batch vs 2.56 GB — measure per scale.

    ``precision="scan"`` routes through the experimental binned-scan
    pallas kernel (`ops/scan.py`) — measured SLOWER than the fused XLA
    path at 1M (46k vs 283.5k QPS; the kernel docstring records why).
    IP/cosine, d % 128 == 0; the k·oversample head is reranked in exact
    f32. Kept for the negative result and as a base for byte-reducing
    variants; production serving uses "f32" or "int8".
    """

    def __init__(self, base: np.ndarray, metric: Metric | str = Metric.IP,
                 tile: int = 262144, oversample: int = 2,
                 precision: str = "f32", recall_target: float = 0.95,
                 int8_scale: str = "auto"):
        if precision not in ("f32", "bf16", "int8", "scan"):
            raise ValueError(f"unknown precision {precision!r}")
        if int8_scale not in ("auto", "row", "global"):
            raise ValueError(f"unknown int8_scale {int8_scale!r}")
        self.metric = Metric.parse(metric)
        self.precision = precision
        self.recall_target = recall_target
        self.base = prepare_vectors(np.asarray(base, np.float32), self.metric)
        self.tile = min(tile, self.base.shape[0])
        self.oversample = oversample
        if precision == "int8":
            # "global": one base-side scale → the scan's selection fuses
            # with the s8 matmul (IP/cosine only; ~2x the row-scale scan,
            # ~3.3x the f32 scan — see ops/knn.py). "row": per-row scales,
            # tighter quantization, required for L2.
            if int8_scale == "auto":
                int8_scale = ("row" if self.metric == Metric.L2
                              else "global")
            if int8_scale == "global" and self.metric == Metric.L2:
                raise ValueError("int8_scale='global' supports ip/cosine "
                                 "only (L2 needs per-row norms)")
            self.int8_scale = int8_scale
            if int8_scale == "global":
                self.base_i8, self.base_scale = quantize_global_int8(
                    self.base)
                self.base_norm = None
            else:
                self.base_i8, self.base_scale = quantize_rows_int8(self.base)
                self.base_norm = (jnp.sum(self.base * self.base, axis=1)
                                  if self.metric == Metric.L2 else None)
        elif precision == "bf16":
            self.base_bf16 = jnp.asarray(self.base, jnp.bfloat16)
        elif precision == "scan":
            from mysteryann_tpu.ops.scan import make_scan_table
            if self.metric == Metric.L2:
                raise ValueError("precision='scan' supports ip/cosine only")
            d = self.base.shape[1]
            if d % 128:
                raise ValueError(f"precision='scan' needs dim % 128 == 0 "
                                 f"(got d={d}); pad the vectors or use "
                                 f"'f32'/'int8'")
            self.scan_table = make_scan_table(self.base)

    @property
    def n_base(self) -> int:
        return self.base.shape[0]

    def search(self, queries: np.ndarray, k: int,
               query_batch: int = 8192, device_out: bool = False,
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (ids [Q, k] i32, dists [Q, k] f32).

        Queries stay device-resident between batches — no host round trip
        (host↔device is the slow path, especially through a tunnel).
        ``device_out=True`` leaves results on device (callers composing
        further device work, and device-timed benchmarking).
        """
        if k > self.n_base:
            # the reference throws when a search returns < k results
            # (src/index_bipartite.cpp:2408-2412); a silently narrower
            # [Q, N] result breaks [Q, k] consumers
            raise ValueError(f"k ({k}) > corpus size ({self.n_base})")
        if not isinstance(queries, jax.Array):
            queries = np.asarray(queries, np.float32)
        q = prepare_vectors(queries, self.metric)
        nq, d = q.shape
        if nq == 0:
            e_i = np.empty((0, k), np.int32)
            e_d = np.empty((0, k), np.float32)
            return (jnp.asarray(e_i), jnp.asarray(e_d)) if device_out \
                else (e_i, e_d)
        qb = min(query_batch, nq)
        if self.precision == "scan":
            from mysteryann_tpu.ops.scan import B_BLK, flat_scan_topk
            qb = -(-qb // B_BLK) * B_BLK  # kernel block granularity
        pad = (-nq) % qb
        if pad:
            q = jnp.concatenate([q, jnp.zeros((pad, d), jnp.float32)])
        kk = min(k * self.oversample, self.n_base)
        outs = []
        for s in range(0, nq + pad, qb):
            qs = jax.lax.dynamic_slice_in_dim(q, s, qb)
            if self.precision == "scan":
                dd, ii = flat_scan_topk(qs, self.scan_table, self.n_base, k,
                                        base_f32=self.base,
                                        oversample=self.oversample)
                outs.append((ii, dd))
            elif self.precision == "bf16":
                # both operands bf16 so the matmul takes the full-rate
                # MXU path; f32 accumulate (preferred_element_type)
                _, ii = exact_knn_device(
                    qs.astype(jnp.bfloat16), self.base_bf16, k=kk,
                    metric=self.metric, tile=self.tile, approx=True,
                    recall_target=self.recall_target)
                dd, ii = _rerank_f32(self.base, qs,
                                     jnp.maximum(ii, 0), k, self.metric)
                outs.append((ii, dd))
            elif self.precision == "int8":
                if self.int8_scale == "global":
                    q_i8, _ = quantize_rows_int8(qs)
                    _, ii = int8_global_knn_device(
                        q_i8, self.base_i8, k=kk, tile=self.tile,
                        recall_target=self.recall_target)
                else:
                    _, ii = int8_knn_device(
                        qs, self.base_i8, self.base_scale, k=kk,
                        metric=self.metric, tile=self.tile,
                        base_norm=self.base_norm,
                        recall_target=self.recall_target)
                dd, ii = _rerank_f32(self.base, qs,
                                     jnp.maximum(ii, 0), k, self.metric)
                outs.append((ii, dd))
            else:
                dd, ii = exact_knn_device(
                    qs, self.base, k=kk,
                    metric=self.metric, tile=self.tile, approx=True,
                    recall_target=self.recall_target)
                outs.append((ii[:, :k], dd[:, :k]))
        if device_out:
            if len(outs) == 1:
                return outs[0][0][:nq], outs[0][1][:nq]
            return (jnp.concatenate([o[0] for o in outs])[:nq],
                    jnp.concatenate([o[1] for o in outs])[:nq])
        out_i = np.concatenate([np.asarray(o[0]) for o in outs])[:nq]
        out_d = np.concatenate([np.asarray(o[1]) for o in outs])[:nq]
        return out_i.astype(np.int32), out_d

    def benchmark(self, queries: np.ndarray, k: int,
                  query_batch: int = 8192, warmup: int = 1) -> dict:
        # device-timed: queries pre-staged in HBM, results blocked on
        # device, downloaded OUTSIDE the timed region. The reference's
        # timed region likewise starts and ends in working memory (one
        # address space); our host link here is a ~15 MB/s debug tunnel,
        # not the production PCIe path, so including the download would
        # measure the tunnel, not the chip.
        from mysteryann_tpu.utils.fence import fence
        q = prepare_vectors(np.asarray(queries, np.float32), self.metric)
        qb = min(query_batch, q.shape[0])
        for _ in range(warmup):
            fence(self.search(q[:qb], k, query_batch=qb, device_out=True))
        t0 = time.perf_counter()
        ids, dists = self.search(q, k, query_batch=qb, device_out=True)
        fence((ids, dists))
        dt = time.perf_counter() - t0
        return {
            "qps": q.shape[0] / dt,
            "mean_latency_ms": 1000.0 * dt / max(1, -(-q.shape[0] // qb)),
            "avg_cmps": float(self.n_base),
            "avg_hops": 0.0,
            "ids": np.asarray(ids).astype(np.int32), "dists": np.asarray(dists),
        }
