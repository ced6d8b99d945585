"""Fused flat-scan pallas kernel — matmul + binned top-1 partial reduce.

STATUS: correct but NOT competitive — kept as a documented experiment.

The hypothesis: the flat MXU index's throughput at 1M is selection-bound,
not matmul-bound (measured, scripts/probe_flat3.py: even
``matmul -> jnp.min`` costs 21-26 ms per 8192x1M block vs ~10.6 ms of
bf16 MXU work; ``approx_min_k`` consumes scores at ~480 G elem/s). This
kernel replaces the selection consumer with a hand-rolled fold: each
128-lane group of the score tile max-folds DIRECTLY into a per-query bin
accumulator (1 compare + 2 selects per element), bins strided across the
corpus so each bin keeps its best column.

The measurement (v5e, 1M x 128 IP, 8192-query batches, 2026-08-19):
the fold runs at ~86 G elem/s — the value+index select chain costs ~7
VPU ops per score element where XLA's fused PartialReduce epilogue pays
~2 — so the kernel lands at 110 ms per 8192x1M block (~46k QPS end to
end), 3.8x SLOWER than the fused XLA scan it tried to beat (283.5k QPS,
`FlatIndex(precision="f32", tile=n)`). The lesson is recorded here so it
isn't relearned: on TPU, a hand kernel only beats XLA's matmul+top-k
fusion if it fundamentally reduces bytes or ops per element; re-plumbing
the same reduction through VMEM does neither.

Layout (one grid step = one [B_BLK, d] query block x one [C_BLK, d] base
tile):

  scores [B_BLK, C_BLK] = q @ tile.T   (bf16 MXU, f32 accumulate)
  group g of tile t folds into accumulator slice
      [(t % TG) * G + g] * 128 : +128      (G = C_BLK // 128 groups)
  so bin position p = r * 128 + lane covers columns
      col(p, j) = (j * TG + r // G) * C_BLK + (r % G) * 128 + lane
  and the i16 sidecar stores only j = t // TG (decoded by the wrapper).

The accumulators ARE the output blocks (f32 vals + i16 j), revisited
across the tile axis and flushed once — no scratch, ~12.5 MB VMEM at
B_BLK=512, BINS=4096. The wrapper then runs a tiny [B, BINS] top-k in
XLA, decodes column ids, and (optionally) reranks in exact f32.

Recall model: a bin keeps ONE column, so two true top-k ids landing in
the same bin lose the weaker one — collision probability ~ k²/(2·BINS)
(~1.2% for k=10, BINS=4096), independent of corpus size (measured at 1M:
.9913 @ oversample=2, .9957 @ oversample=4, exact f32 rerank).

Metrics: IP and COSINE (pre-normalized, like every other kernel here —
reference src/index_bipartite.cpp:176-182). L2 is served by
``exact_knn_device``; a bias-row extension (max 2q·b - ||b||²) is the
natural L2 form of this kernel if needed.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_BLK = 512     # queries per block (restreams base B/B_BLK times)
C_BLK = 512     # base rows per tile (G = 4 lane groups)
TG = 8          # tile-group stride: tile t folds into row block t % TG
G = C_BLK // 128
BINS = TG * G * 128  # 4096 accumulator positions per query


def _scan_kernel(q_ref, b_ref, val_ref, idx_ref, *, n: int, nt: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        # max-IP accumulator; flipped to a distance at the last tile
        val_ref[:] = jnp.full_like(val_ref, -jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    s = jax.lax.dot_general(
        q_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [B_BLK, C_BLK]
    if n % C_BLK:
        # pad rows (zero vectors, ip = 0) must not win bins that hold
        # only negative true scores — mask the tail tile's pad columns
        def _mask(x):
            col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            return jnp.where(col < n - (nt - 1) * C_BLK, x, -jnp.inf)
        s = jax.lax.cond(t == nt - 1, _mask, lambda x: x, s)

    jv = (t // TG).astype(jnp.int16)
    r_base = (t % TG) * G
    for g in range(G):
        sl = pl.ds((r_base + g) * 128, 128)
        cur = s[:, g * 128:(g + 1) * 128]
        av = val_ref[:, sl]
        win = cur > av
        val_ref[:, sl] = jnp.where(win, cur, av)
        idx_ref[:, sl] = jnp.where(win, jv, idx_ref[:, sl])

    @pl.when(t == nt - 1)
    def _():
        # emit negated IP so smaller = better (reference distance.h:223)
        val_ref[:] = -val_ref[:]


@partial(jax.jit, static_argnames=("n", "interpret"))
def binned_scan(q: jax.Array, base_bf16: jax.Array, n: int,
                interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """One kernel launch: (dists f32 [B, BINS], j i16 [B, BINS]).

    ``q`` f32/bf16 [B, d] with B % B_BLK == 0; ``base_bf16`` bf16
    [N_pad, d] with N_pad % C_BLK == 0 and rows >= n zero-padded;
    d % 128 == 0. Use `flat_scan_topk` for the full search.
    """
    B, d = q.shape
    npad = base_bf16.shape[0]
    if B % B_BLK or npad % C_BLK or d % 128:
        raise ValueError(f"shape misfit: B={B} (need %{B_BLK}), "
                         f"N_pad={npad} (need %{C_BLK}), d={d} (need %128)")
    nt = npad // C_BLK
    kernel = partial(_scan_kernel, n=n, nt=nt)
    return pl.pallas_call(
        kernel,
        grid=(B // B_BLK, nt),
        in_specs=[
            pl.BlockSpec((B_BLK, d), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_BLK, d), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B_BLK, BINS), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_BLK, BINS), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, BINS), jnp.float32),
            jax.ShapeDtypeStruct((B, BINS), jnp.int16),
        ),
        # accumulators [B_BLK, BINS] f32+i16 = 12 MB resident across the
        # whole tile axis + double-buffered input blocks: just past the
        # 16 MB default scoped-vmem limit (observed 16.25 MB at 1M)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), base_bf16)


@partial(jax.jit, static_argnames=("k", "n", "interpret"))
def _scan_topk(q, base_bf16, k: int, n: int, interpret: bool = False):
    """Scan + bin top-k + column-id decode: (dists [B,k], ids [B,k])."""
    dists, j = binned_scan(q, base_bf16, n, interpret=interpret)
    dd, pos = jax.lax.approx_min_k(dists, k=k)       # [B, k] bin positions
    jj = jnp.take_along_axis(j, pos, axis=1).astype(jnp.int32)
    r = pos // 128
    lane = pos % 128
    col = (jj * TG + r // G) * C_BLK + (r % G) * 128 + lane
    return dd, col


def make_scan_table(base) -> jax.Array:
    """bf16 scan table: rows padded to C_BLK (pads are masked in-kernel)."""
    base = jnp.asarray(base)
    n, d = base.shape
    rpad = (-n) % C_BLK
    t = base.astype(jnp.bfloat16)
    if rpad:
        t = jnp.concatenate([t, jnp.zeros((rpad, d), jnp.bfloat16)])
    return t


def flat_scan_topk(q: jax.Array, base_bf16: jax.Array, n: int, k: int,
                   base_f32: Optional[jax.Array] = None,
                   oversample: int = 2,
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Top-k of ``q`` in the scan table: (dists f32 [B,k], ids i32 [B,k]).

    With ``base_f32`` the k·oversample head is reranked with exact f32
    distances (pallas row gather — descriptor-bound, ~6 ms per 8192x20);
    without it, distances carry bf16-matmul precision (~0.4% relative)
    and ranking is the kernel's. B must be a multiple of B_BLK (the
    ``FlatIndex`` wrapper pads query batches). Off-TPU the kernel runs
    through the pallas interpreter (CPU correctness tests; don't
    benchmark it there).
    """
    interpret = interpret or jax.devices()[0].platform != "tpu"
    if base_f32 is None:
        return _scan_topk(q, base_bf16, k, n, interpret=interpret)
    kk = min(k * oversample, BINS)
    _, cand = _scan_topk(q, base_bf16, kk, n, interpret=interpret)
    from mysteryann_tpu.flat import _rerank_f32
    from mysteryann_tpu.ops.distances import Metric
    return _rerank_f32(base_f32, q, jnp.minimum(cand, n - 1), k, Metric.IP)
