"""Coarse-scan entry-point seeding — the TPU analogue of HNSW's hierarchy.

CPU graph indexes reach the target neighborhood through upper hierarchy
levels (HNSW) or a fixed medoid walk (the reference, RoarGraph
src/index_bipartite.cpp:2322-2353). On TPU the same job is one bf16 MXU
matmul over a strided sample of the base: ~1.3 ms per 8192 queries at a
1-in-4 sample of 1M×128d, returning per-query seeds that land the beam
inside the target neighborhood. Measured 2.4x QPS at the recall-.95
point versus the medoid walk (BASELINE.md).

The sample holds ~1/r of each query's true top-k, so the scan alone is
no answer — the graph walk does the precision work; seeds only replace
the navigation prefix of the walk.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mysteryann_tpu.ops.distances import Metric


def make_seed_sample(base_dev: jax.Array, rate: int
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Strided 1-in-`rate` sample of the (metric-prepared, device-resident)
    base, kept in bf16: (sample [S, d] bf16, row norms [S] f32, ids [S])."""
    n = base_dev.shape[0]
    ids = np.arange(0, n, rate, dtype=np.int32)
    # strided slice, NOT a fancy-index gather: the latter lowers to
    # XLA's ~1.7 GB/s serial row gather (a multi-second stall at 50M)
    samp = jax.lax.slice(base_dev, (0, 0), (n, base_dev.shape[1]),
                         (rate, 1))
    return (samp.astype(jnp.bfloat16), jnp.sum(samp * samp, axis=1),
            jnp.asarray(ids))


@partial(jax.jit, static_argnames=("n_seeds", "metric"))
def seed_scan(samp, samp_sq, samp_ids, q, n_seeds: int, metric: Metric):
    """Top-`n_seeds` sample members per query: (ids [B, S], dists [B, S])."""
    ip = jnp.einsum("bd,sd->bs", q.astype(jnp.bfloat16), samp,
                    preferred_element_type=jnp.float32)
    if metric in (Metric.IP, Metric.COSINE):
        dist = -ip
    else:
        # clamp: the bf16 ip can push ||q-s||² ulp-negative for a query
        # equal to a sampled point
        dist = jnp.maximum(
            jnp.sum(q * q, axis=1, keepdims=True) - 2.0 * ip + samp_sq, 0.0)
    vals, idx = jax.lax.approx_min_k(dist, n_seeds)
    # NOTE: vals carry bf16-matmul error. The fused engine ignores this
    # (its final f32 rerank rescores everything); the classic engine
    # passes seed_d=None so beam_search rescores seeds in f32.
    return jnp.take(samp_ids, idx), vals
