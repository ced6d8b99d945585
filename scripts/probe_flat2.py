"""Probe 2: bf16-score selection + rerank depth on the flat path.

probe_flat.py showed f32 and int8 scans both bound ~285k QPS at 1M —
the approx_min_k pass over [8192, 1M] f32 scores (at VPU rate) is the
bottleneck, not the matmul (int8 vs bf16 matmul made no difference).
This probe measures selection over BF16 scores (half the VPU-rate
selection traffic; ranking granularity ~0.4% at score magnitude, which
a shallow exact f32 rerank absorbs) and the rerank-depth trade.

All tables are passed as jit ARGUMENTS (closing over a 512 MB device
array embeds it as an HLO constant — the axon remote-compile endpoint
rejects the payload with HTTP 413).
"""

import json
import os
import statistics
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")
KEY = "t2i1m_v3_1000000_200000_128"
N_EVAL = 32768
K = 10
QB = 8192

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".cache", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
# env var alone is ignored by this JAX build — the config route
# must initialize the cache (utils/cache.py)
from mysteryann_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def loadz(name):
    with np.load(os.path.join(CACHE, name + ".npz")) as z:
        return [z[k] for k in z.files]


import jax
import jax.numpy as jnp
from mysteryann_tpu.ops.knn import (quantize_global_int8, quantize_rows_int8)
from mysteryann_tpu.ops.gather import gather_rows
from mysteryann_tpu.utils.fence import fence
from mysteryann_tpu.utils.metrics import compute_recall, compute_rderr


@partial(jax.jit, static_argnames=("k",))
def _rerank(base, q, cand_i, k):
    B, kk = cand_i.shape
    d = base.shape[1]
    vecs = gather_rows(base, cand_i.reshape(-1)).reshape(B, kk, d)
    ip = jnp.einsum("bd,bkd->bk", q, vecs, preferred_element_type=jnp.float32)
    neg, pos = jax.lax.top_k(ip, k)
    return -neg, jnp.take_along_axis(cand_i, pos, axis=1)


@partial(jax.jit, static_argnames=("kk", "rt"))
def _i8_scan_bf16(q, base_i8, kk, rt):
    """int8 matmul -> bf16 scores -> approx_min_k."""
    q_i8, _ = quantize_rows_int8(q)
    s = jax.lax.dot_general(q_i8, base_i8, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    _, ii = jax.lax.approx_min_k(-s.astype(jnp.bfloat16), k=kk,
                                 recall_target=rt)
    return ii.astype(jnp.int32)


@partial(jax.jit, static_argnames=("kk", "rt"))
def _i8_scan_f32(q, base_i8, kk, rt):
    q_i8, _ = quantize_rows_int8(q)
    s = jax.lax.dot_general(q_i8, base_i8, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    _, ii = jax.lax.approx_min_k(-s.astype(jnp.float32), k=kk,
                                 recall_target=rt)
    return ii.astype(jnp.int32)


@partial(jax.jit, static_argnames=("kk", "rt"))
def _bf16_scan(q, base_bf16, kk, rt):
    """bf16 matmul with BF16 accumulation/output -> approx_min_k."""
    s = jax.lax.dot_general(q.astype(jnp.bfloat16), base_bf16,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.bfloat16)
    _, ii = jax.lax.approx_min_k(-s, k=kk, recall_target=rt)
    return ii.astype(jnp.int32)


@partial(jax.jit, static_argnames=("kk", "rt"))
def _f32mm_bf16sel(q, base, kk, rt):
    """bf16-mult f32-accum matmul -> cast bf16 -> approx_min_k."""
    s = jax.lax.dot_general(q, base, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    _, ii = jax.lax.approx_min_k(-s.astype(jnp.bfloat16), k=kk,
                                 recall_target=rt)
    return ii.astype(jnp.int32)


def main():
    base, _ = loadz(KEY + "_data")
    (eval_q,) = loadz(f"{KEY}_evalw{N_EVAL}")
    gt_i, gt_d = loadz(f"{KEY}_gtw{N_EVAL}")
    gt_i = gt_i.astype(np.int64)

    base_d = jnp.asarray(base, jnp.float32)
    base_bf16 = base_d.astype(jnp.bfloat16)
    base_i8, _ = quantize_global_int8(base_d)
    q_all = jnp.asarray(eval_q, jnp.float32)

    def run_batches(fn):
        outs = []
        for s in range(0, N_EVAL, QB):
            qs = jax.lax.dynamic_slice_in_dim(q_all, s, QB)
            outs.append(fn(qs))
        fence(outs[-1])
        return outs

    def timeit(fn, label):
        run_batches(fn)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = run_batches(fn)
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        ids = np.concatenate([np.asarray(o[1]) for o in outs])
        dd = np.concatenate([np.asarray(o[0]) for o in outs])
        rec = compute_recall(ids, gt_i, K)
        rde = compute_rderr(dd, gt_d, K, "ip")
        row = {"mode": label, "qps": round(N_EVAL / med, 1),
               "qps_min": round(N_EVAL / max(ts), 1),
               "qps_max": round(N_EVAL / min(ts), 1),
               "recall": round(rec, 4), "rderr": round(rde, 5)}
        log(json.dumps(row))
        return row

    rows = []

    def scan_rr(scan, tbl, kk, rt):
        def fn(qs):
            ii = scan(qs, tbl, kk, rt)
            return _rerank(base_d, qs, jnp.maximum(ii, 0), K)
        return fn

    rows.append(timeit(scan_rr(_i8_scan_f32, base_i8, 2 * K, 0.95),
                       "i8f32sel/o2/rr"))
    rows.append(timeit(scan_rr(_i8_scan_bf16, base_i8, 2 * K, 0.95),
                       "i8bf16sel/o2/rr"))
    rows.append(timeit(scan_rr(_i8_scan_bf16, base_i8, 4 * K, 0.95),
                       "i8bf16sel/o4/rr"))
    rows.append(timeit(scan_rr(_bf16_scan, base_bf16, 2 * K, 0.95),
                       "bf16mm+sel/o2/rr"))
    rows.append(timeit(scan_rr(_f32mm_bf16sel, base_d, 2 * K, 0.95),
                       "f32mm+bf16sel/o2/rr"))
    # lower selection recall_target, deeper rerank compensates
    rows.append(timeit(scan_rr(_i8_scan_bf16, base_i8, 4 * K, 0.8),
                       "i8bf16sel/o4/rt.8/rr"))

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
