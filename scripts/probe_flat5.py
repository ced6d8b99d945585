"""Profile the flat scan's non-matmul gap (VERDICT r4 #2).

The 1M flat plateau (70.7k QPS) realizes ~42% of the same-rig
matmul-only rate: the missing 58% is selection (approx_min_k over
[8192, 1M]) — flat-int8 moving 4x fewer bytes yet serving SLOWER
(59.2k) proves the scan is not bandwidth-bound. This probe isolates
each stage and sweeps the selection-cost levers on identical data/GT
to bench.py:

  A. matmul-only sentinel (jnp.min consumer — fuses, no selection)
  B. matmul + approx_min_k at recall_target 0.95/0.85/0.7/0.5 and
     aggregate_to_topk on/off (the reduce emits ~L candidates per
     query; a lower target -> coarser partial reduce -> fewer)
  C. bf16-RESIDENT table (half the HBM sweep bytes; f32 accum) + f32
     rerank of the head
  D. int8 global-scale scan with the tuned selection + rerank depth

Each timed row: ramp-discard median (bench.py protocol). Prints one
JSON line with every row; recall vs the cached exact GT.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")

from mysteryann_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp

from mysteryann_tpu.utils.fence import fence
from mysteryann_tpu.utils.metrics import compute_recall

KEY = "t2i1m_v3_1000000_200000_128"
N_EVAL = 32768
K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def loadz(name):
    with np.load(os.path.join(CACHE, name + ".npz")) as z:
        return [z[k] for k in z.files]


def timed(fn, *args, repeats=3, ramp=2):
    fence(fn(*args))
    ts = []
    for t in range(ramp + repeats):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    plateau = sorted(ts[ramp:])
    return plateau[len(plateau) // 2], ts


def main():
    base, _ = loadz(KEY + "_data")
    (eval_q,) = loadz(f"{KEY}_evalw{N_EVAL}")
    gt_i, _ = loadz(f"{KEY}_gtw{N_EVAL}")
    gt_i = gt_i.astype(np.int64)

    b32 = jnp.asarray(base)
    b16 = jnp.asarray(base, jnp.bfloat16)
    q32 = jnp.asarray(eval_q)
    fence((b32, b16, q32))
    B = 8192
    nq = eval_q.shape[0]
    rows = []

    def bench_queries(step_fn):
        """Chained full-eval pass: step over 4 batches of 8192."""
        def run():
            outs = [step_fn(q32[s:s + B]) for s in range(0, nq, B)]
            return outs[-1]
        med, ts = timed(run)
        return nq / med, [round(x, 4) for x in ts]

    # ---- A: matmul-only sentinel ------------------------------------------
    # tables are jit ARGUMENTS, never closures: a closed-over device
    # array embeds as an HLO constant and the tunnel's remote_compile
    # rejects the multi-hundred-MB request body (HTTP 413)
    @jax.jit
    def mm_min(tab, q):
        d = -(q.astype(jnp.bfloat16) @ tab.T.astype(jnp.bfloat16)
              ).astype(jnp.float32)
        return jnp.min(d, axis=1)

    qps, ts = bench_queries(lambda q: mm_min(b16, q))
    rows.append({"row": "A_matmul_min_bf16tab", "qps": round(qps, 1),
                 "ts": ts})
    log(rows[-1])

    qps, ts = bench_queries(lambda q: mm_min(b32, q))
    rows.append({"row": "A_matmul_min_f32tab", "qps": round(qps, 1),
                 "ts": ts})
    log(rows[-1])

    # ---- B: selection-cost sweep (f32 table) ------------------------------
    from functools import partial

    @partial(jax.jit, static_argnames=("kk", "rt", "agg"))
    def amk(tab, q, kk, rt, agg):
        d = -(q.astype(jnp.bfloat16) @ tab.T.astype(jnp.bfloat16)
              ).astype(jnp.float32)
        return jax.lax.approx_min_k(d, k=kk, recall_target=rt,
                                    aggregate_to_topk=agg)

    def make_amk(tab, rt, kk, agg):
        return lambda q: amk(tab, q, kk=kk, rt=rt, agg=agg)

    for rt in (0.95, 0.85, 0.7, 0.5):
        f = make_amk(b32, rt, 2 * K, True)
        qps, ts = bench_queries(f)
        ii = np.concatenate([np.asarray(f(q32[s:s + B])[1])
                             for s in range(0, nq, B)])
        rec = compute_recall(ii[:, :K].astype(np.int64), gt_i, K)
        rows.append({"row": f"B_f32tab_amk_rt{rt}", "qps": round(qps, 1),
                     "recall_raw": round(float(rec), 4), "ts": ts})
        log(rows[-1])

    # ---- C: bf16-resident table -------------------------------------------
    for rt in (0.95, 0.7):
        f = make_amk(b16, rt, 2 * K, True)
        qps, ts = bench_queries(f)
        ii = np.concatenate([np.asarray(f(q32[s:s + B])[1])
                             for s in range(0, nq, B)])
        rec = compute_recall(ii[:, :K].astype(np.int64), gt_i, K)
        rows.append({"row": f"C_bf16tab_amk_rt{rt}", "qps": round(qps, 1),
                     "recall_raw": round(float(rec), 4), "ts": ts})
        log(rows[-1])

    # with exact f32 rerank of the 2K head folded in
    from mysteryann_tpu.flat import _rerank_f32
    from mysteryann_tpu.ops.distances import Metric

    def make_rerank(tab, rt, kk):
        sel = make_amk(tab, rt, kk, True)

        def f(q):
            _, ii = sel(q)
            return _rerank_f32(b32, q, jnp.maximum(ii, 0), K, Metric.IP)
        return f

    for rt in (0.95, 0.7):
        f = make_rerank(b16, rt, 2 * K)
        qps, ts = bench_queries(f)
        ii = np.concatenate([np.asarray(f(q32[s:s + B])[1])
                             for s in range(0, nq, B)])
        rec = compute_recall(ii.astype(np.int64), gt_i, K)
        rows.append({"row": f"C_bf16tab_rerank_rt{rt}", "qps": round(qps, 1),
                     "recall": round(float(rec), 4), "ts": ts})
        log(rows[-1])

    # ---- D: int8 global-scale with tuned selection ------------------------
    from mysteryann_tpu.ops.knn import quantize_global_int8, quantize_rows_int8
    bi8, _ = quantize_global_int8(b32)

    @partial(jax.jit, static_argnames=("kk", "rt"))
    def i8_sel(tab_i8, q_i8, kk, rt):
        d = -jnp.dot(q_i8, tab_i8.T,
                     preferred_element_type=jnp.int32).astype(jnp.float32)
        return jax.lax.approx_min_k(d, k=kk, recall_target=rt,
                                    aggregate_to_topk=True)

    def make_i8(rt, kk):
        def f(q):
            q_i8, _ = quantize_rows_int8(q)
            _, ii = i8_sel(bi8, q_i8, kk=kk, rt=rt)
            return _rerank_f32(b32, q, jnp.maximum(ii, 0), K, Metric.IP)
        return f

    for rt, kk in ((0.95, 2 * K), (0.7, 2 * K), (0.7, 4 * K)):
        f = make_i8(rt, kk)
        qps, ts = bench_queries(f)
        ii = np.concatenate([np.asarray(f(q32[s:s + B])[1])
                             for s in range(0, nq, B)])
        rec = compute_recall(ii.astype(np.int64), gt_i, K)
        rows.append({"row": f"D_int8_rt{rt}_kk{kk}", "qps": round(qps, 1),
                     "recall": round(float(rec), 4), "ts": ts})
        log(rows[-1])

    print(json.dumps({"probe": "flat5", "rows": rows}))


if __name__ == "__main__":
    main()
