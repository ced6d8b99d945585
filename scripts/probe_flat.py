"""Probe flat-scan serving variants on the 1M bench workload (on-chip).

Measures the levers VERDICT r2 named for reclaiming >=10x vs_baseline on
the flat path: the int8 global-scale scan runs near MXU int8 peak
(~5 ms per 8192x1M pass) but its f32 rerank gather is DESCRIPTOR-bound
(~20 M rows/s regardless of row bytes), so rerank *depth* — not rerank
precision — is the cost knob. Variants:

  f32/o2            the r2 headline config (exact scan, oversample 2)
  f32/tile1m        same, single-block scan (no tile loop or merges)
  i8/none           global-int8 scan, NO rerank (ids by quantized score;
                    dists rescaled s32 — approximate, rderr reported)
  i8/o2 i8/o4       scan + exact f32 rerank at depth 20 / 40
  i8/o2bf16,o4bf16  scan + bf16-row rerank (256 B rows vs 512 B)

Every row is timed median-of-3 (plus warmup), fence-timed (true
completion barrier, utils/fence.py), 32,768 eval queries in 4 chained
8192-query device batches — the bench.py protocol. Run after bench.py
has populated .bench_cache (uses its cached base/eval/GT npz).
"""

import json
import os
import statistics
import sys
import time

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


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from mysteryann_tpu.ops.knn import (exact_knn_device,
                                        int8_global_knn_device,
                                        quantize_global_int8,
                                        quantize_rows_int8)
    from mysteryann_tpu.ops.gather import gather_rows
    from mysteryann_tpu.utils.fence import fence
    from mysteryann_tpu.utils.metrics import compute_recall, compute_rderr

    base, _ = loadz(KEY + "_data")
    (eval_q,) = loadz(f"{KEY}_evalw{N_EVAL}")
    gt_i, gt_d = loadz(f"{KEY}_gtw{N_EVAL}")
    gt_i = gt_i.astype(np.int64)

    base_d = jnp.asarray(base, jnp.float32)          # 512 MB
    base_bf16 = base_d.astype(jnp.bfloat16)          # 256 MB
    base_i8, g_scale = quantize_global_int8(base_d)  # 128 MB
    g_scale = float(g_scale)
    q_all = jnp.asarray(eval_q, jnp.float32)

    @partial(jax.jit, static_argnames=("k", "prec"))
    def rerank(basekind, q, cand_i, k, prec):
        B, kk = cand_i.shape
        d = basekind.shape[1]
        vecs = gather_rows(basekind, cand_i.reshape(-1)).reshape(B, kk, d)
        ip = jnp.einsum("bd,bkd->bk", q.astype(vecs.dtype), vecs,
                        preferred_element_type=jnp.float32)
        dists = -ip
        neg, pos = jax.lax.top_k(-dists, k)
        return -neg, jnp.take_along_axis(cand_i, pos, axis=1)

    def run_batches(fn):
        outs = []
        for s in range(0, N_EVAL, QB):
            qs = jax.lax.dynamic_slice_in_dim(q_all, s, QB)
            outs.append(fn(qs))
        fence(outs[-1])
        return outs

    def timeit(fn, label):
        run_batches(fn)  # warmup/compile
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

    # f32 exact scan (current bench headline config)
    def f32_scan(tile, kk):
        def fn(qs):
            dd, ii = exact_knn_device(qs, base_d, k=kk, tile=tile,
                                      approx=True, recall_target=0.95)
            return dd[:, :K], ii[:, :K]
        return fn
    rows.append(timeit(f32_scan(262144, 2 * K), "f32/o2/t256k"))
    rows.append(timeit(f32_scan(1000000, 2 * K), "f32/o2/t1m"))

    # int8 global scan, no rerank
    def i8_none(tile):
        @jax.jit
        def fn(qs):
            q_i8, q_sc = quantize_rows_int8(qs)
            dd, ii = int8_global_knn_device(q_i8, base_i8, k=K, tile=tile)
            return dd * (q_sc[:, None] * g_scale), ii
        return fn
    rows.append(timeit(i8_none(262144), "i8/none/t256k"))
    rows.append(timeit(i8_none(1000000), "i8/none/t1m"))

    # int8 global scan + rerank at depth kk, f32 or bf16 rows
    def i8_rr(kk, tbl, label_prec, tile=1000000):
        @jax.jit
        def fn(qs):
            q_i8, _ = quantize_rows_int8(qs)
            _, ii = int8_global_knn_device(q_i8, base_i8, k=kk, tile=tile)
            return rerank(tbl, qs, jnp.maximum(ii, 0), K, label_prec)
        return fn
    rows.append(timeit(i8_rr(2 * K, base_d, "f32"), "i8/o2/f32rr"))
    rows.append(timeit(i8_rr(4 * K, base_d, "f32"), "i8/o4/f32rr"))
    rows.append(timeit(i8_rr(2 * K, base_bf16, "bf16"), "i8/o2/bf16rr"))
    rows.append(timeit(i8_rr(4 * K, base_bf16, "bf16"), "i8/o4/bf16rr"))

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
