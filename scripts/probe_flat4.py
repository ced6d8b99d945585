"""Probe 4: the fused binned-scan pallas kernel on the 1M workload.

Measures ops/scan.flat_scan_topk (kernel + XLA bin top-k + decode) with
and without the exact f32 rerank, median-of-3, against the cached bench
GT — the contender for the flat headline (probe_flat3 showed the XLA
scan is selection-consumer-bound at ~285-316k QPS).
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

import jax
import jax.numpy as jnp
from mysteryann_tpu.ops.scan import make_scan_table, flat_scan_topk
from mysteryann_tpu.utils.fence import fence
from mysteryann_tpu.utils.metrics import compute_recall, compute_rderr


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def loadz(name):
    with np.load(os.path.join(CACHE, name + ".npz")) as z:
        return [z[k] for k in z.files]


def main():
    base, _ = loadz(KEY + "_data")
    (eval_q,) = loadz(f"{KEY}_evalw{N_EVAL}")
    gt_i, gt_d = loadz(f"{KEY}_gtw{N_EVAL}")
    gt_i = gt_i.astype(np.int64)
    n = base.shape[0]

    tbl = make_scan_table(base)                      # 256 MB bf16
    base_d = jnp.asarray(base, jnp.float32)          # 512 MB (rerank)
    q_all = jnp.asarray(eval_q, jnp.float32)

    def timeit(fn, label):
        def run():
            outs = []
            for s in range(0, N_EVAL, QB):
                qs = jax.lax.dynamic_slice_in_dim(q_all, s, QB)
                outs.append(fn(qs))
            fence(outs[-1])
            return outs
        outs = run()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = run()
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        ids = np.concatenate([np.asarray(o[1]) for o in outs])
        dd = np.concatenate([np.asarray(o[0]) for o in outs])
        row = {"mode": label, "qps": round(N_EVAL / med, 1),
               "qps_min": round(N_EVAL / max(ts), 1),
               "qps_max": round(N_EVAL / min(ts), 1),
               "ms_per_8192": round(1000 * med / 4, 2),
               "recall": round(compute_recall(ids, gt_i, K), 4),
               "rderr": round(compute_rderr(dd, gt_d, K, "ip"), 5)}
        log(json.dumps(row))
        return row

    rows = [
        timeit(lambda qs: flat_scan_topk(qs, tbl, n, K), "scan/norr"),
        timeit(lambda qs: flat_scan_topk(qs, tbl, n, K, base_f32=base_d,
                                         oversample=2), "scan/f32rr/o2"),
    ]
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
