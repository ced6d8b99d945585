"""Probe 3: where do the flat scan's milliseconds go?

probe_flat2 showed bf16 scores do NOT speed approx_min_k, and a single
1M-column block scans at ~29 ms per 8192 queries (~283k QPS). This
probe separates matmul cost from selection cost:

  mm+min        matmul -> jnp.min over columns (cheapest possible
                streaming reduction — the matmul+reduce floor)
  mm+amk        matmul -> approx_min_k k=20 (the real path)
  i8mm+min      int8 matmul -> min (int8 matmul floor)
  i8mm+amk      int8 path as served

If mm+min is much cheaper than mm+amk, approx_min_k's PartialReduce is
the bottleneck and a pallas fused scan kernel (matmul + per-tile
candidate min in VMEM) has that many milliseconds to reclaim.
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
from mysteryann_tpu.ops.knn import quantize_global_int8, quantize_rows_int8
from mysteryann_tpu.utils.fence import fence


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def loadz(name):
    with np.load(os.path.join(CACHE, name + ".npz")) as z:
        return [z[k] for k in z.files]


@jax.jit
def mm_min(q, base):
    s = jax.lax.dot_general(q, base, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.min(-s, axis=1)


@jax.jit
def mm_amk(q, base):
    s = jax.lax.dot_general(q, base, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jax.lax.approx_min_k(-s, k=20)[1]


@jax.jit
def i8mm_min(q, base_i8):
    q_i8, _ = quantize_rows_int8(q)
    s = jax.lax.dot_general(q_i8, base_i8, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return jnp.min(-s, axis=1)


@jax.jit
def i8mm_amk(q, base_i8):
    q_i8, _ = quantize_rows_int8(q)
    s = jax.lax.dot_general(q_i8, base_i8, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return jax.lax.approx_min_k(-s.astype(jnp.float32), k=20)[1]


def main():
    base, _ = loadz(KEY + "_data")
    (eval_q,) = loadz(f"{KEY}_evalw{N_EVAL}")
    base_d = jnp.asarray(base, jnp.float32)
    base_i8, _ = quantize_global_int8(base_d)
    q_all = jnp.asarray(eval_q, jnp.float32)

    def timeit(fn, tbl, label):
        def run():
            outs = []
            for s in range(0, N_EVAL, QB):
                qs = jax.lax.dynamic_slice_in_dim(q_all, s, QB)
                outs.append(fn(qs, tbl))
            fence(outs[-1])
        run()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        row = {"mode": label, "ms_per_8192": round(1000 * med / 4, 2),
               "qps": round(N_EVAL / med, 1)}
        log(json.dumps(row))
        return row

    rows = [
        timeit(mm_min, base_d, "mm+min"),
        timeit(mm_amk, base_d, "mm+amk"),
        timeit(i8mm_min, base_i8, "i8mm+min"),
        timeit(i8mm_amk, base_i8, "i8mm+amk"),
    ]
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
