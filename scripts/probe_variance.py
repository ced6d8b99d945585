"""Serving-QPS variance probe (VERDICT r3 weak #2 / next #3).

BENCH_r03's fused median-of-3 rows spanned qps_min 39k -> qps_max 75k
within ONE row (same config, trials seconds apart, contention sentinel
quiet). This probe isolates the variance source in a fresh process:

  phase A: N back-to-back trials of one fused config, per-trial QPS +
           per-batch fence timing (is the slowness uniform across the 4
           chained batches or spiky?)
  phase B: same trials after allocating+freeing a build-sized HBM array
           (does allocator state/fragmentation reproduce the slowdown?)
  phase C: same trials after jax.clear_caches() (dispatch-cache effect?)

Run on an otherwise idle chip: python scripts/probe_variance.py
Emits one JSON line per phase.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mysteryann_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache")
KEY = "t2i1m_v3_1000000_200000_128"
INDEX = f"{KEY}_64_32_128_p2e4b4_proj.index"
L, SEEDS, EXPAND, QB = 56, 40, 4, 8192


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def loadz(name):
    with np.load(os.path.join(CACHE, name + ".npz")) as z:
        return [z[k] for k in z.files]


def trials(fused, eval_q, n, label):
    import jax
    from mysteryann_tpu.utils.fence import fence
    q = fused._prep_eval if hasattr(fused, "_prep_eval") else None
    rows = []
    for t in range(n):
        t0 = time.perf_counter()
        out = fused.search(eval_q, 10, L, query_batch=QB, device_out=True,
                           expand=EXPAND, seeds=SEEDS)
        fence(out)
        dt = time.perf_counter() - t0
        rows.append(round(eval_q.shape[0] / dt, 0))
        log(f"{label} trial {t}: {rows[-1]:.0f} QPS ({dt*1000:.0f} ms)")
    # per-batch split on the last state: fence each 8192-batch separately
    per_batch = []
    for s in range(0, eval_q.shape[0], QB):
        t0 = time.perf_counter()
        out = fused.search(eval_q[s:s + QB], 10, L, query_batch=QB,
                           device_out=True, expand=EXPAND, seeds=SEEDS)
        fence(out)
        per_batch.append(round(1000 * (time.perf_counter() - t0), 1))
    return {"label": label, "qps": rows, "per_batch_ms": per_batch}


def main():
    import jax
    import jax.numpy as jnp
    from mysteryann_tpu.graph import RoarGraphIndex
    from mysteryann_tpu.search.fused import FusedSearcher

    base, _ = loadz(KEY + "_data")
    (eval_q,) = loadz(KEY + "_evalw32768")
    index = RoarGraphIndex.load(os.path.join(CACHE, INDEX))
    fused = FusedSearcher(index, base, max_degree=48, seed_sample=2)
    # one warmup (compile)
    from mysteryann_tpu.utils.fence import fence
    fence(fused.search(eval_q[:QB], 10, L, query_batch=QB, device_out=True,
                       expand=EXPAND, seeds=SEEDS))

    out = [trials(fused, eval_q, 10, "A_fresh")]
    print(json.dumps(out[-1]), flush=True)

    # B: build-sized allocation churn. A 1M fused build keeps ~2-4 GB of
    # transient buffers (f32 base copy, packed table rebuilds, pool
    # state); allocate + free a similar footprint, then re-measure.
    junk = [jnp.ones((256, 1024, 1024), jnp.float32) * i for i in range(4)]
    for j in junk:
        j.block_until_ready()
    del junk
    out.append(trials(fused, eval_q, 10, "B_after_alloc_churn"))
    print(json.dumps(out[-1]), flush=True)

    # C: dispatch/executable cache cleared (keeps compiled binaries in
    # the persistent cache, drops live executables -> re-trace)
    jax.clear_caches()
    fence(fused.search(eval_q[:QB], 10, L, query_batch=QB, device_out=True,
                       expand=EXPAND, seeds=SEEDS))
    out.append(trials(fused, eval_q, 10, "C_after_clear_caches"))
    print(json.dumps(out[-1]), flush=True)


if __name__ == "__main__":
    main()
