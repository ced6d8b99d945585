"""Explain the non-monotone L=40-56 fused-graph QPS ordering (VERDICT r4 #6).

BENCH_r04 recorded L=40 -> 41.3k, L=44 -> 36.5k, L=48 -> 30.2k, L=56 ->
37.7k plateau medians — a larger L beating a smaller one by 25%. Two
candidate mechanisms: (a) a tile/padding cliff between L=48 and L=56
(pool width L+expand*M crossing a 256-lane multiple changes the sort
network depth), (b) inter-config contention drift on the time-sliced
chip (each config measured minutes apart; the r4 in-row spreads at L=40
[25.5k, 42.7k] and L=48 [21.5k, 30.2k] already show depressed trials).

Protocol: ONE FusedSearcher (one table residency), L in {40,44,48,56}
x 10 trials each, INTERLEAVED round-robin (config order cannot alias
chip-state drift), 2-trial ramp discard per config. Median + spread per
L. Run on an otherwise idle chip with the 1M index cached.
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

KEY = "t2i1m_v3_1000000_200000_128"
N_EVAL = 32768
K = 10
LS = (40, 44, 48, 56)
TRIALS = 10
RAMP = 2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from mysteryann_tpu.graph import RoarGraphIndex
    from mysteryann_tpu.search.fused import FusedSearcher
    from mysteryann_tpu.utils.metrics import compute_recall

    with np.load(os.path.join(CACHE, KEY + "_data.npz")) as z:
        base = z[z.files[0]]
    with np.load(os.path.join(CACHE, f"{KEY}_evalw{N_EVAL}.npz")) as z:
        eval_q = z[z.files[0]]
    with np.load(os.path.join(CACHE, f"{KEY}_gtw{N_EVAL}.npz")) as z:
        gt_i = z[z.files[0]].astype(np.int64)

    index_path = os.path.join(CACHE, f"{KEY}_64_32_128_p2e4b4_proj.index")
    index = RoarGraphIndex.load(index_path)
    fused = FusedSearcher(index, base, max_degree=48, seed_sample=2, bits=8)

    # warm + ramp-discard each config once (compile + device ramp)
    for L in LS:
        for t in range(RAMP):
            fused.benchmark(eval_q, k=K, L=L, query_batch=8192, expand=4,
                            seeds=40, warmup=1 if t == 0 else 0)
        log(f"L={L} ramped")

    qps = {L: [] for L in LS}
    recall = {}
    for t in range(TRIALS):
        for L in LS:  # interleaved: config order cannot alias drift
            r = fused.benchmark(eval_q, k=K, L=L, query_batch=8192,
                                expand=4, seeds=40, warmup=0)
            qps[L].append(round(r["qps"], 1))
            if t == 0:
                recall[L] = round(
                    float(compute_recall(r["ids"], gt_i, K)), 4)
        log(f"round {t}: " + " ".join(f"L{L}={qps[L][-1]:.0f}"
                                      for L in LS))

    rows = []
    for L in LS:
        s = sorted(qps[L])
        rows.append({"L": L, "median": s[len(s) // 2], "min": s[0],
                     "max": s[-1], "recall": recall[L],
                     "trials": qps[L]})
        log(rows[-1])
    print(json.dumps({"probe": "l_monotone", "rows": rows}))


if __name__ == "__main__":
    main()
