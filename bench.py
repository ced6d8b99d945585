"""Round benchmark — one JSON line for the driver.

Metric (BASELINE.md north star): QPS/chip at recall@10 >= 0.95 on a
T2I-like synthetic 1M-vector cross-modal workload (128-d, inner product,
OOD training queries), single chip. ``vs_baseline`` is the ratio against
the reference CPU QPS at the same recall on the same data when
`BASELINE.md` records a measured number (see `baseline/`), else 0.0.

Artifacts (synthetic data, GT, train kNN, built index) are cached under
``.bench_cache/`` keyed by the scale config, so repeated runs measure
search + build, not data prep.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".cache", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

# scale config (T2I-1M slice, BASELINE.json configs[0])
N_BASE = 1_000_000
N_TRAIN = 200_000
N_EVAL = 8_192
DIM = 128
METRIC = "ip"
K = 10
M_SQ, M_PJBP, L_PJPQ = 64, 32, 128
TARGET_RECALL = 0.95
L_SWEEP = (10, 20, 40, 70, 100, 150, 250, 400)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _cached(name, fn):
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, name + ".npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return [z[k] for k in z.files]
    out = fn()
    np.savez(path, *out)
    return list(out)


def read_baseline_qps() -> float:
    """Measured reference CPU QPS at the target recall, from BASELINE.md."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.md")) as f:
            m = re.search(r"MEASURED_REFERENCE_QPS_AT_R95\s*=\s*([0-9.]+)",
                          f.read())
        return float(m.group(1)) if m else 0.0
    except OSError:
        return 0.0


def main():
    from mysteryann_tpu.io import make_cross_modal
    from mysteryann_tpu.ops import exact_knn
    from mysteryann_tpu.graph import build_roargraph, RoarGraphIndex
    from mysteryann_tpu.graph.roargraph import save_projection_graph
    from mysteryann_tpu.search import Searcher
    from mysteryann_tpu.utils.params import BuildConfig
    from mysteryann_tpu.utils.metrics import compute_recall

    t_all = time.time()
    key = f"t2i1m_{N_BASE}_{N_TRAIN}_{DIM}"

    log("== data ==")
    base, train_q = _cached(key + "_data", lambda: make_cross_modal(
        N_BASE, N_TRAIN, DIM, metric=METRIC, seed=7))
    (eval_q,) = _cached(key + "_eval", lambda: [make_cross_modal(
        10, N_EVAL, DIM, metric=METRIC, seed=8)[1]])

    log("== ground truth (exact) ==")
    gt_i, gt_d = _cached(key + "_gt", lambda: list(reversed(exact_knn(
        eval_q, base, k=K, metric=METRIC, query_batch=8192,
        base_tile=131072))))
    gt_i = gt_i.astype(np.int64)

    log("== train kNN (build input) ==")
    (knn,) = _cached(key + "_knn", lambda: [exact_knn(
        train_q, base, k=M_SQ, metric=METRIC, query_batch=8192,
        base_tile=131072, approx=True)[1]])

    index_path = os.path.join(CACHE, key + "_proj.index")
    build_secs = None
    if os.path.exists(index_path):
        index = RoarGraphIndex.load(index_path)
    else:
        log("== build ==")
        cfg = BuildConfig(M_sq=M_SQ, M_pjbp=M_PJBP, L_pjpq=L_PJPQ,
                          metric=METRIC, query_batch=8192, search_batch=8192)
        t0 = time.time()
        index = build_roargraph(base, train_q, knn, cfg, verbose=True)
        build_secs = time.time() - t0
        log(f"build took {build_secs:.1f}s")
        index.save(index_path)

    log("== search sweep ==")
    searcher = Searcher(index, base)
    best = None
    rows = []
    for L in L_SWEEP:
        r = searcher.benchmark(eval_q, k=K, L=L, query_batch=N_EVAL)
        r["recall"] = compute_recall(r["ids"], gt_i, K)
        rows.append({k: v for k, v in r.items() if k not in ("ids", "dists")})
        log(f"L={L}: QPS={r['qps']:.0f} recall={r['recall']:.4f} "
            f"cmps={r['avg_cmps']:.0f} hops={r['avg_hops']:.0f}")
        if r["recall"] >= TARGET_RECALL:
            best = r
            break
    if best is None:
        best = max(rows, key=lambda r: r["recall"])
        best["qps"] = 0.0  # did not reach target recall

    base_qps = read_baseline_qps()
    result = {
        "metric": f"QPS/chip at recall@{K}>={TARGET_RECALL} on synthetic "
                  f"T2I-1M ({DIM}d, IP, OOD)",
        "value": round(best["qps"], 1),
        "unit": "QPS",
        "vs_baseline": round(best["qps"] / base_qps, 3) if base_qps else 0.0,
        "detail": {
            "recall": round(best["recall"], 4),
            "L_pq": best["L_pq"],
            "build_secs": None if build_secs is None else round(build_secs, 1),
            "rows": [{k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in r.items()} for r in rows],
            "wall_secs": round(time.time() - t_all, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
