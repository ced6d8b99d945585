"""Serve-only sweep on the cached 10M RoarGraph: the QPS@recall>=.95 frontier.

The full build_10m serve rows use L>=100 (recall .98+); the reference's
metric of record is QPS at recall@10 = 0.95 — at 10M the seeded walk
likely crosses .95 well below L=100, where each batch does fewer hops.
This sweep loads the cached index (scripts/build_10m.py must have run)
and grids (seed_sample, seeds, L, expand) WITHOUT rebuilding anything.

Run: python scripts/sweep_10m.py [--passes 1] [--Ls 30 40 60 80 100]
Emits one JSON line with every row.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
# env var alone is ignored by this JAX build — the config route
# must initialize the cache (utils/cache.py)
from mysteryann_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache")
DIM = 128
K = 10
N_EVAL = 32_768


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_base", type=int, default=10_000_000)
    ap.add_argument("--n_train", type=int, default=1_000_000)
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--Ls", type=int, nargs="+", default=[30, 40, 60, 80])
    ap.add_argument("--seed_samples", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--seeds", type=int, default=32)
    ap.add_argument("--expand", type=int, default=4)
    ap.add_argument("--query_batch", type=int, default=8192)
    args = ap.parse_args()
    n, ntr = args.n_base, args.n_train
    key = f"t2i10m_v3_{n}_{DIM}"  # must match scripts/build_10m.py
    gkey = f"{key}_graph{ntr}"

    from mysteryann_tpu.graph import RoarGraphIndex
    from mysteryann_tpu.search import Searcher
    from mysteryann_tpu.utils.metrics import compute_recall, compute_rderr

    index_path = os.path.join(CACHE, f"{gkey}_p{args.passes}_proj.index")
    if not os.path.exists(index_path):
        log(f"no cached index at {index_path}; run scripts/build_10m.py")
        sys.exit(2)

    t0 = time.time()
    with np.load(os.path.join(CACHE, f"{key}_base.npz")) as z:
        base = z[z.files[0]]
    with np.load(os.path.join(CACHE, f"{gkey}_queries.npz")) as z:
        eval_q = z["eval"]
    with np.load(os.path.join(CACHE, f"{gkey}_gt.npz")) as z:
        # build_10m caches as [ids, dists] (reversed exact_knn output)
        gt_i = z[z.files[0]].astype(np.int64)
        gt_d = z[z.files[1]]
    assert gt_i.ndim == 2 and np.issubdtype(gt_d.dtype, np.floating)
    index = RoarGraphIndex.load(index_path)
    log(f"loaded base {base.shape} + index in {time.time()-t0:.0f}s")

    rows = []
    for r in args.seed_samples:
        s = Searcher(index, base, seed_sample=r)
        for L in args.Ls:
            br = s.benchmark(eval_q, k=K, L=L, query_batch=args.query_batch,
                             visited_mode="merge", expand=args.expand,
                             seeds=min(args.seeds, L))
            rows.append({
                "mode": f"graph_p{args.passes}_r{r}_L{L}",
                "qps": round(br["qps"], 1),
                "recall": round(compute_recall(br["ids"], gt_i, K), 4),
                "rderr": round(compute_rderr(br["dists"], gt_d, K, "ip"), 6),
                "avg_hops": round(br["avg_hops"], 1),
            })
            log(rows[-1])
        del s

    print(json.dumps({"scale": n, "passes": args.passes, "rows": rows}))


if __name__ == "__main__":
    main()
