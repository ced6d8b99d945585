"""Measure the CPU reference (baseline/bench_reference) on the 1M bench data.

Exports bench.py's cached 1M artifacts (base, train, train kNN, in-world
eval + exact GT) to the reference's fbin/ibin formats, builds the
reference index if missing (eval-independent, so a cached build is
reused), and runs the reference's own OMP search sweep. The resulting
recall frontier + QPS feed BASELINE.md and bench.py's
MEASURED_REFERENCE_QPS_AT_R95 constant — measured on IDENTICAL data to
our rows, per the survey's north-star protocol.

Run: `python scripts/run_baseline_1m.py [--workdir DIR] [--threads N]`.
CPU-only; does not touch JAX or the device.
"""

import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")
KEY = "t2i1m_v3_1000000_200000_128"
N_EVAL = 32768
M_SQ, M_PJBP, L_PJPQ = 64, 32, 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def loadz(name):
    with np.load(os.path.join(CACHE, name + ".npz")) as z:
        return [z[k] for k in z.files]


def main():
    from mysteryann_tpu.io import write_fbin
    from mysteryann_tpu.io.formats import write_knn_ibin

    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/baseline_v3")
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--Ls", default="50,100,150,250,400,700,1000")
    args = ap.parse_args()
    wd = args.workdir
    os.makedirs(wd, exist_ok=True)

    exe = os.path.join(REPO, "baseline", "bench_reference")
    if not os.path.exists(exe):
        log("building baseline/bench_reference ...")
        subprocess.run(["make", "-C", os.path.join(REPO, "baseline")],
                       check=True)

    def export(path, fn):
        if not os.path.exists(path):
            fn()
            log(f"exported {path}")

    base_p = os.path.join(wd, "base.fbin")
    train_p = os.path.join(wd, "train.fbin")
    knn_p = os.path.join(wd, "train_knn.ibin")
    eval_p = os.path.join(wd, "evalw.fbin")
    gt_p = os.path.join(wd, "evalw_gt.ibin")

    export(base_p, lambda: write_fbin(base_p, loadz(KEY + "_data")[0]))
    export(train_p, lambda: write_fbin(train_p, loadz(KEY + "_data")[1]))
    export(knn_p, lambda: write_knn_ibin(
        knn_p, loadz(KEY + "_knn")[0].astype(np.int32)))
    export(eval_p, lambda: write_fbin(
        eval_p, loadz(f"{KEY}_evalw{N_EVAL}")[0]))
    export(gt_p, lambda: write_knn_ibin(
        gt_p, loadz(f"{KEY}_gtw{N_EVAL}")[0].astype(np.int32)))

    index_p = os.path.join(wd, "ref1m.index")
    if not os.path.exists(index_p):
        log(f"== reference build (M_sq={M_SQ} M_pjbp={M_PJBP} "
            f"L_pjpq={L_PJPQ}, {args.threads} threads) ==")
        subprocess.run([exe, "build", base_p, train_p, knn_p, index_p,
                        str(M_SQ), str(M_PJBP), str(L_PJPQ),
                        str(args.threads)], check=True)

    log(f"== reference search sweep ({args.threads} threads) ==")
    subprocess.run([exe, "search", base_p, index_p, eval_p, gt_p,
                    "10", str(args.threads), args.Ls], check=True)


if __name__ == "__main__":
    main()
