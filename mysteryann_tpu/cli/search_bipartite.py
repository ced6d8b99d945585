"""Bipartite-variant search/eval CLI — counterpart of the reference
test_search_bipartite driver (reference tests/test_search_bipartite.cpp):
two-hop search over the bipartite graph, same report schema as the
RoarGraph search CLI."""

from __future__ import annotations

import argparse


from mysteryann_tpu.cli.common import (
    add_common_search_flags,
    load_vectors,
    result_header,
    result_row,
    write_csv,
)
from mysteryann_tpu.graph import BipartiteIndex, BipartiteSearcher
from mysteryann_tpu.io import read_gt_with_dist
from mysteryann_tpu.utils.metrics import compute_recall, compute_rderr


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_search_flags(p)
    p.add_argument("--bipartite_index_save_path", required=True)
    p.add_argument("--seed", type=int, default=0,
                   help="entry-point RNG seed (reference uses 10 random "
                        "base seeds per query)")
    args = p.parse_args(argv)

    base = load_vectors(args.base_data_path)
    queries = load_vectors(args.query_path)
    gt_ids, gt_dists = read_gt_with_dist(args.gt_path)
    index = BipartiteIndex.load(args.bipartite_index_save_path,
                                metric=args.dist or None,
                                dim=base.shape[1])
    searcher = BipartiteSearcher(index, base, seed=args.seed)
    print(result_header())
    rows = []
    for L in args.L_pq:
        if L < args.k:
            continue
        # device-timed via the searcher's benchmark — same methodology
        # as the RoarGraph CLI (the old hand-rolled loop timed per-batch
        # host downloads, skewing bipartite-vs-roargraph comparisons)
        r = searcher.benchmark(queries, k=args.k, L=L,
                               query_batch=args.query_batch)
        r["recall"] = compute_recall(r["ids"], gt_ids, args.k)
        r["rderr"] = compute_rderr(r["dists"], gt_dists, args.k,
                                   index.metric)
        print(result_row(r))
        rows.append(r)
    if args.csv_path:
        write_csv(args.csv_path, rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
