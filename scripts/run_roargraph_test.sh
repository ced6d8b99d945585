#!/usr/bin/env bash
# Build the RoarGraph index on T2I-10M with the reference's paper
# configuration (reference run_roargraph_test.sh:5-10: M_sq=100,
# M_pjbp=35, L_pjpq=500). The exact train->base kNN build input is
# computed in-framework (msann-compute-gt) instead of by external
# DiskANN utilities; pass --learn_base_nn_path to reuse the reference's
# file instead.
set -euo pipefail
data=${DATA_DIR:-data}/t2i-10M

msann-prepare-data t2i-10M --data_dir "${DATA_DIR:-data}"

if [ ! -e "$data/learn.base.nn.ibin" ]; then
  msann-compute-gt \
    --base_data_path "$data/base.10M.fbin" \
    --query_path "$data/query.train.10M.fbin" \
    --k 100 --dist ip --format knn \
    --out_path "$data/learn.base.nn.ibin"
fi

msann-build-roargraph \
  --data_type float --dist ip \
  --base_data_path "$data/base.10M.fbin" \
  --sampled_query_data_path "$data/query.train.10M.fbin" \
  --learn_base_nn_path "$data/learn.base.nn.ibin" \
  --projection_index_save_path "$data/t2i_10M_roar.index" \
  --M_sq 100 --M_pjbp 35 --L_pjpq 500
