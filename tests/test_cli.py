"""CLI end-to-end: compute-gt → build → search, through main() entries."""

import numpy as np
import pytest

from mysteryann_tpu.io import make_cross_modal, write_fbin, read_knn_ibin, read_gt_with_dist
from mysteryann_tpu.cli import compute_gt, build_roargraph, search_roargraph
from mysteryann_tpu.cli import build_bipartite, search_bipartite, search_flat


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clidata")
    base, train_q = make_cross_modal(1200, 800, 24, metric="ip", seed=31)
    _, eval_q = make_cross_modal(10, 100, 24, metric="ip", seed=32)
    write_fbin(str(d / "base.fbin"), base)
    write_fbin(str(d / "train.fbin"), train_q)
    write_fbin(str(d / "eval.fbin"), eval_q)
    return d


def test_compute_gt_cli(data_dir):
    rc = compute_gt.main([
        "--base_data_path", str(data_dir / "base.fbin"),
        "--query_path", str(data_dir / "train.fbin"),
        "--k", "16", "--dist", "ip", "--format", "knn",
        "--out_path", str(data_dir / "train_base.ibin"),
    ])
    assert rc == 0
    knn = read_knn_ibin(str(data_dir / "train_base.ibin"), expected_k=16)
    assert knn.shape == (800, 16)
    rc = compute_gt.main([
        "--base_data_path", str(data_dir / "base.fbin"),
        "--query_path", str(data_dir / "eval.fbin"),
        "--k", "10", "--dist", "ip", "--format", "gt",
        "--out_path", str(data_dir / "gt.bin"),
    ])
    assert rc == 0
    ids, dists = read_gt_with_dist(str(data_dir / "gt.bin"))
    assert ids.shape == (100, 10)


def test_build_and_search_roargraph_cli(data_dir, capsys):
    rc = build_roargraph.main([
        "--base_data_path", str(data_dir / "base.fbin"),
        "--sampled_query_data_path", str(data_dir / "train.fbin"),
        "--learn_base_nn_path", str(data_dir / "train_base.ibin"),
        "--projection_index_save_path", str(data_dir / "proj.index"),
        "--M_sq", "16", "--M_pjbp", "8", "--L_pjpq", "32",
        "--dist", "ip", "--query_batch", "256", "--search_batch", "256",
    ])
    assert rc == 0
    rc = search_roargraph.main([
        "--base_data_path", str(data_dir / "base.fbin"),
        "--projection_index_save_path", str(data_dir / "proj.index"),
        "--query_path", str(data_dir / "eval.fbin"),
        "--gt_path", str(data_dir / "gt.bin"),
        "--k", "10", "--L_pq", "32", "64",
        "--query_batch", "100",
        "--csv_path", str(data_dir / "out.csv"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "QPS" in out and "recall" in out
    csv_text = (data_dir / "out.csv").read_text().strip().splitlines()
    assert len(csv_text) == 3  # header + 2 rows
    recall = float(csv_text[-1].split(",")[4])
    assert recall > 0.7


def test_search_roargraph_cli_fused_seeded(data_dir, capsys):
    # the fused-engine + per-query-seeding serving flags (the 1M serving
    # mode of record) through the CLI surface
    rc = search_roargraph.main([
        "--base_data_path", str(data_dir / "base.fbin"),
        "--projection_index_save_path", str(data_dir / "proj.index"),
        "--query_path", str(data_dir / "eval.fbin"),
        "--gt_path", str(data_dir / "gt.bin"),
        "--k", "10", "--L_pq", "64", "--query_batch", "100",
        "--engine", "fused", "--seeds", "8", "--seed_sample", "4",
        "--expand", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    row = [ln for ln in out.strip().splitlines() if ln.lstrip()[:2].isdigit()]
    recall = float(row[-1].split()[4])
    assert recall > 0.7


def test_search_flat_cli(data_dir, capsys):
    rc = search_flat.main([
        "--base_data_path", str(data_dir / "base.fbin"),
        "--query_path", str(data_dir / "eval.fbin"),
        "--gt_path", str(data_dir / "gt.bin"),
        "--k", "10", "--dist", "ip", "--query_batch", "100",
        "--tile", "512",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    recall = float(out.strip().splitlines()[-1].split()[4])
    assert recall > 0.99


def test_build_and_search_bipartite_cli(data_dir, capsys):
    rc = build_bipartite.main([
        "--base_data_path", str(data_dir / "base.fbin"),
        "--sampled_query_data_path", str(data_dir / "train.fbin"),
        "--learn_base_nn_path", str(data_dir / "train_base.ibin"),
        "--bipartite_index_save_path", str(data_dir / "bip.index"),
        "--M_sq", "16", "--M_pjbp", "16", "--dist", "ip",
    ])
    assert rc == 0
    rc = search_bipartite.main([
        "--base_data_path", str(data_dir / "base.fbin"),
        "--bipartite_index_save_path", str(data_dir / "bip.index"),
        "--query_path", str(data_dir / "eval.fbin"),
        "--gt_path", str(data_dir / "gt.bin"),
        "--k", "10", "--L_pq", "64", "--query_batch", "100",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "QPS" in out


def test_build_and_search_ivf_cli(data_dir, capsys):
    from mysteryann_tpu.cli import build_ivf, search_ivf
    rc = build_ivf.main([
        "--base_data_path", str(data_dir / "base.fbin"),
        "--index_save_path", str(data_dir / "ivf.npz"),
        "--n_clusters", "32", "--kmeans_iters", "3",
        "--store", "int8", "--dist", "ip",
    ])
    assert rc == 0
    rc = search_ivf.main([
        "--index_path", str(data_dir / "ivf.npz"),
        "--base_data_path", str(data_dir / "base.fbin"),
        "--query_path", str(data_dir / "eval.fbin"),
        "--gt_path", str(data_dir / "gt.bin"),
        "--k", "10", "--nprobe", "8", "32", "--rerank", "40",
        "--query_batch", "100",
        "--csv_path", str(data_dir / "ivf.csv"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "QPS" in out
    # nprobe=32 of 32 clusters + exact rerank scans everything: recall 1.0
    last = [ln for ln in out.strip().splitlines() if ln.strip()][-1]
    assert float(last.split()[4]) > 0.99, out
    import os
    assert os.path.exists(data_dir / "ivf.csv")
    # a --dist override conflicting with the baked-in metric must fail
    # loudly (normalization/quantization happen at build time)
    with pytest.raises(SystemExit):
        search_ivf.main([
            "--index_path", str(data_dir / "ivf.npz"),
            "--query_path", str(data_dir / "eval.fbin"),
            "--gt_path", str(data_dir / "gt.bin"),
            "--dist", "cosine",
        ])
    # nprobe values beyond the cluster count are skipped, not crashed
    rc = search_ivf.main([
        "--index_path", str(data_dir / "ivf.npz"),
        "--base_data_path", str(data_dir / "base.fbin"),
        "--query_path", str(data_dir / "eval.fbin"),
        "--gt_path", str(data_dir / "gt.bin"),
        "--k", "10", "--nprobe", "8", "512", "--rerank", "40",
        "--query_batch", "100",
    ])
    assert rc == 0
