"""Mid-build checkpoint/resume (capability beyond the reference)."""

import numpy as np

from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ops import exact_knn
from mysteryann_tpu.graph import build_roargraph
from mysteryann_tpu.utils.params import BuildConfig


def test_checkpoint_resume_identical(tmp_path):
    base, train_q = make_cross_modal(1200, 600, 24, metric="ip", seed=41)
    _, knn = exact_knn(train_q, base, k=16, metric="ip", precision="highest")
    cfg = BuildConfig(M_sq=16, M_pjbp=8, L_pjpq=32, metric="ip",
                      query_batch=256, search_batch=256)
    ck = str(tmp_path / "ck")
    a = build_roargraph(base, train_q, knn, cfg, verbose=False,
                        checkpoint_dir=ck)
    # phase files + config fingerprint exist (the phase-D file is
    # knob-tagged — see _phase_d_knob_tag)
    import os
    from mysteryann_tpu.graph.roargraph import _phase_d_knob_tag
    dtag = _phase_d_knob_tag(cfg, base.shape[0], base.shape[1])
    assert {f for f in os.listdir(ck)} == {
        "build_medoid.npy", "build_phaseA.npy", "build_phaseBC.npy",
        f"build_phaseD_{dtag}.npy", "build_meta.json"}
    # resume from checkpoints reproduces the same graph
    b = build_roargraph(base, train_q, knn, cfg, verbose=False,
                        checkpoint_dir=ck)
    np.testing.assert_array_equal(a.graph.neighbors, b.graph.neighbors)
    assert a.graph.ep == b.graph.ep
    # and matches an un-checkpointed build
    c = build_roargraph(base, train_q, knn, cfg, verbose=False)
    np.testing.assert_array_equal(a.graph.neighbors, c.graph.neighbors)
    # a phase-D-only knob change keeps the A-C checkpoints (the knobs
    # are fingerprint-neutral; phase-D outputs are isolated by tag)
    import dataclasses
    mt_a = os.path.getmtime(os.path.join(ck, "build_phaseA.npy"))
    cfg_d = dataclasses.replace(cfg, connectivity_expand=2)
    build_roargraph(base, train_q, knn, cfg_d, verbose=False,
                    checkpoint_dir=ck)
    assert os.path.getmtime(os.path.join(ck, "build_phaseA.npy")) == mt_a
    dtag2 = _phase_d_knob_tag(cfg_d, base.shape[0], base.shape[1])
    assert dtag2 != dtag
    assert os.path.exists(os.path.join(ck, f"build_phaseD_{dtag2}.npy"))
    # a different config invalidates the checkpoints instead of resuming
    cfg2 = dataclasses.replace(cfg, M_pjbp=10)
    build_roargraph(base, train_q, knn, cfg2, verbose=False,
                    checkpoint_dir=ck)
    d = np.load(os.path.join(ck, "build_phaseA.npy"))
    assert d.shape[1] == 10  # phase A rebuilt under the new config


def test_round_level_resume_replays_identically(tmp_path):
    """A phase D interrupted mid-pass resumes by replaying the saved
    per-round chunk lists (deterministic fold) — same supply output.

    Drives `_connectivity_pass` directly: the first run persists every
    round's pruned chunk lists; the second run finds them all and
    replays folds without re-searching (also covers the partial case —
    replay any prefix, search the rest)."""
    import os

    from mysteryann_tpu.graph.roargraph import (_BuildCheckpoint,
                                                _connectivity_pass,
                                                compute_medoid)
    from mysteryann_tpu.ops.distances import Metric, prepare_vectors

    base, train_q = make_cross_modal(1200, 600, 24, metric="ip", seed=43)
    _, knn = exact_knn(train_q, base, k=16, metric="ip", precision="highest")
    cfg = BuildConfig(M_sq=16, M_pjbp=8, L_pjpq=32, metric="ip",
                      query_batch=256, search_batch=256,
                      connectivity_iters=4, connectivity_engine="classic")
    ck = str(tmp_path / "ck")
    idx = build_roargraph(base, train_q, knn, cfg, verbose=False,
                          checkpoint_dir=ck)
    projection = np.load(os.path.join(ck, "build_phaseBC.npy"))
    base_dev = prepare_vectors(base, Metric.IP)
    ep = compute_medoid(base_dev)
    ckpt = _BuildCheckpoint(ck)
    nolog = lambda *a, **k: None
    a = _connectivity_pass(base_dev, projection, ep, cfg, Metric.IP,
                           nolog, ckpt=ckpt, tag="rtest")
    assert os.path.exists(os.path.join(ck, "build_rtest_r0.npy"))
    # full replay: every round comes from checkpoint, no search runs
    b = _connectivity_pass(base_dev, projection, ep, cfg, Metric.IP,
                           nolog, ckpt=ckpt, tag="rtest")
    np.testing.assert_array_equal(a, b)
    # partial replay: drop the tail rounds, re-search only those
    os.remove(os.path.join(ck, "build_rtest_r3.npy"))
    c = _connectivity_pass(base_dev, projection, ep, cfg, Metric.IP,
                           nolog, ckpt=ckpt, tag="rtest")
    np.testing.assert_array_equal(a, c)
