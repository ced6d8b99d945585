"""Fused binned-scan kernel (ops/scan.py) — interpret-mode oracle tests.

The kernel's recall model: each of the BINS accumulator positions keeps
its best column, so with n <= BINS and a bijective column->bin mapping
the result must be EXACTLY the brute-force top-k (up to bf16-matmul
near-ties); with n >> BINS, collisions cost ~k²/(2·BINS) recall.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mysteryann_tpu.ops.scan import (BINS, B_BLK, C_BLK, flat_scan_topk,
                                     make_scan_table)


def _recall(ids, gt, k):
    return float(np.mean([len(set(ids[b, :k]) & set(gt[b, :k])) / k
                          for b in range(ids.shape[0])]))


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(11)
    q = rng.standard_normal((B_BLK, 128)).astype(np.float32)
    return rng, q


def test_bijective_exact(world):
    """n == BINS -> every column owns a bin: result must match the f32
    brute force except where bf16 rounding swaps near-ties."""
    rng, q = world
    n, k = BINS, 10
    base = rng.standard_normal((n, 128)).astype(np.float32)
    dd, ii = flat_scan_topk(jnp.asarray(q), make_scan_table(base), n, k,
                            interpret=True)
    ip = q @ base.T
    gt = np.argsort(-ip, axis=1)[:, :k]
    assert _recall(np.asarray(ii), gt, k) > 0.99
    # reported dists = negated bf16-matmul ip of the chosen ids
    sel = np.take_along_axis(ip, np.asarray(ii), axis=1)
    assert np.max(np.abs(np.asarray(dd) + sel)) < 0.2


def test_tail_mask_no_pad_leak(world):
    """n not a multiple of C_BLK: zero-pad rows must never be returned
    (an unmasked pad scores ip=0 and would win all-negative bins)."""
    rng, q = world
    n, k = 3 * C_BLK + 17, 10
    # adversarial: all-negative scores so pad columns would win
    base = rng.standard_normal((n, 128)).astype(np.float32)
    qneg = -np.abs(q)
    base_pos = np.abs(base)
    dd, ii = flat_scan_topk(jnp.asarray(qneg), make_scan_table(base_pos),
                            n, k, interpret=True)
    assert (np.asarray(ii) < n).all()
    ip = qneg @ base_pos.T
    gt = np.argsort(-ip, axis=1)[:, :k]
    assert _recall(np.asarray(ii), gt, k) > 0.9


def test_collision_regime_and_rerank(world):
    rng, q = world
    n, k = 20000, 10
    base = rng.standard_normal((n, 128)).astype(np.float32)
    tbl = make_scan_table(base)
    ip = q @ base.T
    gt = np.argsort(-ip, axis=1)[:, :k]
    _, ii = flat_scan_topk(jnp.asarray(q), tbl, n, k, interpret=True)
    rec = _recall(np.asarray(ii), gt, k)
    assert rec > 0.97  # collision model: ~1 - k²/(2·BINS)
    dd, ii_r = flat_scan_topk(jnp.asarray(q), tbl, n, k,
                              base_f32=jnp.asarray(base), interpret=True)
    rec_r = _recall(np.asarray(ii_r), gt, k)
    assert rec_r >= rec
    # rerank dists are exact f32 (atol covers f32 dot-order rounding:
    # 128-term accumulation at |ip| ~ 45 wanders a few e-5 between the
    # einsum and numpy's gemm)
    sel = np.take_along_axis(ip, np.asarray(ii_r), axis=1)
    np.testing.assert_allclose(np.asarray(dd), -sel, rtol=0, atol=1e-4)


def test_shape_validation(world):
    rng, q = world
    base = rng.standard_normal((BINS, 128)).astype(np.float32)
    tbl = make_scan_table(base)
    with pytest.raises(ValueError, match="shape misfit"):
        flat_scan_topk(jnp.asarray(q[:100]), tbl, BINS, 10, interpret=True)
