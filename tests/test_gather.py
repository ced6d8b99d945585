"""Pallas dynamic row gather: correctness vs jnp.take (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mysteryann_tpu.ops.gather import gather_rows


@pytest.mark.parametrize("shape", [(500, 128), (300, 8, 128)])
def test_gather_matches_take(shape):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, shape[0], size=777).astype(np.int32))
    got = np.asarray(gather_rows(table, idx, block=128, interpret=True))
    want = np.asarray(jnp.take(table, idx, axis=0))
    np.testing.assert_array_equal(got, want)


def test_gather_int8_blocks():
    rng = np.random.default_rng(1)
    table = jnp.asarray(
        rng.integers(-127, 127, size=(200, 32, 128), dtype=np.int8))
    idx = jnp.asarray(rng.integers(0, 200, size=64).astype(np.int32))
    got = np.asarray(gather_rows(table, idx, block=64, interpret=True))
    np.testing.assert_array_equal(got, np.asarray(table)[np.asarray(idx)])


def test_gather_non_multiple_block():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal((100, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 100, size=33).astype(np.int32))
    got = np.asarray(gather_rows(table, idx, block=32, interpret=True))
    np.testing.assert_array_equal(got, np.asarray(table)[np.asarray(idx)])


def test_gather_fat_rows_clamps_block():
    # 1.5 MB f32 rows (IVF 10M cluster blocks): the requested block=16
    # would put a 23 MB output block in scoped VMEM — gather_rows must
    # clamp the in-flight row count internally and stay correct.
    rng = np.random.default_rng(3)
    table = jnp.asarray(
        rng.standard_normal((12, 2944, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 12, size=21).astype(np.int32))
    got = np.asarray(gather_rows(table, idx, block=16, interpret=True))
    np.testing.assert_array_equal(got, np.asarray(table)[np.asarray(idx)])


def test_clamp_block_budgets():
    # single grid step: block*row_bytes must fit the 14 MB single-buffer
    # budget; multi-step calls get the pipeline's DOUBLE-buffered output
    # block, so their budget is 7 MB (observed on-device: 1.5 MB rows at
    # block=9/grid=2 allocate f32[18,cap,d] = 27 MB and fail compile,
    # while the same block=9 at grid=1 fits).
    from mysteryann_tpu.ops.gather import _clamp_block
    mb15 = 2944 * 128 * 4                    # 1.5 MB IVF f32 row
    assert _clamp_block(32, mb15, 9) == 9    # fits one step: keep 9
    assert _clamp_block(32, mb15, 18) == 4   # 2+ steps: halved budget
    assert _clamp_block(256, 128 * 4, 65536) == 256  # thin rows: cap only
    # rows too fat to double-buffer (> 7 MB) with a multi-step grid:
    # signal fallback (0) instead of a block that cannot compile
    assert _clamp_block(64, 1 << 30, 2) == 0
    assert _clamp_block(64, 8 << 20, 3) == 0
    assert _clamp_block(64, 8 << 20, 1) == 1  # same row fits one step
    # boundary: n_rows fits one single-buffered step -> keep the full
    # clamped block (padding rounds 13 rows up to one 14-row grid step)
    assert _clamp_block(16, 1 << 20, 13) == 14


def test_gather_fat_multistep_falls_back():
    # (7 MB, 14 MB] rows with n_rows > 1 cannot double-buffer: gather_rows
    # must fall back to jnp.take rather than emit an uncompilable kernel
    table = jnp.zeros((3, 8 << 18), jnp.float32)  # 8 MB rows
    idx = jnp.asarray([2, 0], jnp.int32)
    got = np.asarray(gather_rows(table, idx, block=16, interpret=True))
    np.testing.assert_array_equal(got, np.asarray(table)[np.asarray(idx)])


def test_gather_rejects_1d():
    with pytest.raises(ValueError):
        gather_rows(jnp.zeros((10,)), jnp.zeros((3,), jnp.int32))


def test_gather_cpu_fallback():
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((50, 16)).astype(np.float32))
    idx = jnp.asarray([0, 49, 7], np.int32)
    got = np.asarray(gather_rows(table, idx))
    np.testing.assert_array_equal(got, np.asarray(table)[[0, 49, 7]])
