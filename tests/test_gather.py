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


def test_gather_rejects_1d():
    with pytest.raises(ValueError):
        gather_rows(jnp.zeros((10,)), jnp.zeros((3,), jnp.int32))


def test_gather_cpu_fallback():
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((50, 16)).astype(np.float32))
    idx = jnp.asarray([0, 49, 7], np.int32)
    got = np.asarray(gather_rows(table, idx))
    np.testing.assert_array_equal(got, np.asarray(table)[[0, 49, 7]])
