"""Pallas RMW scatter-add == .at[].add() (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.kernels.scatter_pallas import scatter_add_rmw


@pytest.mark.parametrize("V,C,N,block,slots", [
    (64, 16, 100, 32, 8),      # duplicates across and within blocks
    (64, 16, 32, 32, 32),      # one block, slots == block
    (16, 8, 7, 8, 4),          # padding slots
    (128, 32, 256, 64, 2),     # tiny pipeline depth
])
def test_rmw_matches_baseline(V, C, N, block, slots):
    rng = np.random.default_rng(42)
    table = rng.normal(size=(V, C)).astype(np.float32)
    ids = rng.integers(0, V, N).astype(np.int32)
    rows = rng.normal(size=(N, C)).astype(np.float32)

    want = jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(rows))
    got = scatter_add_rmw(jnp.asarray(table), jnp.asarray(ids),
                          jnp.asarray(rows), block=block, slots=slots,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_rmw_heavy_duplicates():
    """Zipf-like ids: most updates hit a few rows (the training workload)."""
    rng = np.random.default_rng(0)
    V, C, N = 1000, 16, 512
    zipf = np.minimum(rng.zipf(1.3, N), V) - 1
    table = rng.normal(size=(V, C)).astype(np.float32)
    rows = rng.normal(size=(N, C)).astype(np.float32)

    want = jnp.asarray(table).at[jnp.asarray(zipf.astype(np.int32))].add(
        jnp.asarray(rows))
    got = scatter_add_rmw(jnp.asarray(table),
                          jnp.asarray(zipf.astype(np.int32)),
                          jnp.asarray(rows), block=128, slots=16,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_rmw_oob_sentinel_dropped():
    """The ops.scatter OOB sentinel (0x7FFFFFF0) must not touch live rows."""
    rng = np.random.default_rng(3)
    V, C = 32, 8
    table = rng.normal(size=(V, C)).astype(np.float32)
    ids = np.array([1, 0x7FFFFFF0, 2, 0x7FFFFFF0], np.int32)
    rows = rng.normal(size=(4, C)).astype(np.float32)

    want = np.array(table)
    want[1] += rows[0]
    want[2] += rows[2]
    got = scatter_add_rmw(jnp.asarray(table), jnp.asarray(ids),
                          jnp.asarray(rows), block=4, slots=2,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_rmw_bfloat16_table():
    rng = np.random.default_rng(9)
    V, C, N = 64, 16, 96
    table = jnp.asarray(rng.normal(size=(V, C)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    rows = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)

    from word2bits_tpu.ops.scatter import scatter_add_dedup
    want = scatter_add_dedup(table, ids, rows.astype(jnp.bfloat16), 32)
    got = scatter_add_rmw(table, ids, rows.astype(jnp.bfloat16),
                          block=32, slots=8, interpret=True)
    # same combine order as dedup; only the add-to-table order differs
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)
