"""Duplicate-combining scatter-add for the hot-loop parameter updates.

The training step's cost floor is XLA's scatter-add: with duplicate row ids
(frequent words appear many times per batch) XLA serializes the row loop at
~50 ns/row (ARCHITECTURE.md ablation; the reference's equivalent updates are
the racy RMWs at reference src/word2bits.cpp:489-503).  The serialization
exists to make duplicate adds deterministic — so the fix is to REMOVE the
duplicates before XLA sees the scatter:

  1. split ids into blocks of M;
  2. inside a block, combine rows with equal ids via a 0/1 mask matmul on
     the MXU (M x M x C FLOPs, bf16 — microseconds);
  3. scatter each block's combined rows with the duplicate slots pointed
     out-of-range (mode="drop") and unique_indices=True, letting XLA emit
     the vectorized (non-serialized) scatter path;
  4. blocks are applied sequentially, so cross-block duplicates accumulate
     through memory exactly like the baseline.

Numerics: the per-id combine sums duplicate rows in float32 (the matmul's
preferred_element_type) BEFORE the cast to a bfloat16 table — at least as
accurate as the baseline's one-by-one bf16 accumulation.  Ordering within a
block changes float addition order; tests pin equality to the f32 baseline
within rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine_block(ids, rows):
    """ids [M] int32, rows [M, C] -> (ids2 [M], combined [M, C]) where the
    first occurrence of each id carries the sum of all equal-id rows and
    every later duplicate is pointed out of range (to be dropped)."""
    M = ids.shape[0]
    eq = ids[:, None] == ids[None, :]                       # [M, M]
    lower = jnp.tril(jnp.ones((M, M), jnp.bool_), k=-1)
    is_dup = jnp.any(eq & lower, axis=1)                    # seen earlier?
    is_first = ~is_dup
    w = (eq & is_first[:, None]).astype(rows.dtype)         # route j -> first(i)
    combined = jax.lax.dot_general(
        w, rows, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST: the TPU MXU truncates f32 operands to bf16 at DEFAULT
        # precision — measured 1.7e-2 abs error on f32 dedup sums
        # (tools/alias_probes.py rmw, 2026-08-19); the mask side is exact either
        # way, but the row values are not
        precision=jax.lax.Precision.HIGHEST).astype(rows.dtype)
    ids2 = jnp.where(is_first, ids, jnp.int32(0x7FFFFFF0))  # OOB -> dropped
    return ids2, combined


def scatter_add_dedup(table, ids, rows, block: int = 1024):
    """table.at[ids].add(rows) with in-block duplicate combining.

    table [V, C]; ids [N] int32 in [0, V); rows [N, C].
    Equivalent to the serialized baseline for any duplicate pattern.
    Plain traceable function — call it inside your own jit (the training
    chunk); it must not own donation.
    """
    N, C = rows.shape
    nb = -(-N // block)
    pad = nb * block - N
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), 0x7FFFFFF0, jnp.int32)])
        rows = jnp.concatenate([rows, jnp.zeros((pad, C), rows.dtype)])
    ids = ids.reshape(nb, block)
    rows = rows.reshape(nb, block, C)

    def body(table, xs):
        bids, brows = xs
        ids2, combined = _combine_block(bids, brows)
        table = table.at[ids2].add(combined.astype(table.dtype),
                                   mode="drop", unique_indices=True)
        return table, None

    table, _ = jax.lax.scan(body, table, (ids, rows))
    return table


def hot_slice_add(table, ids, rows, hot_rows: int, extra=None):
    """Accumulate every row whose id < hot_rows into table[:hot_rows] with a
    one-hot MXU matmul + one dense slice update — no scatter at all.

    The vocab is count-sorted (reference SortVocab, src/word2bits.cpp:215-242),
    so ids < hot_rows are exactly the most frequent words: the rows that carry
    most of the duplicate mass that serializes XLA's scatter loop.  Rows with
    id >= hot_rows contribute zero one-hot columns and are untouched — the
    caller scatters them separately (ideally compacted, see
    data/pipeline.cold_positions).

    table [V, C]; ids [N] int32; rows [N, C] float.  Duplicate hot ids are
    summed in float32 by the matmul (at least as accurate as the baseline's
    one-by-one accumulation into a possibly-bf16 table).

    `extra` ([hot_rows, C] float, optional) is an additional dense delta
    folded into the same single head read-modify-write (used by the
    dense-hot-negatives path, models/cbow_fused.py).
    """
    H = int(hot_rows)
    onehot = ids[:, None] == jnp.arange(H, dtype=ids.dtype)[None, :]  # [N, H]
    # bf16 operands when the table is bf16 (the updates get rounded to bf16
    # on store anyway); full precision for f32 tables
    mm_dt = jnp.bfloat16 if table.dtype == jnp.bfloat16 else rows.dtype
    hot = jax.lax.dot_general(
        onehot.astype(mm_dt), rows.astype(mm_dt),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    head = table[:H].astype(jnp.float32) + hot
    if extra is not None:
        head = head + extra.astype(jnp.float32)
    return jax.lax.dynamic_update_slice(table, head.astype(table.dtype),
                                        (0, 0))


def scatter_add_sorted(table, ids, rows):
    """Sort ids, permute rows by gather (vectorized), then scatter with
    indices_are_sorted=True.  Duplicates remain; measures whether XLA's
    sorted-scatter path beats the unsorted serialized one."""
    order = jnp.argsort(ids)
    return table.at[ids[order]].add(rows[order].astype(table.dtype),
                                    indices_are_sorted=True)
