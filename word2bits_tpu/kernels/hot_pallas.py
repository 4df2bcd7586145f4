"""Pallas fused one-hot hot-row accumulation.

ops/scatter.hot_slice_add turns the frequent-row scatter into a one-hot
MXU matmul — but XLA materializes the [N, H] one-hot operand in HBM
(N*H bytes of write+read traffic per step: 67 MB at the bench shape with
H=4096, growing linearly in H).  This kernel computes the same contraction
with the one-hot LHS GENERATED in VMEM per (row-block x head-block) tile —
ids are compared against the tile's column iota right before the dot — so
HBM traffic drops to rows (N*C) + head (2*H*C), independent of H.  That
extends the hot/cold split's sweet range to larger H.

Matches hot_slice_add's sums exactly in f32 (same dot, same accumulation
dtype); duplicate ids sum inside the MXU contraction.  Reference hot-loop
scatter semantics: src/word2bits.cpp:489-503.

Grid: (H/bh, N/bn), N innermost (TPU grids iterate the last axis fastest);
a VMEM f32 scratch [bh, C] accumulates across the N sweep and flushes
head + acc on the final block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hot_kernel(bh: int, bn: int, mm_dtype,
                ids_ref, rows_ref, head_ref, out_ref, acc_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    j = pl.program_id(0)
    ids_blk = ids_ref[0, :]                               # [bn] int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, bh), 1) + j * bh
    onehot = (ids_blk[:, None] == cols).astype(mm_dtype)  # [bn, bh]
    acc_ref[...] += jax.lax.dot_general(
        onehot, rows_ref[...].astype(mm_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        out_ref[...] = (head_ref[...].astype(jnp.float32)
                        + acc_ref[...]).astype(out_ref.dtype)


def hot_slice_add_pallas(table, ids, rows, hot_rows: int, extra=None,
                         block_h: int = 512, block_n: int = 512,
                         interpret: bool = False):
    """Drop-in for ops/scatter.hot_slice_add with in-kernel one-hot tiles.

    table [V, C]; ids [N] int32 (entries >= hot_rows or < 0 contribute
    nothing); rows [N, C]; extra optional [hot_rows, C] dense delta folded
    into the head update (added in XLA before the kernel — it fuses into
    the head read).
    """
    H = int(hot_rows)
    N, C = rows.shape
    bh = min(block_h, H)
    while H % bh:
        bh //= 2
    bn = min(block_n, max(8, N))
    pad = (-N) % bn
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), -1, ids.dtype)])
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, C), rows.dtype)], axis=0)
    n_pad = N + pad

    head = table[:H]
    if extra is not None:
        head = (head.astype(jnp.float32)
                + extra.astype(jnp.float32)).astype(head.dtype)
    mm_dtype = (jnp.bfloat16 if table.dtype == jnp.bfloat16
                else rows.dtype)

    kernel = functools.partial(_hot_kernel, bh, bn, mm_dtype)
    out_head = pl.pallas_call(
        kernel,
        grid=(H // bh, n_pad // bn),
        in_specs=[
            pl.BlockSpec((1, bn), lambda j, i: (0, i)),     # ids
            pl.BlockSpec((bn, C), lambda j, i: (i, 0)),     # rows
            pl.BlockSpec((bh, C), lambda j, i: (j, 0)),     # head
        ],
        out_specs=pl.BlockSpec((bh, C), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((H, C), table.dtype),
        scratch_shapes=[pltpu.VMEM((bh, C), jnp.float32)],
        interpret=interpret,
    )(ids.reshape(1, n_pad), rows, head)
    return jax.lax.dynamic_update_slice(table, out_head, (0, 0))
