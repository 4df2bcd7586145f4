"""Pallas DMA scatter-add: pipelined read-modify-write against the HBM table.

The training step's cost floor is the parameter scatter-add
(reference's equivalent: the racy RMW updates at src/word2bits.cpp:489-503);
XLA serializes duplicate-safe scatters at ~50 ns/row (ARCHITECTURE.md
ablation).  This kernel attacks the floor directly:

  1. ids are deduplicated in XLA first (ops.scatter._combine_block — an MXU
     mask-matmul per block; duplicate slots become an out-of-range sentinel),
     so every surviving row id in a block is unique and RMWs within a block
     are independent;
  2. the (padded) ids ride to the kernel as a scalar-prefetch operand in
     SMEM, available before the body runs, so row DMAs can be issued from
     scalar code;
  3. the kernel keeps `slots` concurrent RMW chains in flight: row r's chain
     is  read DMA table[id_r] -> VMEM slot, add the update row (VPU),
     write DMA slot -> table[id_r].  Chains on different slots overlap, so
     HBM row latency is paid once per `slots` rows instead of once per row;
  4. the grid walks blocks sequentially (TPU grids are sequential) and every
     write is awaited before the block ends, so cross-block duplicates
     accumulate through memory exactly like the serialized baseline.

The table never moves: it stays in HBM (memory_space=ANY) and is aliased
input->output, so the kernel is a true in-place update like the reference's.

Same sums as `table.at[ids].add(rows)` modulo float summation order (the
dedup combine sums duplicates in f32 before the table-dtype add).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rmw_kernel(block: int, slots: int, vpad: int,
                ids_ref, rows_ref, table_ref, out_ref,
                acc_ref, rsem, wsem):
    """One grid step: scatter `block` unique-id rows into the HBM table.

    ids_ref:   SMEM [nb*block] int32 (scalar prefetch), OOB sentinel = vpad
    rows_ref:  VMEM [block, C] update rows for this block
    table_ref: HBM  [vpad+1, C] aliased in/out (out_ref is the same buffer)
    acc_ref:   VMEM [slots, C] RMW staging slots
    rsem/wsem: DMA semaphore arrays [slots]
    """
    del table_ref  # aliased: all access goes through out_ref
    base = pl.program_id(0) * block

    def read(i, slot):
        # OOB ids point at the dead row vpad: harmless read/write target,
        # keeps the pipeline branch-free.
        pltpu.make_async_copy(
            out_ref.at[ids_ref[base + i]], acc_ref.at[slot], rsem.at[slot]
        ).start()

    # prologue: fill the pipeline
    for s in range(slots):
        read(s, s)

    def body(i, _):
        slot = jax.lax.rem(i, slots)
        pltpu.make_async_copy(
            out_ref.at[ids_ref[base + i]], acc_ref.at[slot], rsem.at[slot]
        ).wait()
        acc_ref[slot, :] = acc_ref[slot, :] + rows_ref[i, :]
        pltpu.make_async_copy(
            acc_ref.at[slot], out_ref.at[ids_ref[base + i]], wsem.at[slot]
        ).start()

        # refill the slot with row i+slots once our write retires
        @pl.when(i + slots < block)
        def _():
            pltpu.make_async_copy(
                acc_ref.at[slot], out_ref.at[ids_ref[base + i]], wsem.at[slot]
            ).wait()
            read(i + slots, slot)

        return 0

    jax.lax.fori_loop(0, block, body, 0)

    # drain: the last `slots` writes must land before the next block reads
    # (cross-block duplicates) and before pallas_call returns.
    def drain(i, _):
        slot = jax.lax.rem(jnp.int32(block) + i, jnp.int32(slots))
        pltpu.make_async_copy(
            acc_ref.at[slot],
            out_ref.at[ids_ref[base + block - slots + i]],
            wsem.at[slot],
        ).wait()
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(min(slots, block)), drain, 0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _scatter_rmw(table_pad, ids, rows, block: int, slots: int,
                 interpret: bool):
    nb = ids.shape[0] // block
    vpad = table_pad.shape[0] - 1
    kernel = functools.partial(_rmw_kernel, block, slots, vpad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, rows.shape[1]), lambda b, ids: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # table stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((slots, rows.shape[1]), table_pad.dtype),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table_pad.shape, table_pad.dtype),
        input_output_aliases={2: 0},   # args: (ids, rows, table) -> table
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ids, rows.astype(table_pad.dtype), table_pad)


def scatter_add_rmw(table, ids, rows, block: int = 1024, slots: int = 32,
                    interpret: bool | None = None):
    """table.at[ids].add(rows) via the pipelined Pallas RMW kernel.

    table [V, C]; ids [N] int32 in [0, V) (or the OOB sentinel of
    ops.scatter); rows [N, C].  The MXU duplicate combine
    (ops.scatter._combine_block) runs first at the kernel block size —
    uniqueness WITHIN a block is a correctness requirement (concurrent RMW
    chains on the same id would race), and the block boundary is the only
    cross-chain ordering point.  One dead row is appended to the table as
    the target of OOB/padding slots and stripped on return (concurrent
    chains do race on it; its value is never read back).
    """
    from word2bits_tpu.ops.scatter import _combine_block

    N, C = rows.shape
    V = table.shape[0]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    nb = -(-N // block)
    pad = nb * block - N
    if pad:
        ids = jnp.concatenate(
            [ids, jnp.full((pad,), 0x7FFFFFF0, jnp.int32)])
        rows = jnp.concatenate([rows, jnp.zeros((pad, C), rows.dtype)])

    def comb(xs):
        bids, brows = xs
        return _combine_block(bids, brows)
    ids2, rows2 = jax.vmap(comb)((ids.reshape(nb, block),
                                  rows.reshape(nb, block, C)))
    ids2 = ids2.reshape(-1)
    rows2 = rows2.reshape(-1, C).astype(table.dtype)

    # OOB sentinel -> dead row V (appended); rows there are zero, but the
    # RMW still touches the row, so it must exist.
    oob = ids2 >= V
    ids2 = jnp.where(oob, jnp.int32(V), ids2)
    rows2 = jnp.where(oob[:, None], jnp.zeros_like(rows2), rows2)

    table_pad = jnp.concatenate(
        [table, jnp.zeros((1, C), table.dtype)], axis=0)
    out = _scatter_rmw(table_pad, ids2, rows2, block, min(slots, block),
                       interpret)
    return out[:V]
