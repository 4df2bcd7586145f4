"""Pallas DMA scatter-add: pipelined read-modify-write against the HBM table.

The training step's cost floor is the parameter scatter-add
(reference's equivalent: the racy RMW updates at src/word2bits.cpp:489-503);
XLA serializes duplicate-safe scatters at ~50 ns/row (ARCHITECTURE.md
ablation) AND — decisive for capacity — XLA:TPU copy-insertion NEVER runs
`table.at[ids].add(rows)` in place on this backend, even with donation: the
donated argument aliases the output, but the program still materializes a
full table-sized `copy(table)` HLO temp (measured: tools/alias_probes.py bisect,
2026-08-19 — every scatter formulation pays it; `dynamic_update_slice` and
Pallas custom calls with input_output_aliases do not).  At 3.7M x 800d bf16
that copy is an 11.5 GB temp and the compile OOMs a 16 GB chip.

This kernel attacks both problems:

  1. updates are regrouped to 8-ROW-GROUP granularity: Mosaic requires HBM
     DMA slices aligned to the (8, 128) tile ("Slice shape along dimension 0
     must be aligned to tiling (8), but is 1"), so single-row RMW is not
     expressible — instead the [V, C] table is viewed as [V/8, 8, C] (a
     layout-preserving bitcast; aliasing survives it, proven by
     tools/alias_probes.py mosaic on the v5e) and each chain moves one 8-row group;
  2. each update row is pre-placed at its in-group offset (one-hot expand to
     [N, 8, C]), and ids are deduplicated BY GROUP in XLA first
     (ops.scatter._combine_block on gid = id >> 3 — an MXU mask-matmul per
     block; duplicate slots become an out-of-range sentinel).  Group-level
     uniqueness within a block makes concurrent RMW chains race-free, and
     same-id AND same-group-different-id duplicates both combine correctly
     because the combine sums the group-layout rows;
  3. the (padded) gids ride to the kernel as a scalar-prefetch operand in
     SMEM, available before the body runs, so group DMAs can be issued from
     scalar code;
  4. the kernel keeps `slots` concurrent RMW chains in flight: group g's
     chain is  read DMA table[g] -> VMEM slot, add the update group (VPU),
     write DMA slot -> table[g].  Chains on different slots overlap, so HBM
     group latency is paid once per `slots` groups instead of once per group;
  5. the grid walks blocks sequentially (TPU grids are sequential) and every
     write is awaited before the block ends, so cross-block duplicates
     accumulate through memory exactly like the serialized baseline;
  6. sentinel/OOB gids are SKIPPED in-kernel (predicated start/wait pairs) —
     the table is NOT padded with a dead row, because padding would
     materialize a (V+1)-row copy and reintroduce the 2x-table peak this
     kernel exists to avoid (docs/large_vocab.md).

The table never moves: it stays in HBM (memory_space=ANY) and is aliased
input->output, so the kernel is a true in-place update like the reference's.

Same sums as `table.at[ids].add(rows)` modulo float summation order (the
group combine sums duplicates in f32 before the table-dtype add).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rmw_kernel(block: int, slots: int, ngroups: int,
                gids_ref, rows_ref, table_ref, out_ref,
                acc_ref, rsem, wsem):
    """One grid step: RMW `block` unique-group g-row updates into the table
    (g = the dtype's sublane tile: 8 rows for f32, 16 for bf16).

    gids_ref:  SMEM [nb*block] int32 group ids (scalar prefetch); gids >=
               ngroups are padding/dedup sentinels and their chains are
               skipped entirely (no DMA issued)
    rows_ref:  VMEM [block, g, C] update groups for this block
    table_ref: HBM  [ngroups, g, C] aliased in/out (out_ref = same buffer)
    acc_ref:   VMEM [slots, g, C] RMW staging slots
    rsem/wsem: DMA semaphore arrays [slots]

    Every start/wait pair is guarded by the SAME gid-validity predicate, so
    skipped chains never leave a dangling semaphore.
    """
    del table_ref  # aliased: all access goes through out_ref
    base = pl.program_id(0) * block

    def read(i, slot):
        @pl.when(gids_ref[base + i] < ngroups)
        def _():
            pltpu.make_async_copy(
                out_ref.at[gids_ref[base + i]], acc_ref.at[slot],
                rsem.at[slot]
            ).start()

    # prologue: fill the pipeline
    for s in range(slots):
        read(s, s)

    def body(i, _):
        slot = jax.lax.rem(i, slots)
        ok = gids_ref[base + i] < ngroups

        @pl.when(ok)
        def _():
            pltpu.make_async_copy(
                out_ref.at[gids_ref[base + i]], acc_ref.at[slot],
                rsem.at[slot]
            ).wait()
            acc_ref[slot] = acc_ref[slot] + rows_ref[i]
            pltpu.make_async_copy(
                acc_ref.at[slot], out_ref.at[gids_ref[base + i]],
                wsem.at[slot]
            ).start()

        # refill the slot with row i+slots once our write retires
        @pl.when(i + slots < block)
        def _():
            @pl.when(ok)
            def _():
                pltpu.make_async_copy(
                    acc_ref.at[slot], out_ref.at[gids_ref[base + i]],
                    wsem.at[slot]
                ).wait()
            read(i + slots, slot)

        return 0

    jax.lax.fori_loop(0, block, body, 0)

    # drain: the last `slots` writes must land before the next block reads
    # (cross-block duplicates) and before pallas_call returns.
    def drain(i, _):
        slot = jax.lax.rem(jnp.int32(block) + i, jnp.int32(slots))
        idx = base + block - slots + i

        @pl.when(gids_ref[idx] < ngroups)
        def _():
            pltpu.make_async_copy(
                acc_ref.at[slot], out_ref.at[gids_ref[idx]], wsem.at[slot]
            ).wait()
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(min(slots, block)), drain, 0)


def group_rows(dtype) -> int:
    """Sublane-tile row count for `dtype` on TPU: (8, 128) tiles for f32,
    (16, 128) for bf16, (32, 128) for int8 — HBM DMA slices must align to
    it, so the RMW granularity is one such group."""
    return 32 // jnp.dtype(dtype).itemsize


@functools.partial(jax.jit, static_argnums=(3, 4, 5), donate_argnums=(0,))
def _scatter_rmw(table, gids, rows8, block: int, slots: int,
                 interpret: bool):
    """table [V, C] (V % g == 0) += group-layout rows8 [N, g, C] at gids.

    The table argument is DONATED: a top-level/eager call would otherwise
    force XLA to copy the full table to satisfy the kernel's
    input_output_alias — reintroducing the 2x-table peak this capacity
    kernel exists to avoid.  (Inside an outer donated jit — the training
    chunk — the inner donation is inert and aliasing is already safe.)"""
    nb = gids.shape[0] // block
    V, C = table.shape
    grp = group_rows(table.dtype)
    ngroups = V // grp
    kernel = functools.partial(_rmw_kernel, block, slots, ngroups)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, grp, C), lambda b, gids: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # table stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((slots, grp, C), table.dtype),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    t3 = table.reshape(ngroups, grp, C)   # layout-preserving bitcast
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(t3.shape, t3.dtype),
        input_output_aliases={2: 0},   # args: (gids, rows8, table) -> table
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gids, rows8.astype(table.dtype), t3)
    return out.reshape(V, C)


def scatter_add_rmw(table, ids, rows, block: int = 512, slots: int = 32,
                    interpret: bool | None = None):
    """table.at[ids].add(rows) via the pipelined Pallas group-RMW kernel.

    table [V, C] with V % 8 == 0 (Mosaic's HBM tile constraint — pad the
    table at allocation for arbitrary vocab; see docs/large_vocab.md);
    ids [N] int32 in [0, V) (or the OOB sentinel of ops.scatter); rows
    [N, C].  The MXU duplicate combine (ops.scatter._combine_block) runs
    first at the kernel block size ON GROUP IDS over group-layout rows —
    group uniqueness WITHIN a block is a correctness requirement
    (concurrent RMW chains on the same 8-row group would race), and the
    block boundary is the only cross-chain ordering point.
    OOB/padding/dedup-sentinel slots (gid >= V/8) are skipped inside the
    kernel (predicated start/wait pairs), so the table buffer passes
    through UNPADDED and fully aliased — peak HBM is one table, which is
    what makes this kernel the capacity path for vocab sizes where XLA's
    scatter copy-inserts a second table (docs/large_vocab.md).
    """
    from word2bits_tpu.ops.scatter import _combine_block

    N, C = rows.shape
    V = table.shape[0]
    grp = group_rows(table.dtype)
    shift = grp.bit_length() - 1
    if V % grp:
        raise ValueError(
            f"scatter_add_rmw requires table rows % {grp} == 0 (got {V}): "
            f"Mosaic HBM DMA slices must align to the ({grp}, 128) "
            f"{jnp.dtype(table.dtype).name} tile. Pad the table to a "
            "multiple at allocation (docs/large_vocab.md).")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret and C % 128:
        raise ValueError(
            f"scatter_add_rmw requires row width % 128 == 0 on TPU "
            f"(got {C}): lane-dim DMA slices must align to the 128-lane "
            "tile. Pad the table columns at allocation "
            "(docs/large_vocab.md).")
    # cap the block so the VMEM-resident update groups fit the scoped
    # window: Pallas DOUBLE-BUFFERS the [block, grp, C] grid input, and the
    # slot array rides alongside, against a 16 MB scoped-vmem limit
    # (measured OOM at 27.6 MB with block=512, grp=16, C=1664 —
    # tools/alias_probes.py rmw); 4 MB per buffer keeps 2x + slots well inside
    it = jnp.dtype(table.dtype).itemsize
    while block > 32 and block * grp * C * it > (4 << 20):
        block //= 2

    def one_span(table, ids, rows):
        n = ids.shape[0]
        nb = -(-n // block)
        pad = nb * block - n
        if pad:
            ids = jnp.concatenate(
                [ids, jnp.full((pad,), 0x7FFFFFF0, jnp.int32)])
            rows = jnp.concatenate([rows, jnp.zeros((pad, C), rows.dtype)])

        # group-layout expansion: row i lands at sublane (ids % grp) of
        # group (ids // grp), placed in TABLE dtype — the XLA scatter path
        # also casts rows to table dtype before adding, so precision
        # matches; the combine still accumulates duplicates in f32
        # (preferred_element_type + Precision.HIGHEST inside)
        gids = ids >> shift
        off = ids & (grp - 1)
        onehot = (off[:, None] == jnp.arange(grp, dtype=jnp.int32)[None, :])
        rows8 = jnp.where(onehot[:, :, None],
                          rows.astype(table.dtype)[:, None, :],
                          jnp.zeros((), table.dtype))         # [n', grp, C]

        def comb(xs):
            bgids, brows = xs
            return _combine_block(bgids, brows)
        g2, r2 = jax.vmap(comb)((gids.reshape(nb, block),
                                 rows8.reshape(nb, block, grp * C)))
        g2 = g2.reshape(-1)
        r2 = r2.reshape(-1, grp, C)
        return _scatter_rmw(table, g2, r2, block, min(slots, block),
                            interpret)

    # span the rows in bounded chunks: the grp-times-wider group layout is
    # the dominant temp (at 3.7M x 832d bf16 a single-span expansion would
    # be ~1.2 GB x2 — enough to tip the chip over when the table itself is
    # ~12 GB), so cap the expansion at ~128 MB per span; sequential spans
    # accumulate through memory exactly like sequential blocks
    span = max(block, ((128 << 20) // (grp * C * it)) // block * block)
    if N <= span:
        return one_span(table, ids, rows)
    for s0 in range(0, N, span):
        table = one_span(table, ids[s0:s0 + span], rows[s0:s0 + span])
    return table
