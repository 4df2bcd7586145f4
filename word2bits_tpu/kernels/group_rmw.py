"""Sorted group-RMW scatter-add: compact rows placed in-kernel — the
capacity-scale successor to kernels/scatter_pallas.py's group-RMW.

The parameter update is `table.at[ids].add(rows)` (TPU-native form of the
reference's racy RMW loop, reference src/word2bits.cpp:489-503).  At the
flagship shape (3.7M x 800d bf16, ~22.5k update rows/step) the round-4
capacity path — XLA-side one-hot expansion of every row to its 16-row
sublane group plus an MXU block-dedup, feeding scatter_pallas's RMW
chains — measured 21.4 ms/step of XLA prep alone against a ~1.3 GB HBM
traffic floor (tools/capacity_ablate.py `scatprep`, v5e 2026-08-20): the
[N, 16, C] group-layout temp is ~1.2 GB each way and the O(block^2)
combine matmuls sweep it again.

This kernel keeps the rows COMPACT end to end:

  * XLA pre-pass (group_plan): ONE sort_key_val over the ids + a shifted
    compare — no scatter, no expansion.  Rows are permuted into sorted
    order by one [N, C] gather (the span kernel's proven-cheap pre-pass);
  * the sorted stream is streamed in [chunk, C] grid blocks; each row
    whose group differs from its predecessor (or that starts a block)
    opens a VISIT: an RMW chain on the row's 16-row sublane group —
    read group -> place+add -> write back;
  * placement is one MXU matmul per visit: a [grp, chunk] one-hot mask
    built from the sorted ids (iota == sid - g*grp; rows of other groups
    and pad/drop sentinels never match) times the [chunk, C] row block —
    so ALL of the chunk's rows for that group land in one visit, and
    same-id duplicates combine in the f32 matmul accumulator for free
    (no separate dedup pass: sorting makes duplicates adjacent);
  * `slots` chains ride concurrently like scatter_pallas (reads issued
    `slots` visits ahead from scalar-prefetched SMEM), so HBM group
    latency is paid once per `slots` visits.  Within a block visits are
    distinct groups by construction (race-free); a group spanning a block
    boundary becomes two visits ordered by the end-of-block drain.

Traffic = touched groups x (one read + one write) + the compact row
stream — at the flagship shape ~6.3k groups x 106 KB x 2 ~= 1.3 GB, vs
the old path's ~5 GB of expansion traffic plus combine FLOPs.

Equal to `table.at[ids].add(rows)` modulo float summation order (per-visit
f32 sums + one table-dtype add per visit — strictly fewer roundings than
the baseline's per-row table-dtype adds).  ids >= V (the 0x7FFFFFF0 drop
sentinel) sort to the end, open no visit, and are dropped like
mode="drop".
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from word2bits_tpu.kernels.scatter_pallas import group_rows

# plain Python int (not a traced jnp constant): see span_scatter._SENTINEL
_SENTINEL = 0x7FFFFFF0


class GroupPlan(NamedTuple):
    """Pure function of (ids, grp, chunk) — hoistable/vmappable over an
    S-step chunk like span_scatter.SpanPlan."""
    order: jnp.ndarray   # [nb*chunk] int32 source row index; N = zero row
    sids: jnp.ndarray    # [nb*chunk] int32 sorted ids (sentinel pad)
    vis: jnp.ndarray     # [nb*chunk] int32 group id where this row opens a
    #                      visit (first of its group in its block), else
    #                      the skip sentinel


def _group_kernel(grp: int, chunk: int, ngroups: int, nb: int, slots: int,
                  vis_ref, sids_ref, rows_ref, table_ref, out_ref,
                  acc_ref, rsem, wsem):
    """One grid step: RMW every group visited by one [chunk, C] sorted row
    block.

    vis_ref:   SMEM [nb*chunk] int32 scalar prefetch — group id at rows
               that open a visit, >= ngroups elsewhere (skip)
    sids_ref:  VMEM [1, 8, chunk] sorted ids (sublane-replicated) — the
               one-hot mask source
    rows_ref:  VMEM [chunk, C] sorted update rows for this block
    table_ref: HBM [ngroups, grp, C] aliased in/out (out_ref = same buffer)
    acc_ref:   VMEM [slots, grp, C] RMW staging slots
    rsem/wsem: DMA semaphore arrays [slots]

    Start/wait pairs share the visit predicate (vis < ngroups), so skipped
    rows never leave a dangling semaphore — the scatter_pallas discipline.
    """
    del table_ref  # aliased: all access goes through out_ref
    base = pl.program_id(0) * chunk
    dt = out_ref.dtype
    sids = sids_ref[0, 0, :]                                   # [chunk]
    iota = lax.broadcasted_iota(jnp.int32, (grp, chunk), 0)
    rows = rows_ref[:]

    def read(i, slot):
        @pl.when(vis_ref[base + i] < ngroups)
        def _():
            pltpu.make_async_copy(
                out_ref.at[vis_ref[base + i]], acc_ref.at[slot],
                rsem.at[slot]
            ).start()

    for s in range(slots):
        read(s, s)

    def body(i, _):
        slot = lax.rem(i, slots)
        g = vis_ref[base + i]
        ok = g < ngroups

        @pl.when(ok)
        def _():
            # mask selects every row of group g in this block, wherever it
            # sits; the dot both places rows at their sublane offsets and
            # sums duplicates in f32
            mask = (iota == (sids - g * grp)[None, :]).astype(dt)
            placed = jnp.dot(mask, rows, preferred_element_type=jnp.float32)
            pltpu.make_async_copy(
                out_ref.at[g], acc_ref.at[slot], rsem.at[slot]
            ).wait()
            acc_ref[slot] = (acc_ref[slot].astype(jnp.float32)
                             + placed).astype(dt)
            pltpu.make_async_copy(
                acc_ref.at[slot], out_ref.at[g], wsem.at[slot]
            ).start()

        # refill the slot with the visit at i+slots once our write retires
        @pl.when(i + slots < chunk)
        def _():
            @pl.when(ok)
            def _():
                pltpu.make_async_copy(
                    acc_ref.at[slot], out_ref.at[g], wsem.at[slot]
                ).wait()
            read(i + slots, slot)
        return 0

    lax.fori_loop(0, chunk, body, 0)

    # drain: a group can span into the NEXT block (a fresh visit there
    # reads it back), and the final block must land before pallas returns
    def drain(i, _):
        slot = lax.rem(jnp.int32(chunk) + i, jnp.int32(slots))
        idx = base + chunk - slots + i

        @pl.when(vis_ref[idx] < ngroups)
        def _():
            pltpu.make_async_copy(
                acc_ref.at[slot], out_ref.at[vis_ref[idx]], wsem.at[slot]
            ).wait()
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(min(slots, chunk)), drain, 0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(0,))
def _group_call(table, prows, sids, vis, chunk: int, slots: int,
                interpret: bool):
    V, C = table.shape
    grp = group_rows(table.dtype)
    ngroups = V // grp
    nb = vis.shape[0] // chunk
    kernel = functools.partial(_group_kernel, grp, chunk, ngroups, nb,
                               slots)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                     # vis
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, chunk), lambda k, vis: (k, 0, 0)),
            pl.BlockSpec((chunk, C), lambda k, vis: (k, 0)),
            pl.BlockSpec(memory_space=pl.ANY),     # table stays in HBM
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
        input_output_aliases={3: 0},       # (vis, sids, prows, table) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(vis, sids, prows, t3)
    return out.reshape(V, C)


def group_plan(ids, grp: int, chunk: int = 128) -> GroupPlan:
    """Build the sorted-visit plan — a pure function of the ids
    (vmappable over an S-step chunk; one batched sort + shifted compares,
    no element gathers, no scatter)."""
    (N,) = ids.shape
    shift = grp.bit_length() - 1
    nb = -(-N // chunk)
    npad = nb * chunk - N

    iota = jnp.arange(N, dtype=jnp.int32)
    sids, order = lax.sort_key_val(ids, iota)
    if npad:
        sids = jnp.concatenate(
            [sids, jnp.full((npad,), _SENTINEL, jnp.int32)])
        order = jnp.concatenate([order, jnp.full((npad,), N, jnp.int32)])
    wid = sids >> shift                  # sentinels stay out of range
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), wid[:-1]])
    pos = jnp.arange(nb * chunk, dtype=jnp.int32) % chunk
    first = (pos == 0) | (wid != prev)
    vis = jnp.where(first, wid, jnp.int32(_SENTINEL))
    return GroupPlan(order=order, sids=sids, vis=vis)


def scatter_add_grmw_planned(table, plan: GroupPlan, rows,
                             chunk: int = 128, slots: int = 16,
                             interpret: bool | None = None):
    """Apply a group_plan: permute the gradient rows into sorted order (the
    only per-step 2-D XLA cost) and run the kernel."""
    N, C = rows.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    prows = jnp.concatenate(
        [rows.astype(table.dtype),
         jnp.zeros((1, C), table.dtype)])[plan.order]       # [nb*chunk, C]
    nb = plan.vis.shape[0] // chunk
    sids_blk = jnp.broadcast_to(
        plan.sids.reshape(nb, 1, chunk), (nb, 8, chunk))
    return _group_call(table, prows, sids_blk, plan.vis, chunk, slots,
                       interpret)


def scatter_add_grmw(table, ids, rows, chunk: int = 128, slots: int = 16,
                     interpret: bool | None = None):
    """table.at[ids].add(rows) via the sorted group-RMW kernel.

    table [V, C] with V % grp == 0 (grp = the dtype's sublane tile: 16
    rows bf16 / 8 rows f32 — Mosaic's HBM DMA alignment) and C % 128 == 0
    on TPU; pad at allocation (train.py's rmw-storage padding covers
    both).  ids [N] int32 in [0, V) or the 0x7FFFFFF0 drop sentinel; rows
    [N, C].  For S-step loops with ids known at chunk entry, hoist
    group_plan (vmapped) and call scatter_add_grmw_planned in the step.
    """
    N, C = rows.shape
    V = table.shape[0]
    grp = group_rows(table.dtype)
    if V % grp:
        raise ValueError(
            f"scatter_add_grmw requires table rows % {grp} == 0 (got {V}): "
            f"Mosaic HBM DMA slices must align to the ({grp}, 128) "
            f"{jnp.dtype(table.dtype).name} tile; pad the table at "
            "allocation (docs/large_vocab.md)")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret and C % 128:
        raise ValueError(
            f"scatter_add_grmw requires row width % 128 == 0 on TPU "
            f"(got {C}); pad the table columns at allocation")
    plan = group_plan(ids, grp, chunk=chunk)
    return scatter_add_grmw_planned(table, plan, rows, chunk=chunk,
                                    slots=slots, interpret=interpret)
