"""Swept scatter-add: sorted MXU window placement — DEPRECATED in favor of
kernels/span_scatter.py.

Superseded (round 3): the slot-plan pre-pass this kernel needs costs more
than the sweep saves (~230 us/step even batch-hoisted; the int32 element
gathers serialize on TPU — tools/sweep_probe.py).  span_scatter streams the
sorted rows plan-free and is the measured winner; this file is retained as
a measured-negative with its numbers cited below.  Not reachable from
config (-scatter-impl accepts "add"/"span" only).

Measured 2026-08-19 (tools/ablate_fused.py, v5e, bench winner config): the
in-step parameter scatter costs ~493 us of a 974 us step (~44 ns per
EMITTED row), and XLA:TPU keeps the serialized loop no matter what —
`unique_indices` / `indices_are_sorted` change nothing in-step, and
duplicate-combining (dedup) still emits the same row count, so it cannot
win.  A dense slice RMW of the same traffic runs in ~57 us: the cost is
the per-row serialization, not the HBM bytes.  (The reference's equivalent
update is the racy RMW loop at reference src/word2bits.cpp:489-503.)

This kernel removes the per-row loop entirely:

  1. XLA pre-pass: argsort the ids (1-D, cheap), then lay the sorted rows
     out in 128-row CHUNKS padded so that no chunk crosses a table-WINDOW
     boundary (window = `window` consecutive table rows).  Slot map,
     offsets and chunk->window metadata are all vectorized 1-D ops; the
     single [n_slots, C] row gather is the only 2-D cost.
  2. Pallas kernel, flat grid over chunks: the table is streamed as
     [window, C] blocks through a scalar-prefetch-dependent index map
     (block = the chunk's window), input_output_aliased so the sweep is a
     true in-place RMW (peak HBM = 1x table).  Chunks of one window are
     consecutive (sorted), so Pallas keeps the block resident in VMEM,
     skips the refetch, and writes back only when the window changes.
  3. Placement is one MXU matmul per chunk: a [window, chunk] one-hot mask
     built in-kernel from an iota vs the in-window offsets (pad offsets are
     -1 => all-zero column), times the [chunk, C] rows.  Duplicate ids
     anywhere in the chunk/window sum exactly (one-hot columns collide on
     the same output row; the matmul accumulates in f32).

Untouched windows get no chunk, hence no DMA at all.  Cost scales with
touched-table traffic + N*window*C MXU flops, NOT with emitted rows:
at the bench shape (N~11.3k rows, V=53k, C=512 bf16) that is ~134 us of
sweep DMA + ~70 us of MXU vs ~500 us serialized.

Equal to `table.at[ids].add(rows)` modulo float summation order (per-chunk
f32 sums + one table-dtype add per chunk per window, vs the baseline's
per-row table-dtype adds — strictly fewer roundings).  Out-of-range ids
(the 0x7FFFFFF0 drop sentinel) sort to the top, fall in no window, and are
dropped like mode="drop".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sweep_kernel(window: int, chunk: int, meta_ref, first_ref,
                  tin_ref, rows_ref, offs_ref, tout_ref):
    """One grid step: place one [chunk, C] row block into its window.

    meta_ref/first_ref: SMEM scalar prefetch — chunk->window map and
    first-chunk-of-window flags (unused in the body except `first`; the
    window id drives the BlockSpec index maps).
    tin_ref/tout_ref: the SAME aliased [window, C] table block; tin is read
    only on the window's first chunk (a later refetch would be stale — the
    accumulated value lives in tout's VMEM buffer until the window changes).
    offs_ref: [1, chunk] int32 in-window offsets; -1 marks padding.
    """
    k = pl.program_id(0)
    dt = tout_ref.dtype
    off = offs_ref[0, 0, :]                                # [chunk]
    iota = lax.broadcasted_iota(jnp.int32, (window, chunk), 0)
    mask = (iota == off[None, :]).astype(dt)               # [window, chunk]
    placed = jnp.dot(mask, rows_ref[:],
                     preferred_element_type=jnp.float32)   # [window, C]

    @pl.when(first_ref[k] == 1)
    def _():
        tout_ref[:] = (tin_ref[:].astype(jnp.float32) + placed).astype(dt)

    @pl.when(first_ref[k] == 0)
    def _():
        tout_ref[:] = (tout_ref[:].astype(jnp.float32) + placed).astype(dt)


@functools.partial(jax.jit,
                   static_argnums=(5, 6, 7), donate_argnums=(0,))
def _sweep_call(table, prows, poffs, meta, first, window: int, chunk: int,
                interpret: bool):
    nwin = table.shape[0] // window
    C = table.shape[1]
    K = meta.shape[0]
    kernel = functools.partial(_sweep_kernel, window, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # meta, first
        grid=(K,),
        in_specs=[
            pl.BlockSpec((window, C), lambda k, meta, first: (meta[k], 0)),
            pl.BlockSpec((chunk, C), lambda k, meta, first: (k, 0)),
            # offsets ride sublane-replicated to satisfy the (8, 128) tile
            pl.BlockSpec((1, 8, chunk), lambda k, meta, first: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((window, C),
                               lambda k, meta, first: (meta[k], 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},      # (meta, first, table, ...) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, first, table, prows, poffs)


def plan_slots(N: int, nwin: int, chunk: int) -> int:
    """Static slot-chunk capacity: every touched window wastes < 1 chunk."""
    return N // chunk + min(nwin, N) + (1 if N % chunk else 0)


def sweep_plan(ids, V: int, window: int = 512, chunk: int = 128):
    """Placement plan for scatter_add_sweep_planned: a pure function of the
    ids alone, so it can be HOISTED out of the step loop (batched over an
    S-step chunk with vmap) when the ids are known ahead — slab token ids
    come from the precomputed epoch and negatives can be pre-drawn with the
    same per-step keys, so the plan costs ~nothing amortized.

    All slot-level arrays are derived from PER-CHUNK metadata ([K] ints,
    searchsorted into [nwin+1] tables) broadcast with an in-chunk iota —
    the earlier per-slot formulation (searchsorted + int gathers over
    K*chunk elements) measured ~2 ms/step on the v5e (tools/sweep_probe.py
    stage2, 2026-08-19); this one leaves only two [K*chunk] int gathers
    (order/sids at the source positions).

    Returns (g, poffs, meta, first): g [K*chunk] source-row index (N = zero
    row), poffs [K, 8, chunk] in-window offsets (-1 pad), meta [K] window of
    each chunk, first [K] first-chunk-of-window flags.
    """
    (N,) = ids.shape
    nwin = V // window
    K = plan_slots(N, nwin, chunk)

    # one sort yields BOTH sorted ids and the permutation — `argsort` then
    # `ids[order]` would add a [N] element gather, and TPU int32 element
    # gathers are serialized (~20 ns/el: the old per-slot formulation's
    # order[srcc]/sids[srcc] gathers measured ~1.7 ms/step even batched)
    iota = jnp.arange(N, dtype=jnp.int32)
    sids, order = lax.sort_key_val(ids, iota)
    # window spans of the sorted stream; ids >= V (drop sentinel) fall
    # beyond the last edge and are never covered by any slot
    edges = jnp.searchsorted(
        sids, (jnp.arange(nwin + 1, dtype=jnp.int32) * window)
        .astype(ids.dtype)).astype(jnp.int32)                 # [nwin+1]
    spans = edges[1:] - edges[:-1]
    cpw = -(-spans // chunk)                                  # chunks/window
    pad_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cpw) * chunk])  # [nwin+1]

    cstart = jnp.arange(K, dtype=jnp.int32) * chunk           # [K]
    meta = jnp.clip(
        jnp.searchsorted(pad_start, cstart, side="right").astype(jnp.int32)
        - 1, 0, nwin - 1)
    src0 = jnp.clip(edges[meta] + (cstart - pad_start[meta]), 0, N)  # [K]
    lim = edges[meta + 1]                                     # [K]
    live = cstart < pad_start[nwin]                           # [K]

    # per-slot arrays as K CONTIGUOUS chunk-length slices of the sorted
    # stream (vmapped dynamic_slice = slice-granular DMA), never as
    # [K*chunk] element gathers
    src = src0[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None, :]
    valid = live[:, None] & (src < lim[:, None])              # [K, chunk]
    pad_tail = jnp.full((chunk,), N, jnp.int32)
    order_p = jnp.concatenate([order, pad_tail])
    sids_p = jnp.concatenate([sids, pad_tail])

    def slice_at(arr):
        return jax.vmap(
            lambda s0: lax.dynamic_slice(arr, (s0,), (chunk,)))(src0)

    g = jnp.where(valid, slice_at(order_p), N).reshape(-1)    # N -> zero row
    poffs = jnp.where(valid, slice_at(sids_p) - (meta * window)[:, None],
                      jnp.int32(-1))
    poffs = jnp.broadcast_to(poffs.reshape(K, 1, chunk), (K, 8, chunk))
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (meta[1:] != meta[:-1]).astype(jnp.int32)])
    return g, poffs, meta, first


def scatter_add_sweep_planned(table, plan, rows, window: int = 512,
                              chunk: int = 128,
                              interpret: bool | None = None):
    """Apply a sweep_plan: gather the gradient rows into their planned slots
    (the only per-step 2-D cost) and run the swept placement kernel."""
    g, poffs, meta, first = plan
    N, C = rows.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    prows = jnp.concatenate(
        [rows.astype(table.dtype),
         jnp.zeros((1, C), table.dtype)])[g]                  # [K*chunk, C]
    return _sweep_call(table, prows, poffs, meta, first,
                       window, chunk, interpret)


def scatter_add_sweep(table, ids, rows, window: int = 512, chunk: int = 128,
                      interpret: bool | None = None):
    """table.at[ids].add(rows) via the swept MXU placement kernel.

    table [V, C] with V % window == 0 and C % 128 == 0 (pad at allocation;
    train.py's rmw-storage padding machinery covers both); ids [N] int32 —
    in [0, V) or the 0x7FFFFFF0 drop sentinel; rows [N, C].
    Plain traceable function: call inside your (donated) training jit.
    When the ids are known before the loop, use sweep_plan +
    scatter_add_sweep_planned to hoist the sort/slot work out of the step.
    """
    N, C = rows.shape
    V = table.shape[0]
    if V % window:
        raise ValueError(
            f"scatter_add_sweep requires table rows % window == 0 "
            f"(got {V} % {window}); pad the table at allocation")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret and C % 128:
        raise ValueError(
            f"scatter_add_sweep requires row width % 128 == 0 on TPU "
            f"(got {C}); pad the table columns at allocation")
    plan = sweep_plan(ids, V, window=window, chunk=chunk)
    return scatter_add_sweep_planned(table, plan, rows, window=window,
                                     chunk=chunk, interpret=interpret)
