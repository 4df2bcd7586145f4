"""Spanning sweep scatter-add: sorted rows streamed straight into table
windows — the plan-free successor to kernels/sweep_scatter.py.

The training step's parameter update is `table.at[ids].add(rows)` (the
TPU-native form of the reference's racy RMW loop, reference
src/word2bits.cpp:489-503).  XLA:TPU serializes that at ~44-50 ns per
emitted row (~550 us of a ~970 us bench step).  sweep_scatter removed the
per-row loop by padding the sorted stream into window-aligned slot chunks,
but building the slot plan costs more than it saves: the per-slot int
gathers measured ~2 ms/step in-step and ~230 us/step even batch-hoisted
(tools/sweep_probe.py, v5e, 2026-08-19/20) because TPU int32 element
gathers serialize.

This kernel needs NO slot plan.  The sorted rows are streamed in plain
[chunk, C] grid blocks (no padding, no inverse map), and the kernel walks
the windows each chunk spans:

  * a [2, window, C] VMEM accumulator holds the OPEN window; consecutive
    chunks hitting the same window accumulate in VMEM with no DMA at all;
  * on a window change the old accumulator is written back (async, double
    buffered on the second slot) and the new window is DMA-read;
  * placement inside a window is one MXU matmul per visit: a
    [window, chunk] one-hot mask built from the sorted ids themselves
    (iota == sid - w*window; rows of other windows / pad / drop sentinels
    never match), times the [chunk, C] row block, accumulated in f32;
  * empty windows inside a chunk's [wfirst, wlast] span are skipped via an
    SMEM edges table (critical for huge-vocab sparse tails).

The only XLA-side work is ONE sort_key_val plus per-chunk scalars — a pure
function of the ids, so when the ids of an S-step scan chunk are known at
chunk entry (slab ids from the precomputed epoch; negatives pre-drawn with
the same per-step keys) the whole pre-pass batch-hoists out of the loop,
leaving a ~40 us [N]-row permutation gather as the only per-step XLA cost.

Equal to `table.at[ids].add(rows)` modulo float summation order (per-visit
f32 sums + one table-dtype add per window visit — strictly fewer roundings
than the baseline's per-row table-dtype adds).  ids >= V (the 0x7FFFFFF0
drop sentinel) sort to the end, match no window, and are dropped like
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


class SpanPlan(NamedTuple):
    """Pure function of (ids, V, window, chunk) — hoistable/vmappable.
    sids is stored COMPACT [nb*chunk]; the kernel's 8-sublane-replicated
    block view is broadcast at apply time (a hoisted plan would otherwise
    hold 8x the ids — ~0.4 GB at the exact-semantics 200k-row shape)."""
    order: jnp.ndarray    # [nb*chunk] int32 source row index; N = zero row
    sids: jnp.ndarray     # [nb*chunk] int32 sorted ids (sentinel pad)
    wfirst: jnp.ndarray   # [nb] int32 first window of chunk
    wlast: jnp.ndarray    # [nb] int32 last window of chunk (-1: all pad)
    edges: jnp.ndarray    # [nwin+1] int32 window boundaries in sorted stream


def _span_kernel(window: int, chunk: int, nwin: int, nb: int,
                 wfirst_ref, wlast_ref, edges_ref,
                 sids_ref, rows_ref, table_ref, out_ref,
                 acc_ref, st_ref, rsem, wsem):
    """One grid step: place one [chunk, C] sorted row block into the table
    windows it spans.

    wfirst/wlast/edges: SMEM scalar prefetch (per-chunk window span; window
    boundary indices for the empty-window skip).
    sids_ref: VMEM [1, 8, chunk] sorted ids (sublane-replicated) — the
    one-hot mask source; drop/pad sentinels match no window.
    table_ref/out_ref: the SAME aliased HBM buffer viewed [nwin, window, C];
    all access goes through out_ref.
    acc_ref: VMEM [2, window, C] open-window accumulators (double buffer).
    st_ref: SMEM [6] persistent state — [0] live slot, [1] open window
    (-1 none), [2+s] pending-write flag of slot s, [4+s] its target window.
    """
    del table_ref  # aliased: all access goes through out_ref
    k = pl.program_id(0)
    dt = out_ref.dtype

    @pl.when(k == 0)
    def _():
        st_ref[0] = 0
        st_ref[1] = -1
        st_ref[2] = 0
        st_ref[3] = 0
        st_ref[4] = 0
        st_ref[5] = 0
        st_ref[6] = 0
        st_ref[7] = 0

    sids = sids_ref[0, 0, :]                                  # [chunk]
    iota = lax.broadcasted_iota(jnp.int32, (window, chunk), 0)
    rows = rows_ref[:]

    def visit(w, carry):
        @pl.when(edges_ref[w + 1] > edges_ref[w])
        def _():
            slot = st_ref[0]
            open_w = st_ref[1]

            @pl.when(w != open_w)
            def _():
                # close the open window: async write-back on its slot
                @pl.when(open_w >= 0)
                def _():
                    pltpu.make_async_copy(
                        acc_ref.at[slot], out_ref.at[open_w], wsem.at[slot]
                    ).start()
                    st_ref[2 + slot] = 1
                    st_ref[4 + slot] = open_w
                ns = 1 - slot
                # drain the other slot's write before reusing it
                @pl.when(st_ref[2 + ns] == 1)
                def _():
                    pltpu.make_async_copy(
                        acc_ref.at[ns], out_ref.at[st_ref[4 + ns]],
                        wsem.at[ns]
                    ).wait()
                    st_ref[2 + ns] = 0
                # windows strictly increase across the sorted stream, so w
                # has never been written by this kernel: safe to read now;
                # the wait is deferred until after the placement matmul so
                # the read rides under the MXU work (st[6+s]: read pending)
                pltpu.make_async_copy(
                    out_ref.at[w], acc_ref.at[ns], rsem.at[ns]).start()
                st_ref[6 + ns] = 1
                st_ref[0] = ns
                st_ref[1] = w

            cur = st_ref[0]
            mask = (iota == (sids - w * window)[None, :]).astype(dt)
            placed = jnp.dot(mask, rows,
                             preferred_element_type=jnp.float32)

            @pl.when(st_ref[6 + cur] == 1)
            def _():
                pltpu.make_async_copy(
                    out_ref.at[st_ref[1]], acc_ref.at[cur], rsem.at[cur]
                ).wait()
                st_ref[6 + cur] = 0

            acc_ref[cur] = (acc_ref[cur].astype(jnp.float32)
                            + placed).astype(dt)
        return carry

    lax.fori_loop(wfirst_ref[k], wlast_ref[k] + 1, visit, 0)

    @pl.when(k == nb - 1)
    def _():
        # final close + drain: every write must land before pallas returns
        slot = st_ref[0]
        open_w = st_ref[1]

        @pl.when(open_w >= 0)
        def _():
            pltpu.make_async_copy(
                acc_ref.at[slot], out_ref.at[open_w], wsem.at[slot]).start()
            st_ref[2 + slot] = 1
            st_ref[4 + slot] = open_w
        for s in range(2):
            @pl.when(st_ref[2 + s] == 1)
            def _():
                pltpu.make_async_copy(
                    acc_ref.at[s], out_ref.at[st_ref[4 + s]], wsem.at[s]
                ).wait()
                st_ref[2 + s] = 0


@functools.partial(jax.jit, static_argnums=(6, 7, 8), donate_argnums=(0,))
def _span_call(table, prows, sids, wfirst, wlast, edges,
               window: int, chunk: int, interpret: bool):
    V, C = table.shape
    nwin = V // window
    nb = sids.shape[0]
    kernel = functools.partial(_span_kernel, window, chunk, nwin, nb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,            # wfirst, wlast, edges
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, chunk), lambda k, wf, wl, e: (k, 0, 0)),
            pl.BlockSpec((chunk, C), lambda k, wf, wl, e: (k, 0)),
            pl.BlockSpec(memory_space=pl.ANY),     # table stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, window, C), table.dtype),
            pltpu.SMEM((6,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    t3 = table.reshape(nwin, window, C)   # layout-preserving bitcast
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(t3.shape, t3.dtype),
        input_output_aliases={5: 0},  # (wf, wl, e, sids, prows, table)->out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(wfirst, wlast, edges, sids, prows, t3)
    return out.reshape(V, C)


# plain Python int, not a module-level jnp array: a jnp constant traced
# inside shard_map gets the first mesh's aval stamped on it and then
# poisons traces under any OTHER mesh ("context mesh should match the aval
# mesh") — the mesh-span equality tests sweep several mesh shapes
_SENTINEL = 0x7FFFFFF0


def span_plan(ids, V: int, window: int = 512, chunk: int = 128) -> SpanPlan:
    """Build the spanning-sweep placement plan — a pure function of the ids
    (vmappable over an S-step chunk; one batched sort + vector ops, no
    element gathers beyond [nb] scalars)."""
    (N,) = ids.shape
    nwin = V // window
    nb = -(-N // chunk)
    npad = nb * chunk - N

    iota = jnp.arange(N, dtype=jnp.int32)
    sids, order = lax.sort_key_val(ids, iota)
    edges = jnp.searchsorted(
        sids, (jnp.arange(nwin + 1, dtype=jnp.int32) * window)
        .astype(ids.dtype)).astype(jnp.int32)                 # [nwin+1]
    nvalid = edges[nwin]          # ids >= V sort to the end

    if npad:
        sids = jnp.concatenate(
            [sids, jnp.full((npad,), _SENTINEL, jnp.int32)])
        order = jnp.concatenate([order, jnp.full((npad,), N, jnp.int32)])

    cstart = jnp.arange(nb, dtype=jnp.int32) * chunk
    live = cstart < nvalid
    last_valid = jnp.minimum(nvalid - 1, cstart + (chunk - 1))
    wfirst = jnp.where(live, sids[cstart] // window, 0)
    wlast = jnp.where(live,
                      sids[jnp.clip(last_valid, 0, None)] // window,
                      jnp.int32(-1))
    return SpanPlan(order=order, sids=sids, wfirst=wfirst,
                    wlast=wlast, edges=edges)


def scatter_add_span_planned(table, plan: SpanPlan, rows,
                             window: int = 512, chunk: int = 128,
                             interpret: bool | None = None):
    """Apply a span_plan: permute the gradient rows into sorted order (the
    only per-step 2-D cost, ~40 us at the bench shape) and run the kernel."""
    N, C = rows.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    prows = jnp.concatenate(
        [rows.astype(table.dtype),
         jnp.zeros((1, C), table.dtype)])[plan.order]      # [nb*chunk, C]
    nb = plan.sids.shape[0] // chunk
    sids_blk = jnp.broadcast_to(
        plan.sids.reshape(nb, 1, chunk), (nb, 8, chunk))
    return _span_call(table, prows, sids_blk, plan.wfirst, plan.wlast,
                      plan.edges, window, chunk, interpret)


def scatter_add_span_rank1(table, plan: SpanPlan, dense_rows, g, cavg,
                           per_src: int, window: int = 512,
                           chunk: int = 128,
                           interpret: bool | None = None):
    """Span scatter whose trailing rows are RANK-1: row nd+j is
    g[j] * cavg[j // per_src] (the per-center CBOW negative update with
    reg == 0, reference src/word2bits.cpp:486-491).  The [N_neg, D]
    gradient block is never materialized in XLA — the permuted row stream
    is built directly from the [N_neg] coefficients and the [B, C] context
    averages (VERDICT r4 item 2 / ROADMAP 4b).

    MEASURED NEGATIVE (v5e, 2026-08-20, same-session A/B at the exact-mode
    shape B=4096/K=24/D=200, tools/step_bench.py): rank-1 4704 us/step vs
    the materialized dv path's 3428 us — XLA already fuses the rank-1
    broadcast-multiply into the permute gather, and this formulation's
    where-select + three gathers ADD passes instead of removing one.  Kept
    as an off-by-default code path (span_rank1=False) with its equality
    tests, per the documented-negative convention (cf.
    kernels/sweep_scatter.py); the exact mode's residual cost is the
    scoring-side [B, K, D] work, not dv formation.

    dense_rows [nd, C]: materialized leading rows (e.g. the B center-v
    updates); g [nn]: per-negative coefficients; cavg [B, C] with
    per_src = negatives per center (nn == B * per_src).  plan must be the
    span_plan of the concatenated ids [dense_ids; neg_ids]."""
    nd, C = dense_rows.shape
    (nn,) = g.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    o = plan.order                                        # [nb*chunk]
    is_dense = o < nd
    # order == nd+nn is the pad sentinel (zero row): route it through the
    # rank-1 branch with g extended by a trailing zero coefficient
    g_ext = jnp.concatenate([g.astype(jnp.float32),
                             jnp.zeros((1,), jnp.float32)])
    on = jnp.clip(o - nd, 0, nn)
    src = jnp.minimum(on // per_src, cavg.shape[0] - 1)
    neg_rows = g_ext[on][:, None] * cavg[src].astype(jnp.float32)
    od = jnp.where(is_dense, o, 0)
    prows = jnp.where(is_dense[:, None],
                      dense_rows[od].astype(jnp.float32),
                      neg_rows).astype(table.dtype)       # [nb*chunk, C]
    nb = plan.sids.shape[0] // chunk
    sids_blk = jnp.broadcast_to(
        plan.sids.reshape(nb, 1, chunk), (nb, 8, chunk))
    return _span_call(table, prows, sids_blk, plan.wfirst, plan.wlast,
                      plan.edges, window, chunk, interpret)


def scatter_add_span(table, ids, rows, window: int = 512, chunk: int = 128,
                     interpret: bool | None = None):
    """table.at[ids].add(rows) via the spanning sweep kernel.

    table [V, C] with V % window == 0 and C % 128 == 0 (pad at allocation;
    train.py's rmw-storage padding machinery covers both); ids [N] int32 in
    [0, V) or the 0x7FFFFFF0 drop sentinel; rows [N, C].  Plain traceable
    function; for S-step loops with ids known at chunk entry, hoist
    span_plan (vmapped) and call scatter_add_span_planned in the step.
    """
    N, C = rows.shape
    V = table.shape[0]
    if V % window:
        raise ValueError(
            f"scatter_add_span requires table rows % window == 0 "
            f"(got {V} % {window}); pad the table at allocation")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret and C % 128:
        raise ValueError(
            f"scatter_add_span requires row width % 128 == 0 on TPU "
            f"(got {C}); pad the table columns at allocation")
    plan = span_plan(ids, V, window=window, chunk=chunk)
    return scatter_add_span_planned(table, plan, rows, window=window,
                                    chunk=chunk, interpret=interpret)
