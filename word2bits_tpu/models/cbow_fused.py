"""Interleaved-table CBOW step: u and v fused into one (V, 2D) array.

The slab step's per-step scatter rows are its cost floor (~50 ns/row under
XLA's serialized scatter; see ARCHITECTURE.md ablation).  Observation: the
v-table rows updated for *centers* carry exactly the same word ids as the
u-table rows updated by position — only the table differs.  Storing
table[:, :D] = u and table[:, D:] = v makes them ONE scatter of B+2W
double-width rows, and the center v-rows ride the slab gather for free:

  per-step scatter rows:  (B+2W) + B + T*K  ->  (B+2W) + T*K   (-28% at W=8)
  per-step gather calls:  slab + centers + negs -> slab + negs

Negative rows waste the u-half of their width (zeros scattered, u-half
gathered unused) — bandwidth is ~1 ns/row against the ~50 ns/row overhead,
so the trade wins.  Semantics identical to models/cbow_slab.py (tested
equal); storage converts via interleave()/deinterleave() views.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.models.cbow_slab import (
    SlabInputs,
    _context_masks,
    from_tiles,
    pool_mask,
    to_tiles,
)
from word2bits_tpu.ops.quantize import quantize
from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut


def interleave(u, v):
    """(V,D),(V,D) -> (V,2D) fused table."""
    return jnp.concatenate([u, v], axis=1)


def deinterleave(table):
    D = table.shape[1] // 2
    return table[:, :D], table[:, D:]


def fused_slab_step(table, inputs: SlabInputs, alpha, hyper: CBOWHyper,
                    batch_size: int, neg_sharing: int,
                    use_pallas: bool = False, dedup_block: int = 0,
                    neg_pool: int = 1, hot_rows: int = 0, cold_pos=None,
                    strat_lanes=None, dense_hot=None,
                    hot_pallas: bool = False, banded: int = 0,
                    rmw_scatter: bool = False, col_pad: int = 0,
                    scatter_impl: str = "add", span_plan=None,
                    span_window: int = 512, span_chunk: int = 128,
                    context_pallas: bool = False):
    """One synchronous step on the fused (V, 2D) table. Shared negatives
    required (the fused layout exists for the optimized path).
    use_pallas routes the negative score/gradient phase through the fused
    Pallas kernel (kernels/score_pallas.py); same math, tested equal.
    strat_lanes = (kh, w_hot, w_cold) marks inputs.neg_ids as stratified
    draws (sampling/unigram.draw_negatives_stratified): per pool of K lanes
    the first kh are hot (id < hot_rows); the importance weights fold into
    the negative mask, and with hot_rows > 0 the hot lanes join the dense
    accumulation while only the K-kh cold lanes scatter.
    Returns (table, loss)."""
    if not neg_sharing:
        raise ValueError("fused table step requires neg_sharing > 0")
    if dense_hot is not None and not hot_rows:
        raise ValueError("dense_hot requires hot_rows (the hot-stratum "
                         "boundary of the negative distribution)")
    B, W, K = batch_size, hyper.window, hyper.negative
    # col_pad: trailing zero columns padding the storage row to the TPU's
    # 128-lane tile (required by the Pallas RMW scatter's HBM DMA slices);
    # the model's logical width stays 2D — gathers slice the pad off and
    # scatter rows are re-padded with zeros, so padded lanes remain zero
    D = (table.shape[1] - col_pad) // 2
    bl, reg = hyper.bitlevel, hyper.reg
    dt = jnp.float32
    G = neg_sharing
    if B % G:
        raise ValueError(f"batch {B} not divisible by neg tile {G}")
    T = B // G

    slab_ids = jnp.maximum(inputs.slab_tokens, 0)          # [B+2W]
    centers = slab_ids[W:W + B]

    # ONE gather: u rows for all positions + v rows for the centers
    slab_raw = table[slab_ids]                             # [B+2W, 2D] dtype
    two_ar = 2.0 * alpha * reg
    if context_pallas:
        # fused context+positive forward kernel (kernels/context_pallas.py):
        # quantize -> banded context sums -> center scores -> positive
        # grads in one VMEM pass; the f32 q_slab/u_slab never materialize.
        # reg == 0 only (the squared-norm/decay terms consume them).
        if not banded:
            raise ValueError("context_pallas requires -banded-tile (the "
                             "kernel consumes the banded masks)")
        if reg:
            raise ValueError("context_pallas supports reg == 0 only (the "
                             "XLA path keeps the reg terms)")
        from word2bits_tpu.kernels.context_pallas import fused_context_pallas
        from word2bits_tpu.ops.windowed import (_tile_windows,
                                                build_banded_masks,
                                                pick_tile)
        btile = pick_tile(B, W, banded)
        Nt = B // btile
        Mb, win_idx, valid = build_banded_masks(
            inputs.slab_sents, inputs.shrink, B, W, btile)
        uwin3 = _tile_windows(slab_raw[:, :D], Nt, btile, W)
        scal = jnp.reshape(jnp.asarray(alpha, jnp.float32), (1, 1))
        interp = jax.default_backend() not in ("tpu", "axon")
        cavg, cavge, dv_center, af, loss = fused_context_pallas(
            uwin3, slab_raw[W:W + B, D:2 * D], Mb,
            valid.astype(jnp.float32)[:, None], scal, bl, interp)
        u_slab = None   # unused at reg == 0 (no decay term)
    else:
        slab_rows = slab_raw.astype(dt)                    # [B+2W, 2D]
        u_slab = slab_rows[:, :D]
        v_c = slab_rows[W:W + B, D:2 * D]                  # centers' v rows
        q_slab = quantize(u_slab, bl)

        # reg == 0 (a Python float, static at trace time): the squared-norm
        # loss terms are identically zero — skip computing them rather than
        # trusting XLA to fold 0*x (it does not; the round-5 floor ablation
        # showed the q_sq/||q_vn||^2 passes and the [B+2W, D+1] augmented
        # concat as real scatter-free-floor weight)
        q_sq = jnp.sum(q_slab * q_slab, axis=-1) if reg else None
        if banded:
            from word2bits_tpu.ops.windowed import (banded_context,
                                                    build_banded_masks,
                                                    pick_tile)
            btile = pick_tile(B, W, banded)
            Mb, win_idx, valid = build_banded_masks(
                inputs.slab_sents, inputs.shrink, B, W, btile)
            csum, sq_sum, cw = banded_context(q_slab, q_sq, Mb, win_idx, B)
        else:
            offsets, mask, valid = _context_masks(inputs, B, W)
            mf = mask.astype(dt)
            csum = jnp.zeros((B, D), dt)
            sq_sum = jnp.zeros((B,), dt) if reg else None
            for oi, o in enumerate(offsets):
                csum = csum + mf[:, oi, None] * q_slab[W + o:W + o + B]
                if reg:
                    sq_sum = sq_sum + mf[:, oi] * q_sq[W + o:W + o + B]
            cw = jnp.sum(mf, axis=1)
        active = valid & (cw > 0)
        af = active.astype(dt)
        cavg = csum / jnp.maximum(cw, 1.0)[:, None]
        loss = (-reg * jnp.sum(sq_sum * af)) if reg else jnp.float32(0.0)

        # positive term
        q_vc = quantize(v_c, bl)
        f_pos = jnp.sum(cavg * q_vc, axis=-1)
        g_pos = (1.0 - sigmoid_lut(f_pos)) * alpha * af
        pos_reg = (reg * jnp.sum(q_vc * q_vc, axis=-1)) if reg else 0.0
        loss = loss + jnp.sum((jnp.log(sigmoid_exact(f_pos)) - pos_reg) * af)
        cavge = g_pos[:, None] * q_vc
        dv_center = g_pos[:, None] * cavg
        if reg:
            dv_center = dv_center - two_ar * v_c * af[:, None]

    # shared negatives (strided tiles), v-half gathered from the fused table
    P = neg_pool if neg_pool and neg_pool > 1 else 1
    negs = inputs.neg_ids              # [T, P*Kl]; Kl = lanes per pool
    Kl = negs.shape[1] // P            # == K, or kc under dense_hot
    v_n = table[negs][..., D:2 * D].astype(dt)             # [T, P*Kl, D]
    cavg3 = to_tiles(cavg, T, G)
    af3 = to_tiles(af, T, G)
    centers3 = to_tiles(centers, T, G)
    if use_pallas:
        from word2bits_tpu.kernels.score_pallas import quantized_scores_pallas
        scalars = jnp.reshape(jnp.asarray(alpha, dt), (1, 1))
        interp = jax.default_backend() not in ("tpu", "axon")
        cavge_neg, dv_neg, nloss = quantized_scores_pallas(
            cavg3, v_n, centers3, negs, af3, scalars, bl, float(reg), P,
            interp)
        loss = loss + nloss
        cavge = cavge + from_tiles(cavge_neg, B)
    else:
        q_vn = quantize(v_n, bl)
        f_neg = lax.dot_general(cavg3, q_vn, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        skip = negs[:, None, :] != centers3[:, :, None]
        m3 = skip.astype(dt) * af3[:, :, None]
        if P > 1:
            m3 = m3 * pool_mask(G, Kl, P, dt)[None]
        if strat_lanes is not None:
            kh, w_hot, w_cold = strat_lanes
            lane_w = jnp.tile(jnp.where(jnp.arange(Kl) < kh,
                                        jnp.float32(w_hot),
                                        jnp.float32(w_cold)), P)
            m3 = m3 * lane_w[None, None, :]
        if dense_hot is not None:
            m3 = m3 * jnp.float32(dense_hot[0])  # cold importance weight
        g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m3
        neg_reg = (reg * jnp.sum(q_vn * q_vn, axis=-1)[:, None, :]
                   if reg else 0.0)
        loss = loss + jnp.sum(
            (jnp.log(sigmoid_exact(-f_neg)) - neg_reg) * m3)
        cavge = cavge + from_tiles(lax.dot_general(
            g_neg, q_vn, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32), B)
        dv_neg = lax.dot_general(g_neg, cavg3, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        if reg:
            visits = jnp.sum(m3, axis=1)
            dv_neg = dv_neg - two_ar * v_n * visits[:, :, None]

    dv_hot = None
    if dense_hot is not None:
        # Dense hot negatives (extension; Rao-Blackwellized NEG): the hot
        # stratum's K*p_hot expected draws are replaced by their exact
        # expectation — every center scores against ALL hot_rows frequent
        # words with per-word weight hot_w[h] = K * P(draw h), three
        # [B,H]-shaped MXU contractions.  Same expected gradient/loss as
        # sampling (the per-draw update is linear in the draw indicator);
        # zero sampling variance for ~90+% of the negative mass, and
        # per-center exact where pooled sampling shares draws.  The skip-
        # center quirk (reference src/word2bits.cpp:458) becomes an exact
        # (b, h==center) mask.  Cold draws (inputs.neg_ids) stay sampled
        # with importance weight dense_hot[0].
        H = hot_rows
        hot_w = jnp.asarray(dense_hot[1], dt)              # [H] K*p_norm
        v_h = table[:H, D:].astype(dt)                     # slice, no gather
        q_vh = quantize(v_h, bl)
        f_h = lax.dot_general(cavg, q_vh, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [B, H]
        skip_h = jnp.arange(H, dtype=jnp.int32)[None, :] != centers[:, None]
        mh = skip_h.astype(dt) * af[:, None] * hot_w[None, :]
        g_h = (0.0 - sigmoid_lut(f_h)) * alpha * mh
        hot_reg = (reg * jnp.sum(q_vh * q_vh, axis=-1)[None, :]
                   if reg else 0.0)
        loss = loss + jnp.sum(
            (jnp.log(sigmoid_exact(-f_h)) - hot_reg) * mh)
        cavge = cavge + lax.dot_general(
            g_h, q_vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [B, D]
        dv_hot = lax.dot_general(g_h, cavg, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [H, D]
        if reg:
            dv_hot = dv_hot - two_ar * v_h * jnp.sum(mh, axis=0)[:, None]

    # u updates grouped by position (windowed sums)
    if banded:
        from word2bits_tpu.ops.windowed import banded_usum
        M_af = Mb * af.reshape(Mb.shape[0], Mb.shape[1])[:, :, None]
        du_slab, cnt = banded_usum(M_af, cavge, B, W)
    else:
        mc = mf * af[:, None]
        shifted = jnp.stack(
            [jnp.pad(mc[:, oi, None] * cavge, ((W + o, W - o), (0, 0)))
             for oi, o in enumerate(offsets)])
        du_slab = jnp.sum(shifted, axis=0)
        cnt = jnp.sum(jnp.stack(
            [jnp.pad(mc[:, oi], (W + o, W - o))
             for oi, o in enumerate(offsets)]), axis=0)
    if reg:
        du_slab = du_slab - two_ar * u_slab * cnt[:, None]

    # ONE fused scatter for u-positions + center v-rows ...
    dv_slab = jnp.zeros((B + 2 * W, D), dt)
    dv_slab = lax.dynamic_update_slice(dv_slab, dv_center, (W, 0))
    fused_rows = jnp.concatenate([du_slab, dv_slab], axis=1)  # [B+2W, 2D]
    if rmw_scatter:
        # in-place Pallas group-RMW: the capacity path — XLA's scatter
        # always copy-inserts a second table on this backend (kernel
        # docstring / docs/large_vocab.md), this one keeps peak at 1x table
        from word2bits_tpu.kernels.scatter_pallas import scatter_add_rmw

        def scat(tab, ids, rows):
            if col_pad:
                rows = jnp.pad(rows, ((0, 0), (0, col_pad)))
            return scatter_add_rmw(tab, ids, rows.astype(tab.dtype))
    elif dedup_block:
        from word2bits_tpu.ops.scatter import scatter_add_dedup

        def scat(tab, ids, rows):
            return scatter_add_dedup(tab, ids, rows.astype(tab.dtype),
                                     dedup_block)
    elif scatter_impl == "sortuniq":
        # sort ids (1D argsort is cheap), permute rows by one vectorized
        # gather, scatter with indices_are_sorted — update-equal modulo
        # float summation order (duplicates still emitted; measures whether
        # XLA's sorted path beats the unsorted serialized loop IN-STEP)
        def scat(tab, ids, rows):
            order = jnp.argsort(ids)
            return tab.at[ids[order]].add(rows[order].astype(tab.dtype),
                                          indices_are_sorted=True)
    elif scatter_impl == "uniq_probe":
        # ABLATION ONLY — NOT update-equal: claims unique_indices on ids
        # that do contain duplicates (wrong sums), to measure whether XLA's
        # unique-indices scatter path runs vectorized in-step
        def scat(tab, ids, rows):
            return tab.at[ids].add(rows.astype(tab.dtype),
                                   unique_indices=True)
    elif scatter_impl == "uniqsort_probe":
        # ABLATION ONLY — NOT update-equal: sorted + claimed-unique
        def scat(tab, ids, rows):
            order = jnp.argsort(ids)
            return tab.at[ids[order]].add(rows[order].astype(tab.dtype),
                                          unique_indices=True,
                                          indices_are_sorted=True)
    elif scatter_impl == "dense_probe":
        # ABLATION ONLY — NOT update-equal: replaces the scatter with a
        # dense slice RMW of identical row count/traffic, isolating XLA's
        # per-row serialization cost from the HBM traffic (profiling tool;
        # never reachable from config)
        def scat(tab, ids, rows):
            n = rows.shape[0]
            head = (tab[:n].astype(jnp.float32)
                    + rows.astype(jnp.float32)
                    + 0.0 * ids[:1].astype(jnp.float32))
            return lax.dynamic_update_slice(tab, head.astype(tab.dtype),
                                            (0, 0))
    elif scatter_impl in ("sweep", "span", "grmw"):
        # swept MXU placement (kernels/sweep_scatter.py / span_scatter.py /
        # group_rmw.py): slab + negative rows combine into ONE sorted call
        # below — `scat` must not be reached (the combined call replaces
        # both call sites)
        def scat(tab, ids, rows):
            raise AssertionError("sweep/span/grmw handle the update in one "
                                 "combined call; scat() must not be reached")
    else:
        if scatter_impl != "add":
            raise ValueError(f"unknown scatter_impl {scatter_impl!r}")

        def scat(tab, ids, rows):
            return tab.at[ids].add(rows.astype(tab.dtype))
    if hot_rows:
        # hot/cold split: frequent rows (id < hot_rows — the vocab is
        # count-sorted) accumulate via a one-hot MXU matmul + dense slice
        # update; the cold remainder scatters COMPACTED to its true count
        # using epoch-precomputed positions (data/pipeline.cold_positions) —
        # XLA's scatter loop pays per emitted row, masked or not, so the
        # saving requires real compaction, not masking.
        from word2bits_tpu.ops.scatter import hot_slice_add
        hot_ids, hot_mat = slab_ids, fused_rows
        if strat_lanes is not None:
            # stratified negatives: hot lanes (a static per-pool prefix) are
            # guaranteed id < hot_rows — ride the same dense accumulation
            kh = strat_lanes[0]
            negs4 = negs.reshape(T, P, Kl)
            dv4 = dv_neg.reshape(T, P, Kl, D)
            nh = dv4[:, :, :kh].reshape(-1, D)
            hot_ids = jnp.concatenate([slab_ids, negs4[:, :, :kh].reshape(-1)])
            hot_mat = jnp.concatenate(
                [fused_rows,
                 jnp.concatenate([jnp.zeros_like(nh), nh], axis=1)], axis=0)
        extra = None
        if dv_hot is not None:
            # dense-hot v-deltas ride the same head read-modify-write
            extra = jnp.concatenate(
                [jnp.zeros_like(dv_hot), dv_hot], axis=1)   # [H, 2D]
        if cold_pos is None:
            # no cold-position map (e.g. -device-epoch): keep the plain
            # slab scatter, apply only the dense-hot head delta
            if strat_lanes is not None:
                raise ValueError("strat_lanes requires cold_pos (it exists "
                                 "only for the hot/cold scatter split)")
            if extra is not None:
                head = (table[:hot_rows].astype(jnp.float32)
                        + extra).astype(table.dtype)
                table = lax.dynamic_update_slice(table, head, (0, 0))
            table = scat(table, slab_ids, fused_rows)
        else:
            if hot_pallas:
                # in-kernel one-hot tiles: no [N, H] operand in HBM
                from word2bits_tpu.kernels.hot_pallas import \
                    hot_slice_add_pallas
                interp = jax.default_backend() not in ("tpu", "axon")
                table = hot_slice_add_pallas(table, hot_ids, hot_mat,
                                             hot_rows, extra=extra,
                                             interpret=interp)
            else:
                table = hot_slice_add(table, hot_ids, hot_mat, hot_rows,
                                      extra=extra)
            ok = cold_pos >= 0
            posc = jnp.maximum(cold_pos, 0)
            ids_cold = jnp.where(ok, slab_ids[posc], jnp.int32(0x7FFFFFF0))
            table = table.at[ids_cold].add(
                fused_rows[posc].astype(table.dtype), mode="drop",
                unique_indices=False)
        if strat_lanes is not None:
            if Kl - kh:  # cold lanes: already compact by construction
                nc = dv4[:, :, kh:].reshape(-1, D)
                table = table.at[negs4[:, :, kh:].reshape(-1)].add(
                    jnp.concatenate([jnp.zeros_like(nc), nc],
                                    axis=1).astype(table.dtype))
            return table, loss
        if dense_hot is not None:
            # cold lanes are the whole sampled set (ids >= hot_rows)
            nc = dv_neg.reshape(-1, D)
            table = table.at[negs.reshape(-1)].add(
                jnp.concatenate([jnp.zeros_like(nc), nc],
                                axis=1).astype(table.dtype))
            return table, loss
    elif scatter_impl in ("sweep", "span", "grmw"):
        # ONE combined sorted sweep for slab + negative rows: a single
        # sort/placement pass over all ~(B+2W + T*P*K) update rows
        # (kernels/sweep_scatter.py / span_scatter.py / group_rmw.py) —
        # same sums as the two .at[].add calls modulo float summation
        # order.  For "span"/"grmw" with a hoisted plan
        # (make_fused_train_chunk pre-draws the negatives and batches the
        # plan over the whole scan chunk), the per-step cost is one
        # [N]-row permutation gather + the kernel.
        neg_rows = jnp.concatenate(
            [jnp.zeros(dv_neg.reshape(-1, D).shape, dt),
             dv_neg.reshape(-1, D)], axis=1)
        all_rows = jnp.concatenate([fused_rows, neg_rows])
        if col_pad:
            all_rows = jnp.pad(all_rows, ((0, 0), (0, col_pad)))
        if scatter_impl == "grmw":
            from word2bits_tpu.kernels.group_rmw import (
                scatter_add_grmw, scatter_add_grmw_planned)
            if span_plan is not None:
                table = scatter_add_grmw_planned(table, span_plan, all_rows,
                                                 chunk=span_chunk)
            else:
                all_ids = jnp.concatenate([slab_ids, negs.reshape(-1)])
                table = scatter_add_grmw(table, all_ids,
                                         all_rows.astype(table.dtype),
                                         chunk=span_chunk)
        elif scatter_impl == "span":
            from word2bits_tpu.kernels.span_scatter import (
                scatter_add_span, scatter_add_span_planned)
            if span_plan is not None:
                table = scatter_add_span_planned(
                    table, span_plan, all_rows,
                    window=span_window, chunk=span_chunk)
            else:
                all_ids = jnp.concatenate([slab_ids, negs.reshape(-1)])
                table = scatter_add_span(table, all_ids,
                                         all_rows.astype(table.dtype),
                                         window=span_window, chunk=span_chunk)
        else:
            from word2bits_tpu.kernels.sweep_scatter import scatter_add_sweep
            all_ids = jnp.concatenate([slab_ids, negs.reshape(-1)])
            table = scatter_add_sweep(table, all_ids,
                                      all_rows.astype(table.dtype))
        return table, loss
    else:
        table = scat(table, slab_ids, fused_rows)
    # ... plus the negative-row scatter (u-half zero)
    neg_rows = jnp.concatenate(
        [jnp.zeros(dv_neg.reshape(-1, D).shape, dt), dv_neg.reshape(-1, D)],
        axis=1)
    table = scat(table, negs.reshape(-1), neg_rows)
    return table, loss


def make_fused_train_chunk(hyper: CBOWHyper, vocab_size: int, batch_size: int,
                           steps: int, neg_sharing: int,
                           donate: bool = True, use_pallas: bool = False,
                           dedup_block: int = 0, neg_pool: int = 1,
                           hot_rows: int = 0, strat_lanes=None,
                           dense_hot=None, hot_pallas: bool = False,
                           banded: int = 0,
                           rmw_scatter: bool = False, col_pad: int = 0,
                           scatter_impl: str = "add",
                           span_window: int = 512, span_chunk: int = 128,
                           loop_mode: str = "scan",
                           context_pallas: bool = False):
    """chunk(table, tokens, sent_ids, alias_prob, alias_alias, scalars, key
    [, cold_pos]) -> (table, loss_sum); table is the fused (V, 2D) array.

    loop_mode selects how a steps>1 chunk iterates:
      * "scan"   — lax.scan (default).  XLA double-buffers the carried
        table (peak ~= 2x tables): fine up to ~2M x 800d bf16, OOM above.
      * "fori"   — lax.fori_loop.  XLA's while-loop keeps the carry IN
        PLACE (peak = 1x table + temps, verified by TPU memory_analysis at
        3.7M x 800d), so huge-vocab configs amortize per-dispatch latency
        over S steps instead of paying it every step like steps=1 — the
        round-5 capacity-throughput fix (28.2 ms -> ~4 ms/step at the
        flagship shape; tools/capacity_ablate.py).
      * "unroll" — a Python loop traced S times; same aliasing property,
        compile time grows with S.  Useful only as a cross-check.

    With hot_rows > 0, pass the trailing cold_pos argument — the int32
    [n_steps, C] per-step cold-row compaction map from
    data.pipeline.cold_positions (global step t = (base0 - W)//B + s
    indexes its rows) — to compact the u-side cold scatter.  Without it
    (cold_pos=None) the u-side runs the plain scatter and hot_rows only
    shapes the negative stratum (dense_hot / strat_lanes).

    With strat_lanes = (kh, w_hot, w_cold) (sampling/unigram.
    StratifiedSampler.lane_split), alias_prob/alias_alias must each be the
    (hot, cold) PAIR of arrays from build_stratified_tables.

    With dense_hot = (kc, w_cold, hot_w[H]) the hot negative stratum is
    computed exactly (see fused_slab_step) and alias_prob/alias_alias must
    be the COLD stratum's arrays; kc cold lanes are drawn per pool."""
    from word2bits_tpu.sampling.unigram import (AliasTable, _alias_draw,
                                                draw_negatives,
                                                draw_negatives_stratified)

    B, W, K = batch_size, hyper.window, hyper.negative
    P = neg_pool if (neg_pool and neg_pool > 1) else 1
    neg_rows = batch_size // neg_sharing
    hot_rows = min(int(hot_rows), vocab_size)
    if rmw_scatter and (use_pallas or dedup_block or hot_rows
                        or strat_lanes is not None or dense_hot is not None):
        raise ValueError(
            "rmw_scatter is the plain-scatter capacity path; it does not "
            "compose with use_pallas/dedup_block/hot_rows/strat_lanes/"
            "dense_hot (those restructure the scatter themselves)")
    swept = scatter_impl in ("sweep", "span", "grmw")
    if col_pad and not (rmw_scatter or swept):
        raise ValueError("col_pad only applies with rmw_scatter / "
                         "scatter_impl='sweep'/'span'/'grmw'")
    if (rmw_scatter or swept) and (2 * hyper.size + col_pad) % 128:
        raise ValueError(
            f"rmw_scatter/sweep/span/grmw store rows of width "
            f"2*size+col_pad = {2 * hyper.size + col_pad}; pad to a "
            f"multiple of 128 lanes "
            f"(col_pad={-(2 * hyper.size) % 128} for size={hyper.size})")
    if swept and (rmw_scatter or dedup_block or hot_rows
                  or strat_lanes is not None or dense_hot is not None):
        raise ValueError("scatter_impl='sweep'/'span'/'grmw' replaces the "
                         "plain scatter; it does not compose with "
                         "rmw_scatter/dedup_block/hot_rows/strat_lanes/"
                         "dense_hot")

    def one_step(table, s, k, tokens, sent_ids, atab, scalars, cold_pos,
                 pre_negs=None, span_plan=None):
        k_neg, k_win = jax.random.split(k)
        base = scalars.base0 + s * B
        wca = scalars.wca_start + s.astype(jnp.float32) * scalars.wca_per_step
        alpha = scalars.alpha0 * (1.0 - wca / scalars.denom)
        alpha = jnp.maximum(alpha, scalars.alpha0 * 1e-4)
        slab_tokens = lax.dynamic_slice(tokens, (base - W,), (B + 2 * W,))
        slab_sents = lax.dynamic_slice(sent_ids, (base - W,), (B + 2 * W,))
        shrink = jax.random.randint(k_win, (B,), 0, W, dtype=jnp.int32)
        if pre_negs is not None:
            # span path: negatives pre-drawn at chunk entry with the SAME
            # per-step k_neg (so the hoisted plan's ids are the step's ids)
            negs = pre_negs
        elif strat_lanes is not None:
            hot_t = AliasTable(prob=atab.prob[0], alias=atab.alias[0])
            cold_t = AliasTable(prob=atab.prob[1], alias=atab.alias[1])
            negs = draw_negatives_stratified(k_neg, hot_t, cold_t, neg_rows,
                                             P, K, strat_lanes[0], hot_rows)
        elif dense_hot is not None:
            kc = dense_hot[0]
            negs = hot_rows + _alias_draw(
                k_neg, atab.prob, atab.alias, (neg_rows, P * kc),
                atab.prob.shape[0])
        else:
            negs = draw_negatives(k_neg, atab, (neg_rows, P * K), vocab_size)
        inputs = SlabInputs(slab_tokens=slab_tokens, slab_sents=slab_sents,
                            shrink=shrink, neg_ids=negs)
        cp = None
        if hot_rows and cold_pos is not None:
            t = jnp.clip((base - W) // B, 0, cold_pos.shape[0] - 1)
            cp = lax.dynamic_slice(cold_pos, (t, 0),
                                   (1, cold_pos.shape[1]))[0]
        return fused_slab_step(table, inputs, alpha, hyper, B, neg_sharing,
                               use_pallas=use_pallas,
                               dedup_block=dedup_block, neg_pool=P,
                               hot_rows=hot_rows, cold_pos=cp,
                               strat_lanes=strat_lanes,
                               dense_hot=(None if dense_hot is None else
                                          (dense_hot[1], dense_hot[2])),
                               hot_pallas=hot_pallas, banded=banded,
                               rmw_scatter=rmw_scatter, col_pad=col_pad,
                               scatter_impl=scatter_impl,
                               span_plan=span_plan,
                               span_window=span_window,
                               span_chunk=span_chunk,
                               context_pallas=context_pallas)

    if steps == 1:
        # No-scan capacity path: lax.scan double-buffers the carried table
        # (peak ~= 2x tables — the single-chip OOM at >=2.5M x 800d bf16);
        # a plain jitted step with donation lets XLA alias the table buffer
        # in place, so the full-Wikipedia 3.7M x 800d config fits one chip.
        # Dispatch latency is amortized by a large batch_size and by the
        # train loop never fetching loss mid-segment.
        def chunk1(table, tokens, sent_ids, alias_prob, alias_alias,
                   scalars, key, cold_pos=None):
            atab = AliasTable(prob=alias_prob, alias=alias_alias)
            # same key-split structure as the scan path (steps=1)
            k = jax.random.split(key, 1)[0]
            return one_step(table, jnp.int32(0), k, tokens, sent_ids,
                            atab, scalars, cold_pos)

        return jax.jit(chunk1, donate_argnums=(0,) if donate else ())

    if loop_mode not in ("scan", "fori", "unroll"):
        raise ValueError(f"unknown loop_mode {loop_mode!r}")

    def run_loop(body, carry, xs):
        """Iterate body over xs with the selected loop construct; body has
        the lax.scan signature (carry, x) -> (carry, None)."""
        if loop_mode == "scan":
            carry, _ = lax.scan(body, carry, xs)
            return carry
        if loop_mode == "unroll":
            for s in range(steps):
                carry, _ = body(carry, jax.tree.map(lambda a, s=s: a[s], xs))
            return carry

        def fbody(s, carry):
            return body(carry, jax.tree.map(lambda a: a[s], xs))[0]

        return lax.fori_loop(0, steps, fbody, carry)

    def chunk(table, tokens, sent_ids, alias_prob, alias_alias, scalars, key,
              cold_pos=None):
        atab = AliasTable(prob=alias_prob, alias=alias_alias)
        keys = jax.random.split(key, steps)

        if scatter_impl in ("span", "grmw"):
            # hoist the sort/plan pre-pass out of the scan: every step's
            # scatter ids are knowable at chunk entry — slab ids come from
            # `tokens` and negatives are pre-drawn here with the step's
            # own k_neg (identical draws, so updates are unchanged).  One
            # batched sort + vector ops cover all S steps; the scan
            # consumes the plans as xs and each step pays only the row
            # permutation gather + the kernel (kernels/span_scatter.py /
            # group_rmw.py).
            def ids_of(s, k):
                k_neg, _ = jax.random.split(k)
                base = scalars.base0 + s * B
                slab_ids = jnp.maximum(
                    lax.dynamic_slice(tokens, (base - W,), (B + 2 * W,)), 0)
                negs = draw_negatives(k_neg, atab, (neg_rows, P * K),
                                      vocab_size)
                return jnp.concatenate([slab_ids, negs.reshape(-1)]), negs

            ids_all, negs_all = jax.vmap(ids_of)(
                jnp.arange(steps, dtype=jnp.int32), keys)
            if scatter_impl == "grmw":
                from word2bits_tpu.kernels.group_rmw import group_plan
                from word2bits_tpu.kernels.scatter_pallas import group_rows
                grp = group_rows(table.dtype)
                plans = jax.vmap(lambda i: group_plan(
                    i, grp, chunk=span_chunk))(ids_all)
            else:
                from word2bits_tpu.kernels.span_scatter import span_plan
                plans = jax.vmap(lambda i: span_plan(
                    i, table.shape[0], window=span_window,
                    chunk=span_chunk))(ids_all)

            def body_span(carry, xs):
                table, loss = carry
                s, k, pn, plan = xs
                table, step_loss = one_step(table, s, k, tokens, sent_ids,
                                            atab, scalars, cold_pos,
                                            pre_negs=pn, span_plan=plan)
                return (table, loss + step_loss), None

            xs = (jnp.arange(steps, dtype=jnp.int32), keys, negs_all, plans)
            table, loss = run_loop(body_span, (table, jnp.float32(0.0)), xs)
            return table, loss

        def body(carry, xs):
            table, loss = carry
            s, k = xs
            table, step_loss = one_step(table, s, k, tokens, sent_ids,
                                        atab, scalars, cold_pos)
            return (table, loss + step_loss), None

        xs = (jnp.arange(steps, dtype=jnp.int32), keys)
        table, loss = run_loop(body, (table, jnp.float32(0.0)), xs)
        return table, loss

    donate_argnums = (0,) if donate else ()
    return jax.jit(chunk, donate_argnums=donate_argnums)
