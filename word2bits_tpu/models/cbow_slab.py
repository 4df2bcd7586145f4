"""Slab-formulation CBOW-NS step: the TPU-optimized training core.

Mathematically identical regrouping of the reference update
(reference src/word2bits.cpp:424-504), exploiting that a batch of B
*consecutive* centers reuses the same corpus positions as contexts:

  * context gathers collapse from B*2W row-gathers to ONE gather of the
    B+2W-position slab (16x less HBM traffic at window 8): each position's
    row is fetched once and context averages become masked shifted sums.
  * u-updates group by position: position p receives
    sum_o mask[p-W-o, o] * cavge[p-W-o]  (a windowed sum of the cavge array)
    minus 2*alpha*reg*u[p] per visit — one scatter of B+2W rows instead of
    B*2W (the reference's per-(center,ctx) updates, summed by position;
    identical because scatter-add is associative/commutative modulo float
    rounding order).
  * optionally, negatives are shared across a tile of G centers
    (neg_sharing=G>0): the score and gradient contractions become real
    (G,D)x(D,K) MXU matmuls and the v-scatter shrinks from B*K rows to
    (B/G)*K.  This is a documented divergence from the reference's
    per-center draws (standard batched-word2vec practice); neg_sharing=0
    reproduces per-center negatives exactly.  Tiles are assigned by STRIDE
    (center b joins tile b % T), not contiguously: consecutive centers come
    from the same sentences, and sharing negatives within a contiguous run
    measurably hurts convergence (see ACCEPTANCE.md), while strided tiles
    spread each negative set across the whole batch.

All reference quirks preserved: window shrink b~U[0,W) per center
(:428-429), sentence-boundary masking (:431-434), skip of negatives equal to
the center (:458), remap of drawn id 0 (:457), LUT sigmoid gradient with +-6
saturation (:473-475), per-visit weight decay 2*alpha*reg (:489-503), loss
accounting (:437-445,:480-484).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.ops.quantize import quantize
from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut


class SlabInputs(NamedTuple):
    """Deterministic per-step inputs (randomness drawn by the chunk wrapper,
    injected here so tests can pin it)."""

    slab_tokens: jax.Array   # int32 [B+2W] — corpus ids, -1 padding
    slab_sents: jax.Array    # int32 [B+2W] — sentence ids, -1 padding
    shrink: jax.Array        # int32 [B] — window shrink b in [0, W)
    neg_ids: jax.Array       # int32 [B, K] or [B//G, K] when shared


def scatter_add_hot(table, ids, rows, hot_rows: int):
    """Scatter-add `rows` into `table` at `ids`, routing updates for the
    `hot_rows` most-frequent words (vocab ids < hot_rows — the vocabulary is
    frequency-sorted, reference src/word2bits.cpp:215-242) through a one-hot
    MXU matmul + dense slice-add instead of the serialized XLA scatter.

    Zipf corpora concentrate most update rows on a few hundred words; the
    matmul turns those duplicate-heavy rows into one (H,R)x(R,D) contraction
    while the residual cold rows go through the scatter with hot rows
    dropped (OOB sentinel).  Exact same sums as a plain scatter-add modulo
    float summation order."""
    rows = rows.astype(table.dtype)
    if hot_rows <= 0:
        return table.at[ids].add(rows)
    H = hot_rows
    D = table.shape[1]
    onehot = (ids[:, None] == jnp.arange(H, dtype=ids.dtype)[None, :]
              ).astype(rows.dtype)                      # [R, H]; cold rows all-0
    delta_hot = jax.lax.dot_general(
        onehot, rows, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [H, D]
    head = jax.lax.dynamic_slice(table, (0, 0), (H, D)) + delta_hot
    table = jax.lax.dynamic_update_slice(table, head.astype(table.dtype), (0, 0))
    cold_ids = jnp.where(ids < H, table.shape[0], ids)  # OOB -> dropped
    return table.at[cold_ids].add(rows, mode="drop")


def to_tiles(x, T: int, G: int):
    """[B, ...] -> [T, G, ...], STRIDED: tile t holds centers t, t+T, t+2T…
    so each shared-negative set spans the whole batch instead of one
    contiguous (correlated) run of corpus positions."""
    return x.reshape((G, T) + x.shape[1:]).swapaxes(0, 1)


def from_tiles(x, B: int):
    """Inverse of to_tiles."""
    return x.swapaxes(0, 1).reshape((B,) + x.shape[2:])


def pool_mask(G: int, K: int, P: int, dt, offset=0):
    """[G, P*K] mask: center g of a tile uses only negative pool g % P.

    Decouples the MXU tile size G from the negative-SHARING degree G/P:
    the score/gradient contractions still run at (G, D) x (D, P*K) — a
    better MXU shape than shrinking G — while each negative set is shared
    by only G/P centers (the quality knob; ACCEPTANCE.md shared-mode rows).
    P == G gives every center a private pool: per-center semantics
    (reference src/word2bits.cpp:450-460) at shared-mode matmul shapes.

    `offset` shifts the in-tile member index: a data shard holding tile
    members [offset, offset+G) passes offset = shard_index * G so its
    center->pool routing matches the global (single-chip) mask.  May be a
    traced value (lax.axis_index inside shard_map)."""
    pool_of_neg = jnp.arange(P * K, dtype=jnp.int32) // K
    pool_of_ctr = (offset + jnp.arange(G, dtype=jnp.int32)) % P
    return (pool_of_ctr[:, None] == pool_of_neg[None, :]).astype(dt)


def _context_masks(inputs: SlabInputs, B: int, W: int):
    """mask[b, oi] for offsets o in (-W..-1, 1..W)."""
    sents = inputs.slab_sents
    csent = sents[W:W + B]
    valid = csent >= 0
    offsets = [o for o in range(-W, W + 1) if o != 0]
    half = (W - inputs.shrink)[:, None]
    odist = jnp.abs(jnp.asarray(offsets, jnp.int32))[None, :]
    in_win = odist <= half
    ctx_sent = jnp.stack([sents[W + o:W + o + B] for o in offsets], axis=1)
    mask = in_win & (ctx_sent == csent[:, None]) & valid[:, None] & (ctx_sent >= 0)
    return offsets, mask, valid


def slab_step(u, v, inputs: SlabInputs, alpha, hyper: CBOWHyper,
              batch_size: int, neg_sharing: int = 0,
              use_pallas: bool = False, hot_rows: int = 0,
              dedup_block: int = 0, neg_pool: int = 1, banded: int = 0,
              scatter_impl: str = "add", span_plans=None,
              span_window: int = 512, span_chunk: int = 128,
              span_rank1: bool = False, context_pallas: bool = False):
    """One synchronous step over B consecutive centers. Returns (u, v, loss).

    use_pallas=True routes the shared-negative phase through the fused
    Pallas kernel (kernels/score_pallas.py: quantize -> sigma-dot -> gradient
    matmuls in one VMEM-resident pass per tile); requires neg_sharing > 0.
    dedup_block>0 routes every parameter scatter through
    ops.scatter.scatter_add_dedup (MXU duplicate-combining + unique-index
    scatter) — the lever against XLA's serialized duplicate-row loop,
    biggest in per-center mode where B*(K+1) update rows are duplicate-heavy.
    banded>0 computes the two windowed reductions (context sums, per-position
    u sums) as banded-block MXU matmuls with tile size `banded` instead of
    2W shifted VPU adds (ops/windowed.py); same sums, different float order.
    """
    # D from hyper, not u.shape[1]: scatter_impl="span" stores the tables
    # with zero column padding to the 128-lane tile (and zero row padding
    # to the sweep window) — gathers slice the live D columns, scatters
    # re-pad with zeros, and the padding never changes
    B, W, K, D = batch_size, hyper.window, hyper.negative, hyper.size
    bl, reg = hyper.bitlevel, hyper.reg
    # compute in f32 even when the backing store is bf16 (cfg.dtype)
    dt = jnp.float32

    spanning = scatter_impl == "span"
    if scatter_impl not in ("add", "span"):
        raise ValueError(f"unknown scatter_impl {scatter_impl!r} "
                         "(slab path supports 'add' and 'span')")
    if spanning and (hot_rows or dedup_block):
        raise ValueError("scatter_impl='span' replaces the plain scatter; "
                         "it does not compose with hot_rows/dedup_block")

    def scat_span(tab, ids, rows, plan):
        # spanning sweep scatter (kernels/span_scatter.py): the TPU answer
        # to XLA's ~50 ns/row serialized scatter — biggest in per-center
        # mode where the v-update emits B*(K+1) rows
        from word2bits_tpu.kernels.span_scatter import (
            scatter_add_span, scatter_add_span_planned)
        cp = tab.shape[1] - rows.shape[1]
        if cp:
            rows = jnp.pad(rows, ((0, 0), (0, cp)))
        rows = rows.astype(tab.dtype)
        if plan is not None:
            return scatter_add_span_planned(tab, plan, rows,
                                            window=span_window,
                                            chunk=span_chunk)
        return scatter_add_span(tab, ids, rows,
                                window=span_window, chunk=span_chunk)

    if dedup_block:
        from word2bits_tpu.ops.scatter import scatter_add_dedup

        def scat(tab, ids, rows):
            # cast first (like the baseline) so the combine matmul runs at
            # table precision (bf16 MXU rate) with f32 accumulation
            return scatter_add_dedup(tab, ids, rows.astype(tab.dtype),
                                     dedup_block)
    else:
        def scat(tab, ids, rows):
            return scatter_add_hot(tab, ids, rows, hot_rows)

    slab_ids = jnp.maximum(inputs.slab_tokens, 0)          # [B+2W]
    centers = slab_ids[W:W + B]
    two_ar = 2.0 * alpha * reg

    if context_pallas:
        # fused context+positive forward kernel (kernels/context_pallas.py,
        # the fused-table path's round-5 winner) on the split tables;
        # requires banded masks and reg == 0 (same guards as the fused step)
        if not banded:
            raise ValueError("context_pallas requires banded > 0 (the "
                             "kernel consumes the banded masks)")
        if reg:
            raise ValueError("context_pallas supports reg == 0 only (the "
                             "XLA path keeps the reg terms)")
        from word2bits_tpu.kernels.context_pallas import fused_context_pallas
        from word2bits_tpu.ops.windowed import (_tile_windows,
                                                build_banded_masks,
                                                pick_tile)
        tile = pick_tile(B, W, banded)
        Nt = B // tile
        Mb, win_idx, valid = build_banded_masks(
            inputs.slab_sents, inputs.shrink, B, W, tile)
        uwin3 = _tile_windows(u[slab_ids][:, :D], Nt, tile, W)
        scal = jnp.reshape(jnp.asarray(alpha, jnp.float32), (1, 1))
        interp = jax.default_backend() not in ("tpu", "axon")
        cavg, cavge, dv_center, af, loss = fused_context_pallas(
            uwin3, v[centers][:, :D], Mb,
            valid.astype(jnp.float32)[:, None], scal, bl, interp)
        u_slab = None   # unused at reg == 0 (no decay term)
    else:
        # --- one slab gather; quantize once (reference reads
        # quantize(u[ctx])) ---
        u_slab = u[slab_ids][:, :D].astype(dt)             # [B+2W, D]
        q_slab = quantize(u_slab, bl)

        # reg == 0 is static: skip the squared-norm loss passes entirely
        # (XLA does not fold 0*x; round-5 floor ablation) — same guard as
        # the fused step
        q_sq = jnp.sum(q_slab * q_slab, axis=-1) if reg else None  # [B+2W]
        if banded:
            from word2bits_tpu.ops.windowed import (banded_context,
                                                    build_banded_masks,
                                                    pick_tile)
            tile = pick_tile(B, W, banded)
            Mb, win_idx, valid = build_banded_masks(
                inputs.slab_sents, inputs.shrink, B, W, tile)
            csum, sq_sum, cw = banded_context(q_slab, q_sq, Mb, win_idx, B)
        else:
            offsets, mask, valid = _context_masks(inputs, B, W)
            mf = mask.astype(dt)                           # [B, 2W]
            # context sums via shifted slices of the quantized slab
            csum = jnp.zeros((B, D), dt)
            sq_sum = jnp.zeros((B,), dt) if reg else None
            for oi, o in enumerate(offsets):
                csum = csum + mf[:, oi, None] * q_slab[W + o:W + o + B]
                if reg:
                    sq_sum = sq_sum + mf[:, oi] * q_sq[W + o:W + o + B]
            cw = jnp.sum(mf, axis=1)
        active = valid & (cw > 0)
        af = active.astype(dt)
        cavg = csum / jnp.maximum(cw, 1.0)[:, None]        # [B, D]
        loss = (-reg * jnp.sum(sq_sum * af)) if reg else jnp.float32(0.0)

        # --- center (positive) term, always per-center ---
        v_c = v[centers][:, :D].astype(dt)                 # [B, D]
        q_vc = quantize(v_c, bl)
        f_pos = jnp.sum(cavg * q_vc, axis=-1)              # [B]
        g_pos = (1.0 - sigmoid_lut(f_pos)) * alpha * af
        pos_reg = (reg * jnp.sum(q_vc * q_vc, axis=-1)) if reg else 0.0
        loss = loss + jnp.sum((jnp.log(sigmoid_exact(f_pos)) - pos_reg)
                              * af)
        cavge = g_pos[:, None] * q_vc                      # [B, D]
        dv_center = g_pos[:, None] * cavg
        if reg:
            dv_center = dv_center - two_ar * v_c * af[:, None]

    if neg_sharing and neg_sharing > 0 and use_pallas:
        from word2bits_tpu.kernels.score_pallas import quantized_scores_pallas
        G = neg_sharing
        if B % G:
            raise ValueError(f"batch {B} not divisible by neg tile {G}")
        T = B // G
        P = neg_pool if neg_pool and neg_pool > 1 else 1
        negs = inputs.neg_ids                              # [T, P*K]
        v_n = v[negs][..., :D].astype(dt)                           # [T, P*K, D]
        cavg3 = to_tiles(cavg, T, G)
        af3 = to_tiles(af, T, G)
        centers3 = to_tiles(centers, T, G)
        scalars = jnp.reshape(jnp.asarray(alpha, dt), (1, 1))
        interp = jax.default_backend() not in ("tpu", "axon")
        cavge_neg, dv_neg, nloss = quantized_scores_pallas(
            cavg3, v_n, centers3, negs, af3, scalars, bl, float(reg), P,
            interp)
        loss = loss + nloss
        cavge = cavge + from_tiles(cavge_neg, B)
        ids_v = jnp.concatenate([centers, negs.reshape(-1)])
        rows_v = jnp.concatenate([dv_center, dv_neg.reshape(-1, D)])
        if spanning:
            v = scat_span(v, ids_v, rows_v,
                          None if span_plans is None else span_plans[1])
        else:
            v = scat(v, ids_v, rows_v)
    elif neg_sharing and neg_sharing > 0:
        G = neg_sharing
        if B % G:
            raise ValueError(f"batch {B} not divisible by neg tile {G}")
        T = B // G
        P = neg_pool if neg_pool and neg_pool > 1 else 1
        negs = inputs.neg_ids                              # [T, P*K]
        v_n = v[negs][..., :D].astype(dt)                           # [T, P*K, D]
        q_vn = quantize(v_n, bl)
        cavg3 = to_tiles(cavg, T, G)
        af3 = to_tiles(af, T, G)
        # MXU: (G,D) x (D,P*K) per tile
        f_neg = lax.dot_general(cavg3, q_vn,
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)  # [T,G,PK]
        centers3 = to_tiles(centers, T, G)
        skip = negs[:, None, :] != centers3[:, :, None]    # [T, G, P*K]
        m3 = skip.astype(dt) * af3[:, :, None]
        if P > 1:
            m3 = m3 * pool_mask(G, K, P, dt)[None]
        g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m3
        neg_reg = (reg * jnp.sum(q_vn * q_vn, axis=-1)[:, None, :]
                   if reg else 0.0)                        # [T, 1, K]
        loss = loss + jnp.sum(
            (jnp.log(sigmoid_exact(-f_neg)) - neg_reg) * m3)
        # cavge += sum_k g_neg * q_vn : (G,K) x (K,D) MXU
        cavge = cavge + from_tiles(lax.dot_general(
            g_neg, q_vn, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32), B)
        # dv for shared negatives: (K,G) x (G,D) MXU, decay per visit
        dv_neg = lax.dot_general(
            g_neg, cavg3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [T, K, D]
        visits = jnp.sum(m3, axis=1)                       # [T, K]
        if reg:
            dv_neg = dv_neg - two_ar * v_n * visits[:, :, None]
        ids_v = jnp.concatenate([centers, negs.reshape(-1)])
        rows_v = jnp.concatenate([dv_center, dv_neg.reshape(-1, D)])
        if spanning:
            v = scat_span(v, ids_v, rows_v,
                          None if span_plans is None else span_plans[1])
        else:
            v = scat(v, ids_v, rows_v)
    else:
        negs = inputs.neg_ids                              # [B, K]
        v_n = v[negs][..., :D].astype(dt)                           # [B, K, D]
        q_vn = quantize(v_n, bl)
        f_neg = jnp.einsum("bd,bkd->bk", cavg, q_vn)
        skip = negs != centers[:, None]
        m2 = skip.astype(dt) * af[:, None]
        g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m2
        neg_reg = (reg * jnp.sum(q_vn * q_vn, axis=-1)) if reg else 0.0
        loss = loss + jnp.sum(
            (jnp.log(sigmoid_exact(-f_neg)) - neg_reg) * m2)
        cavge = cavge + jnp.einsum("bk,bkd->bd", g_neg, q_vn)
        ids_v = jnp.concatenate([centers, negs.reshape(-1)])
        if spanning and reg == 0.0 and span_rank1:
            # rank-1 negative rows (VERDICT r4 item 2 / ROADMAP 4b): with
            # reg == 0, dv_neg[b, k] = g_neg[b, k] * cavg[b] exactly — the
            # permuted row stream is formed inside the span apply from the
            # [B, K] coefficients and the [B, D] context averages, and the
            # [B, K, D] dv tensor (the exact mode's measured throughput
            # bound) is never materialized
            from word2bits_tpu.kernels.span_scatter import (
                scatter_add_span_rank1)
            from word2bits_tpu.kernels.span_scatter import \
                span_plan as _span_plan
            cp = v.shape[1] - D
            dvc = jnp.pad(dv_center, ((0, 0), (0, cp))) if cp else dv_center
            cav = jnp.pad(cavg, ((0, 0), (0, cp))) if cp else cavg
            plan = (span_plans[1] if span_plans is not None else
                    _span_plan(ids_v, v.shape[0], window=span_window,
                               chunk=span_chunk))
            v = scatter_add_span_rank1(v, plan, dvc, g_neg.reshape(-1),
                                       cav, K, window=span_window,
                                       chunk=span_chunk)
        else:
            dv_neg = g_neg[..., None] * cavg[:, None, :]
            if reg:
                dv_neg = dv_neg - two_ar * v_n * m2[..., None]
            rows_v = jnp.concatenate([dv_center, dv_neg.reshape(-1, D)])
            if spanning:
                v = scat_span(v, ids_v, rows_v,
                              None if span_plans is None else span_plans[1])
            else:
                v = scat(v, ids_v, rows_v)

    # --- u updates grouped by slab position (one scatter of B+2W rows).
    if banded:
        from word2bits_tpu.ops.windowed import banded_usum
        M_af = Mb * af.reshape(Mb.shape[0], Mb.shape[1])[:, :, None]
        du_slab, cnt = banded_usum(M_af, cavge, B, W)
    else:
        # Stacked zero-pads + one sum instead of a 2W-long
        # dynamic-update-slice chain: identical result, dramatically
        # cheaper to compile.
        mc = mf * af[:, None]                              # effective mask
        shifted = jnp.stack(
            [jnp.pad(mc[:, oi, None] * cavge, ((W + o, W - o), (0, 0)))
             for oi, o in enumerate(offsets)])             # [2W, B+2W, D]
        du_slab = jnp.sum(shifted, axis=0)
        cnt = jnp.sum(jnp.stack(
            [jnp.pad(mc[:, oi], (W + o, W - o))
             for oi, o in enumerate(offsets)]), axis=0)    # [B+2W]
    if reg:
        du_slab = du_slab - two_ar * u_slab * cnt[:, None]
    if spanning:
        u = scat_span(u, slab_ids, du_slab,
                      None if span_plans is None else span_plans[0])
    else:
        u = scat(u, slab_ids, du_slab)

    return u, v, loss


def make_slab_train_chunk(hyper: CBOWHyper, vocab_size: int, batch_size: int,
                          steps: int, neg_sharing: int = 0,
                          donate: bool = True, use_pallas: bool = False,
                          hot_rows: int = 0, dedup_block: int = 0,
                          neg_pool: int = 1, banded: int = 0,
                          scatter_impl: str = "add",
                          span_window: int = 512, span_chunk: int = 128,
                          span_rank1: bool = False,
                          context_pallas: bool = False):
    """Drop-in replacement for make_train_chunk using the slab formulation.
    Same signature: chunk(u, v, tokens, sent_ids, alias_prob, alias_alias,
    scalars, key) -> (u, v, loss_sum).

    scatter_impl="span" routes BOTH parameter scatters (u: B+2W slab rows;
    v: B*(K+1) center+negative rows — the per-center mode's dominant cost)
    through the spanning sweep kernel.  Pass u/v padded: rows to a
    span_window multiple, columns to the 128-lane tile (padding stays
    zero).  In the scan path the sort/plan pre-pass batch-hoists out of
    the loop exactly like the fused path (negatives pre-drawn with each
    step's own key, so the updates are unchanged)."""
    from word2bits_tpu.sampling.unigram import AliasTable, draw_negatives

    B, W, K = batch_size, hyper.window, hyper.negative
    P = neg_pool if (neg_sharing and neg_pool and neg_pool > 1) else 1
    neg_rows = (batch_size // neg_sharing) if neg_sharing else batch_size
    spanning = scatter_impl == "span"
    if spanning and (hot_rows or dedup_block):
        raise ValueError("scatter_impl='span' replaces the plain scatter; "
                         "it does not compose with hot_rows/dedup_block")

    def one_step(u, v, s, k, tokens, sent_ids, table, scalars,
                 pre_negs=None, span_plans=None):
        k_neg, k_win = jax.random.split(k)
        base = scalars.base0 + s * B
        wca = scalars.wca_start + s.astype(jnp.float32) * scalars.wca_per_step
        alpha = scalars.alpha0 * (1.0 - wca / scalars.denom)
        alpha = jnp.maximum(alpha, scalars.alpha0 * 1e-4)

        slab_tokens = lax.dynamic_slice(tokens, (base - W,), (B + 2 * W,))
        slab_sents = lax.dynamic_slice(sent_ids, (base - W,), (B + 2 * W,))
        shrink = jax.random.randint(k_win, (B,), 0, W, dtype=jnp.int32)
        if pre_negs is not None:
            # span scan path: negatives pre-drawn at chunk entry with the
            # SAME per-step k_neg (identical draws; the hoisted plan's ids
            # are the step's ids)
            negs = pre_negs
        else:
            negs = draw_negatives(k_neg, table, (neg_rows, P * K),
                                  vocab_size)
        inputs = SlabInputs(slab_tokens=slab_tokens, slab_sents=slab_sents,
                            shrink=shrink, neg_ids=negs)
        return slab_step(u, v, inputs, alpha, hyper, B, neg_sharing,
                         use_pallas=use_pallas, hot_rows=hot_rows,
                         dedup_block=dedup_block, neg_pool=P, banded=banded,
                         scatter_impl=scatter_impl, span_plans=span_plans,
                         span_window=span_window, span_chunk=span_chunk,
                         span_rank1=span_rank1,
                         context_pallas=context_pallas)

    if steps == 1:
        # No-scan capacity path (see models/cbow_fused.py): donation aliases
        # u/v in place instead of lax.scan's double-buffered carry, halving
        # peak HBM for huge vocab tables.
        def chunk1(u, v, tokens, sent_ids, alias_prob, alias_alias,
                   scalars, key):
            table = AliasTable(prob=alias_prob, alias=alias_alias)
            # same key-split structure as the scan path (steps=1), so a
            # config at steps_per_chunk=1 trains identically either way
            k = jax.random.split(key, 1)[0]
            return one_step(u, v, jnp.int32(0), k, tokens, sent_ids,
                            table, scalars)

        return jax.jit(chunk1, donate_argnums=(0, 1) if donate else ())

    def chunk(u, v, tokens, sent_ids, alias_prob, alias_alias, scalars, key):
        table = AliasTable(prob=alias_prob, alias=alias_alias)
        keys = jax.random.split(key, steps)
        steps_i = jnp.arange(steps, dtype=jnp.int32)

        if spanning:
            # hoist the span pre-pass (sorts + per-chunk scalars) out of
            # the scan: every step's scatter ids are knowable at chunk
            # entry — slab ids from `tokens`, negatives pre-drawn with the
            # step's own k_neg (see models/cbow_fused.py span path)
            from word2bits_tpu.kernels.span_scatter import span_plan
            Vp = u.shape[0]
            if v.shape[0] != Vp:
                raise ValueError("span needs u and v padded to the same "
                                 f"row count (got {Vp} vs {v.shape[0]})")

            def ids_of(s, k):
                k_neg, _ = jax.random.split(k)
                base = scalars.base0 + s * B
                slab_ids = jnp.maximum(
                    lax.dynamic_slice(tokens, (base - W,), (B + 2 * W,)), 0)
                negs = draw_negatives(k_neg, table, (neg_rows, P * K),
                                      vocab_size)
                ids_v = jnp.concatenate([slab_ids[W:W + B],
                                         negs.reshape(-1)])
                return slab_ids, ids_v, negs

            ids_u_all, ids_v_all, negs_all = jax.vmap(ids_of)(steps_i, keys)
            mk = lambda i: span_plan(i, Vp, window=span_window,  # noqa: E731
                                     chunk=span_chunk)
            plans_u = jax.vmap(mk)(ids_u_all)
            plans_v = jax.vmap(mk)(ids_v_all)

            def body_span(carry, xs):
                u, v, loss = carry
                s, k, negs, pu, pv = xs
                u, v, step_loss = one_step(u, v, s, k, tokens, sent_ids,
                                           table, scalars, pre_negs=negs,
                                           span_plans=(pu, pv))
                return (u, v, loss + step_loss), None

            (u, v, loss), _ = lax.scan(
                body_span, (u, v, jnp.float32(0.0)),
                (steps_i, keys, negs_all, plans_u, plans_v))
            return u, v, loss

        def body(carry, xs):
            u, v, loss = carry
            s, k = xs
            u, v, step_loss = one_step(u, v, s, k, tokens, sent_ids,
                                       table, scalars)
            return (u, v, loss + step_loss), None

        xs = (steps_i, keys)
        (u, v, loss), _ = lax.scan(body, (u, v, jnp.float32(0.0)), xs)
        return u, v, loss

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(chunk, donate_argnums=donate_argnums)
