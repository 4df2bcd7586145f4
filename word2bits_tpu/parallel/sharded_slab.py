"""Vocab-sharded + data-parallel SLAB training step — the scaling form of the
optimized single-chip core (word2bits_tpu/models/cbow_slab.py).

Mesh ("data", "vocab"):
  * u, v sharded P("vocab", None); slab/batch inputs replicated (they are
    kilobytes), each data shard slicing its own B/N_d centers with a 2W halo.
  * remote rows ride ICI as masked-local-gather + psum over "vocab"
    (the all-gather of minibatch rows).
  * per-shard (V_shard, D) update deltas are psum'd over "data" and applied
    by the owning vocab shard only.

Numerically equal to the single-device slab step (tested on an 8-virtual-
device CPU mesh); scaling efficiency relies on XLA overlapping the vocab-axis
psums with the MXU contractions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.models.cbow_slab import SlabInputs, _context_masks
from word2bits_tpu.ops.quantize import quantize
from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut
from word2bits_tpu.parallel.mesh import DATA_AXIS, VOCAB_AXIS
from word2bits_tpu.parallel.sharded import (
    _gather_rows,
    _gather_rows_layout,
    _scatter_delta,
    _scatter_delta_layout,
)


def _sharded_slab_body(u_local, v_local, slab_tokens, slab_sents, shrink,
                       negs, alpha, hyper: CBOWHyper, B_global: int,
                       neg_sharing: int, vocab_shard_size: int,
                       neg_pool: int = 1, dense_hot=None, hot_layout=None,
                       banded: int = 0, rmw: bool = False,
                       scatter_impl: str = "add", span_window: int = 512,
                       span_chunk: int = 128):
    """Runs inside shard_map. Global inputs replicated; params vocab-sharded.

    dense_hot = (w_cold, hot_w[H]) enables exact hot-stratum negatives
    (models/cbow_fused.py): each vocab shard scores every center against its
    OWN local rows whose global index is < H (weights masked to zero
    elsewhere), so the hot head needs NO row exchange — only the [B, D]
    expected-gradient term and the scalar loss psum over "vocab".  `negs`
    then carries cold-only draws (ids >= H) weighted by w_cold.

    hot_layout (parallel/layout.HotLayout, requires dense_hot): tables are
    placed in the balanced hot layout, so each shard's leading rows are its
    OWN H/nv hot sub-range and the dense contraction shrinks to [B, H/nv]
    per shard (nv x fewer redundant FLOPs); gathers/scatters use the
    piecewise slot map.  hot_w must be padded to layout.hot_pad
    (layout.pad_hot_weights)."""
    # D from hyper, not the table width: scatter_impl="span" stores the
    # per-shard tables with zero column padding to the 128-lane tile
    # (kernels/span_scatter.py) — gathers slice the live D columns (a no-op
    # when unpadded) and the span scatter re-pads its rows with zeros, so
    # the padding never changes and never reaches quantize()
    W, K, D = hyper.window, hyper.negative, hyper.size
    bl, reg = hyper.bitlevel, hyper.reg
    # compute in f32 even when the backing store is bf16, as
    # cbow_slab.slab_step does (LUT bin index / log-loss must not run bf16)
    dt = jnp.float32
    Vs = u_local.shape[0]
    spanning = scatter_impl == "span"
    if scatter_impl not in ("add", "span"):
        raise ValueError(f"unknown scatter_impl {scatter_impl!r} "
                         "(sharded slab supports 'add' and 'span')")

    nd = lax.axis_size(DATA_AXIS)
    di = lax.axis_index(DATA_AXIS)
    B = B_global // nd

    # my slice of the global slab (with halo)
    start = di * B
    my_tokens = lax.dynamic_slice(slab_tokens, (start,), (B + 2 * W,))
    my_sents = lax.dynamic_slice(slab_sents, (start,), (B + 2 * W,))
    my_shrink = lax.dynamic_slice(shrink, (start,), (B,))
    if neg_sharing:
        # Global strided tiling: center with global index g joins tile
        # g % T_global (see cbow_slab.to_tiles).  A shard's contiguous range
        # starts at d*B which is a multiple of T_global, so local index
        # b % T_global == global tile id: every shard uses ALL T_global
        # negative rows, holding G/nd members of each tile.
        my_negs = negs                                 # [T_global, P*Kl]
    else:
        my_negs = lax.dynamic_slice(negs, (start, 0), (B, negs.shape[1]))

    inputs = SlabInputs(slab_tokens=my_tokens, slab_sents=my_sents,
                        shrink=my_shrink, neg_ids=my_negs)
    slab_ids = jnp.maximum(my_tokens, 0)
    centers = slab_ids[W:W + B]

    if hot_layout is None:
        def gat(tab, ids):
            return _gather_rows(tab, ids, vocab_shard_size)

        def scat(ids, rows, mask):
            return _scatter_delta(ids, rows, mask, vocab_shard_size, (Vs, D))
    else:
        if dense_hot is None:
            raise ValueError("hot_layout requires dense_hot")

        def gat(tab, ids):
            return _gather_rows_layout(tab, ids, hot_layout)

        def scat(ids, rows, mask):
            return _scatter_delta_layout(ids, rows, mask, hot_layout, (Vs, D))

    # issue ALL vocab-axis row exchanges up front: the three gathers'
    # psums are independent, so XLA's latency-hiding scheduler can overlap
    # them with each other and with the mask/context compute below instead
    # of serializing gather -> compute -> gather (ROADMAP overlap item)
    u_slab = gat(u_local, slab_ids)[..., :D].astype(dt)
    v_c = gat(v_local, centers)[..., :D].astype(dt)
    v_n = gat(v_local, my_negs)[..., :D].astype(dt)
    q_slab = quantize(u_slab, bl)

    q_sq = jnp.sum(q_slab * q_slab, axis=-1)
    if banded:
        # banded-block MXU formulation of the two windowed reductions,
        # same sums as the shift path (ops/windowed.py); per-shard B here
        from word2bits_tpu.ops.windowed import (banded_context,
                                                build_banded_masks, pick_tile)
        btile = pick_tile(B, W, banded)
        Mb, win_idx, valid = build_banded_masks(
            my_sents, my_shrink, B, W, btile)
        csum, sq_sum, cw = banded_context(q_slab, q_sq, Mb, win_idx, B)
    else:
        offsets, mask, valid = _context_masks(inputs, B, W)
        mf = mask.astype(dt)
        csum = jnp.zeros((B, D), dt)
        sq_sum = jnp.zeros((B,), dt)
        for oi, o in enumerate(offsets):
            csum = csum + mf[:, oi, None] * q_slab[W + o:W + o + B]
            sq_sum = sq_sum + mf[:, oi] * q_sq[W + o:W + o + B]
        cw = jnp.sum(mf, axis=1)
    active = valid & (cw > 0)
    af = active.astype(dt)
    cavg = csum / jnp.maximum(cw, 1.0)[:, None]
    loss = -reg * jnp.sum(sq_sum * af)
    two_ar = 2.0 * alpha * reg

    q_vc = quantize(v_c, bl)
    f_pos = jnp.sum(cavg * q_vc, axis=-1)
    g_pos = (1.0 - sigmoid_lut(f_pos)) * alpha * af
    loss = loss + jnp.sum((jnp.log(sigmoid_exact(f_pos))
                           - reg * jnp.sum(q_vc * q_vc, axis=-1)) * af)
    cavge = g_pos[:, None] * q_vc
    dv_center = g_pos[:, None] * cavg - two_ar * v_c * af[:, None]

    q_vn = quantize(v_n, bl)
    if neg_sharing:
        from word2bits_tpu.models.cbow_slab import (from_tiles, pool_mask,
                                                    to_tiles)
        G = neg_sharing
        T = B_global // G          # global tile count
        G_local = B // T           # members of each tile on this shard
        cavg3 = to_tiles(cavg, T, G_local)
        af3 = to_tiles(af, T, G_local)
        f_neg = lax.dot_general(cavg3, q_vn, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        centers3 = to_tiles(centers, T, G_local)
        skip = my_negs[:, None, :] != centers3[:, :, None]
        m3 = skip.astype(dt) * af3[:, :, None]
        if neg_pool > 1:
            # this shard holds tile members [di*G_local, (di+1)*G_local);
            # offset the member index so center->pool routing matches the
            # single-chip mask (cbow_slab.pool_mask)
            m3 = m3 * pool_mask(G_local, my_negs.shape[1] // neg_pool,
                                neg_pool, dt, offset=di * G_local)[None]
        if dense_hot is not None:
            m3 = m3 * jnp.float32(dense_hot[0])  # cold importance weight
        g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m3
        vn_sq = jnp.sum(q_vn * q_vn, axis=-1)
        loss = loss + jnp.sum(
            (jnp.log(sigmoid_exact(-f_neg)) - reg * vn_sq[:, None, :]) * m3)
        cavge = cavge + from_tiles(lax.dot_general(
            g_neg, q_vn, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32), B)
        dv_neg = lax.dot_general(g_neg, cavg3, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        visits = jnp.sum(m3, axis=1)
        dv_neg = dv_neg - two_ar * v_n * visits[:, :, None]
        neg_rows_flat = my_negs.reshape(-1)
        dv_neg_flat = dv_neg.reshape(-1, D)
        neg_mask = jnp.ones(neg_rows_flat.shape, bool)
    else:
        f_neg = jnp.einsum("bd,bkd->bk", cavg, q_vn)
        skip = my_negs != centers[:, None]
        m2 = skip.astype(dt) * af[:, None]
        if dense_hot is not None:
            m2 = m2 * jnp.float32(dense_hot[0])  # cold importance weight
        g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m2
        vn_sq = jnp.sum(q_vn * q_vn, axis=-1)
        loss = loss + jnp.sum((jnp.log(sigmoid_exact(-f_neg))
                               - reg * vn_sq) * m2)
        cavge = cavge + jnp.einsum("bk,bkd->bd", g_neg, q_vn)
        dv_neg = g_neg[..., None] * cavg[:, None, :] \
            - two_ar * v_n * m2[..., None]
        neg_rows_flat = my_negs.reshape(-1)
        dv_neg_flat = dv_neg.reshape(-1, D)
        neg_mask = jnp.ones(neg_rows_flat.shape, bool)

    dv_hot = None
    if dense_hot is not None:
        # exact hot-stratum negatives, vocab-axis local: this shard's rows
        # with global id < H carry weight hot_w[gid]; all other local rows
        # get weight 0 (same FLOPs every shard — SPMD lockstep — but only
        # owners contribute).  No hot-row gather/psum at all.
        hot_w = jnp.asarray(dense_hot[1], dt)              # [H], replicated
        H = hot_w.shape[0]
        vi = lax.axis_index(VOCAB_AXIS)
        if hot_layout is None:
            # unbalanced: the hot head lives on the leading shard(s); every
            # shard burns the same [B, Hs] FLOPs, only owners contribute
            Hs = min(H, Vs)
            gidx = vi * Vs + jnp.arange(Hs, dtype=jnp.int32)
        else:
            # balanced layout: shard vi's leading rows ARE its own hot
            # sub-range [vi*Hs, (vi+1)*Hs) — [B, H/nv] FLOPs per shard
            Hs = hot_layout.hot_per_shard
            gidx = vi * Hs + jnp.arange(Hs, dtype=jnp.int32)
        w_loc = jnp.where(gidx < H, hot_w[jnp.clip(gidx, 0, H - 1)], 0.0)
        v_h = v_local[:Hs, :D].astype(dt)
        q_vh = quantize(v_h, bl)
        f_h = lax.dot_general(cavg, q_vh, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [B, Hs]
        skip_h = gidx[None, :] != centers[:, None]
        mh = skip_h.astype(dt) * af[:, None] * w_loc[None, :]
        g_h = (0.0 - sigmoid_lut(f_h)) * alpha * mh
        vh_sq = jnp.sum(q_vh * q_vh, axis=-1)
        hot_loss = jnp.sum(
            (jnp.log(sigmoid_exact(-f_h)) - reg * vh_sq[None, :]) * mh)
        # replicate the partials so downstream stays vocab-replicated like
        # every other term (the chunk divides the final psum by nv)
        loss = loss + lax.psum(hot_loss, VOCAB_AXIS)
        cavge = cavge + lax.psum(
            lax.dot_general(g_h, q_vh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32), VOCAB_AXIS)
        dv_hot = lax.dot_general(g_h, cavg, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv_hot = dv_hot - two_ar * v_h * jnp.sum(mh, axis=0)[:, None]

    # u updates grouped by position
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
    du_slab = du_slab - two_ar * u_slab * cnt[:, None]

    if rmw or spanning:
        # Row-update formulation on the mesh: apply ROW updates to the local
        # shard via a Pallas kernel with local ids (non-owned rows -> the
        # drop sentinel) instead of a dense [Vs, D] delta + psum + add.
        #   rmw  (-rmw-scatter, the capacity path): in-place group-RMW DMA
        #        chains — peak HBM stays 1x table per shard.
        #   span (-scatter-impl span, the throughput path): the spanning
        #        sweep kernel (kernels/span_scatter.py) — sorted rows stream
        #        through the shard's windows with VMEM-resident accumulation
        #        and one-hot MXU placement (VERDICT r3 item 5).
        # The data axis exchanges the (ids, rows) lists (all_gather, ~N*D
        # bytes) rather than dense deltas (~Vs*D): duplicate ids from
        # different data shards accumulate inside the kernel (sequential
        # blocks / per-window f32 sums), same sums modulo float order.
        if dv_hot is not None:
            raise ValueError("rmw/span does not compose with dense_hot "
                             "(config validation rejects it upstream)")
        DROP = jnp.int32(0x7FFFFFF0)
        my = lax.axis_index(VOCAB_AXIS)

        def to_local(ids):
            if hot_layout is None:
                owner = ids // vocab_shard_size
                local = ids % vocab_shard_size
            else:
                owner, local = hot_layout.owner_local(ids)
            return jnp.where(owner == my, local, DROP)

        ids_v = jnp.concatenate([centers, neg_rows_flat])
        rows_v = jnp.concatenate([dv_center, dv_neg_flat])
        ids_u = slab_ids
        rows_u = du_slab
        if lax.axis_size(DATA_AXIS) > 1:
            ids_v = lax.all_gather(ids_v, DATA_AXIS, tiled=True)
            rows_v = lax.all_gather(rows_v, DATA_AXIS, tiled=True)
            ids_u = lax.all_gather(ids_u, DATA_AXIS, tiled=True)
            rows_u = lax.all_gather(rows_u, DATA_AXIS, tiled=True)
        if spanning:
            from word2bits_tpu.kernels.span_scatter import scatter_add_span
            cp = u_local.shape[1] - D

            def apply_span(tab, ids, rows):
                if cp:  # re-pad rows to the 128-lane storage width (zeros)
                    rows = jnp.pad(rows, ((0, 0), (0, cp)))
                return scatter_add_span(tab, ids, rows.astype(tab.dtype),
                                        window=span_window, chunk=span_chunk)

            v_local = apply_span(v_local, to_local(ids_v), rows_v)
            u_local = apply_span(u_local, to_local(ids_u), rows_u)
        else:
            from word2bits_tpu.kernels.scatter_pallas import scatter_add_rmw
            v_local = scatter_add_rmw(v_local, to_local(ids_v),
                                      rows_v.astype(v_local.dtype))
            u_local = scatter_add_rmw(u_local, to_local(ids_u),
                                      rows_u.astype(u_local.dtype))
        loss = lax.psum(loss, DATA_AXIS)
        return u_local, v_local, loss

    # scatter into local shard deltas; sum over the data axis
    ones_b = jnp.ones(centers.shape, bool)
    ones_slab = jnp.ones(slab_ids.shape, bool)
    delta_v = scat(centers, dv_center, ones_b)
    delta_v = delta_v + scat(neg_rows_flat, dv_neg_flat, neg_mask)
    if dv_hot is not None:
        # dense hot v-deltas land on this shard's own leading rows (in the
        # balanced layout those ARE the shard's hot sub-range slots)
        delta_v = delta_v.at[:dv_hot.shape[0]].add(dv_hot)
    delta_u = scat(slab_ids, du_slab, ones_slab)
    delta_v = lax.psum(delta_v, DATA_AXIS)
    delta_u = lax.psum(delta_u, DATA_AXIS)
    loss = lax.psum(loss, DATA_AXIS)
    return (u_local + delta_u.astype(u_local.dtype),
            v_local + delta_v.astype(v_local.dtype), loss)


def make_sharded_slab_step(hyper: CBOWHyper, mesh: Mesh,
                           vocab_size_padded: int, batch_size: int,
                           neg_sharing: int = 0, neg_pool: int = 1,
                           dense_hot=None, hot_layout=None, banded: int = 0):
    """jit(shard_map) step: (u_loc, v_loc, slab_tokens, slab_sents, shrink,
    negs, alpha) -> (u_loc, v_loc, loss).  Inputs replicated, params
    vocab-sharded."""
    nd = mesh.shape[DATA_AXIS]
    nv = mesh.shape[VOCAB_AXIS]
    if batch_size % nd:
        raise ValueError(f"batch {batch_size} not divisible by data axis {nd}")
    if neg_sharing:
        if batch_size % neg_sharing:
            raise ValueError("batch must be divisible by neg_sharing")
        if neg_sharing % nd:
            raise ValueError(
                f"neg_sharing tile ({neg_sharing}) must be divisible by the "
                f"data-axis size ({nd}) so every shard holds whole tile slices")
    if vocab_size_padded % nv:
        raise ValueError(f"vocab {vocab_size_padded} not divisible by {nv}")
    vss = vocab_size_padded // nv

    def step(u_local, v_local, slab_tokens, slab_sents, shrink, negs, alpha):
        u_local, v_local, loss = _sharded_slab_body(
            u_local, v_local, slab_tokens, slab_sents, shrink, negs, alpha,
            hyper, batch_size, neg_sharing, vss, neg_pool=neg_pool,
            dense_hot=dense_hot, hot_layout=hot_layout, banded=banded)
        loss = lax.psum(loss, VOCAB_AXIS) / nv
        return u_local, v_local, loss

    pp = P(VOCAB_AXIS, None)
    rep = P()
    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(pp, pp, rep, rep, rep, rep, rep),
        out_specs=(pp, pp, rep),
    )
    return jax.jit(mapped, donate_argnums=(0, 1))
