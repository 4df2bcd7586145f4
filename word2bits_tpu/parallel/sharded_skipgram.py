"""Vocab-sharded + data-parallel skip-gram step (mirrors sharded_slab.py).

Same mesh/collective design as the CBOW sharded step: u/v sharded
P("vocab", None), inputs replicated, rows fetched by masked-local-gather +
psum over "vocab", per-shard deltas psum'd over "data".  The skip-gram math
is models/skipgram.py's (per (center, offset) pair, the context word's input
row scores against center + tile-shared negatives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.models.cbow_slab import (
    SlabInputs,
    _context_masks,
    from_tiles,
    to_tiles,
)
from word2bits_tpu.ops.quantize import quantize
from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut
from word2bits_tpu.parallel.mesh import DATA_AXIS, VOCAB_AXIS
from word2bits_tpu.parallel.sharded import (
    _gather_rows,
    _gather_rows_layout,
    _scatter_delta,
    _scatter_delta_layout,
)


def _sharded_skipgram_body(u_local, v_local, slab_tokens, slab_sents, shrink,
                           negs, alpha, hyper: CBOWHyper, B_global: int,
                           neg_sharing: int, vocab_shard_size: int,
                           neg_pool: int = 1, dense_hot=None,
                           hot_layout=None):
    """dense_hot = (w_cold, hot_w[H]): exact hot-stratum negatives per
    (center, offset) pair, vocab-axis local — same collective shape as the
    sharded_slab dense_hot path (no hot row exchange; one [B*2W, D] psum
    for the pair-gradient term).

    hot_layout (parallel/layout.HotLayout, requires dense_hot): balanced
    hot-head placement — see _sharded_slab_body."""
    W, K, D = hyper.window, hyper.negative, u_local.shape[1]
    bl, reg = hyper.bitlevel, hyper.reg
    dt = jnp.float32
    Vs = u_local.shape[0]

    nd = lax.axis_size(DATA_AXIS)
    di = lax.axis_index(DATA_AXIS)
    B = B_global // nd
    start = di * B
    my_tokens = lax.dynamic_slice(slab_tokens, (start,), (B + 2 * W,))
    my_sents = lax.dynamic_slice(slab_sents, (start,), (B + 2 * W,))
    my_shrink = lax.dynamic_slice(shrink, (start,), (B,))
    if neg_sharing:
        my_negs = negs                                 # [T_global, P*Kl]
    else:
        my_negs = lax.dynamic_slice(negs, (start, 0), (B, negs.shape[1]))

    inputs = SlabInputs(my_tokens, my_sents, my_shrink, my_negs)
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
    u_slab = gat(u_local, slab_ids).astype(dt)
    v_c = gat(v_local, centers).astype(dt)
    v_n = gat(v_local, my_negs).astype(dt)
    q_slab = quantize(u_slab, bl)

    offsets, mask, valid = _context_masks(inputs, B, W)
    mf = mask.astype(dt)
    q_in = jnp.stack([q_slab[W + o:W + o + B] for o in offsets], axis=1)
    u_in = jnp.stack([u_slab[W + o:W + o + B] for o in offsets], axis=1)
    two_ar = 2.0 * alpha * reg

    q_vc = quantize(v_c, bl)
    f_pos = jnp.einsum("bod,bd->bo", q_in, q_vc)
    g_pos = (1.0 - sigmoid_lut(f_pos)) * alpha * mf
    vc_sq = jnp.sum(q_vc * q_vc, axis=-1)
    in_sq = jnp.sum(q_in * q_in, axis=-1)
    loss = jnp.sum((jnp.log(sigmoid_exact(f_pos))
                    - reg * (vc_sq[:, None] + in_sq)) * mf)
    pair_cnt = jnp.sum(mf, axis=1)
    dv_center = jnp.einsum("bo,bod->bd", g_pos, q_in) \
        - two_ar * v_c * pair_cnt[:, None]
    din = g_pos[..., None] * q_vc[:, None, :]

    q_vn = quantize(v_n, bl)
    if neg_sharing:
        from word2bits_tpu.models.cbow_slab import pool_mask
        G = neg_sharing
        T = B_global // G
        G_local = B // T
        PK = my_negs.shape[-1]                  # P*K negatives per tile
        q_in4 = to_tiles(q_in, T, G_local).reshape(T, G_local * 2 * W, D)
        mf4 = to_tiles(mf, T, G_local)
        centers3 = to_tiles(centers, T, G_local)
        f_neg = lax.dot_general(q_in4, q_vn, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        f_neg = f_neg.reshape(T, G_local, 2 * W, PK)
        skip = (my_negs[:, None, :] != centers3[:, :, None])
        eligible = skip.astype(dt)
        if neg_pool > 1:
            # offset the member index by this shard's tile-slice start so
            # center->pool routing matches the single-chip pool_mask
            eligible = eligible * pool_mask(G_local, PK // neg_pool,
                                            neg_pool, dt,
                                            offset=di * G_local)[None]
        m4 = mf4[..., None] * eligible[:, :, None, :]
        if dense_hot is not None:
            m4 = m4 * jnp.float32(dense_hot[0])
        g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m4
        vn_sq = jnp.sum(q_vn * q_vn, axis=-1)
        loss = loss + jnp.sum(
            (jnp.log(sigmoid_exact(-f_neg)) - reg * vn_sq[:, None, None, :]) * m4)
        g2 = g_neg.reshape(T, G_local * 2 * W, PK)
        dv_neg = lax.dot_general(g2, q_in4, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        visits = jnp.sum(m4, axis=(1, 2))
        dv_neg = dv_neg - two_ar * v_n * visits[..., None]
        din_neg = lax.dot_general(g2, q_vn, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32
                                  ).reshape(T, G_local, 2 * W, D)
        din = din + from_tiles(din_neg, B)
        neg_rows_flat = my_negs.reshape(-1)
        dv_neg_flat = dv_neg.reshape(-1, D)
    else:
        f_neg = jnp.einsum("bod,bkd->bok", q_in, q_vn)
        skip = (my_negs != centers[:, None])
        m3 = mf[..., None] * skip[:, None, :].astype(dt)
        if dense_hot is not None:
            m3 = m3 * jnp.float32(dense_hot[0])
        g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m3
        vn_sq = jnp.sum(q_vn * q_vn, axis=-1)
        loss = loss + jnp.sum(
            (jnp.log(sigmoid_exact(-f_neg)) - reg * vn_sq[:, None, :]) * m3)
        dv_neg = jnp.einsum("bok,bod->bkd", g_neg, q_in)
        visits = jnp.sum(m3, axis=1)
        dv_neg = dv_neg - two_ar * v_n * visits[..., None]
        din = din + jnp.einsum("bok,bkd->bod", g_neg, q_vn)
        neg_rows_flat = my_negs.reshape(-1)
        dv_neg_flat = dv_neg.reshape(-1, D)

    dv_hot = None
    if dense_hot is not None:
        hot_w = jnp.asarray(dense_hot[1], dt)              # [H] replicated
        H = hot_w.shape[0]
        vi = lax.axis_index(VOCAB_AXIS)
        if hot_layout is None:
            Hs = min(H, Vs)
            gidx = vi * Vs + jnp.arange(Hs, dtype=jnp.int32)
        else:
            # balanced layout: shard vi's leading rows are its own hot
            # sub-range — [., H/nv] FLOPs per shard instead of [., H]
            Hs = hot_layout.hot_per_shard
            gidx = vi * Hs + jnp.arange(Hs, dtype=jnp.int32)
        w_loc = jnp.where(gidx < H, hot_w[jnp.clip(gidx, 0, H - 1)], 0.0)
        v_h = v_local[:Hs].astype(dt)
        q_vh = quantize(v_h, bl)
        q_in2 = q_in.reshape(B * 2 * W, D)
        f_h = lax.dot_general(q_in2, q_vh, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        c_rep = jnp.broadcast_to(centers[:, None], (B, 2 * W)).reshape(-1)
        skip_h = gidx[None, :] != c_rep[:, None]
        mh = (skip_h.astype(dt) * mf.reshape(-1)[:, None] * w_loc[None, :])
        g_h = (0.0 - sigmoid_lut(f_h)) * alpha * mh
        vh_sq = jnp.sum(q_vh * q_vh, axis=-1)
        hot_loss = jnp.sum(
            (jnp.log(sigmoid_exact(-f_h)) - reg * vh_sq[None, :]) * mh)
        loss = loss + lax.psum(hot_loss, VOCAB_AXIS)
        din = din + lax.psum(
            lax.dot_general(g_h, q_vh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
            VOCAB_AXIS).reshape(B, 2 * W, D)
        dv_hot = lax.dot_general(g_h, q_in2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv_hot = dv_hot - two_ar * v_h * jnp.sum(mh, axis=0)[:, None]

    din = din * mf[..., None] - two_ar * u_in * mf[..., None]
    shifted = jnp.stack(
        [jnp.pad(din[:, oi], ((W + o, W - o), (0, 0)))
         for oi, o in enumerate(offsets)])
    du_slab = jnp.sum(shifted, axis=0)

    ones_b = jnp.ones(centers.shape, bool)
    ones_slab = jnp.ones(slab_ids.shape, bool)
    ones_neg = jnp.ones(neg_rows_flat.shape, bool)
    delta_v = scat(centers, dv_center, ones_b)
    delta_v = delta_v + scat(neg_rows_flat, dv_neg_flat, ones_neg)
    if dv_hot is not None:
        delta_v = delta_v.at[:dv_hot.shape[0]].add(dv_hot)
    delta_u = scat(slab_ids, du_slab, ones_slab)
    delta_v = lax.psum(delta_v, DATA_AXIS)
    delta_u = lax.psum(delta_u, DATA_AXIS)
    loss = lax.psum(loss, DATA_AXIS)
    return (u_local + delta_u.astype(u_local.dtype),
            v_local + delta_v.astype(v_local.dtype), loss)


def make_sharded_skipgram_step(hyper: CBOWHyper, mesh: Mesh,
                               vocab_size_padded: int, batch_size: int,
                               neg_sharing: int = 0, neg_pool: int = 1):
    """Same contract as make_sharded_slab_step, skip-gram objective."""
    nd = mesh.shape[DATA_AXIS]
    nv = mesh.shape[VOCAB_AXIS]
    if batch_size % nd:
        raise ValueError(f"batch {batch_size} not divisible by data axis {nd}")
    if neg_sharing:
        if batch_size % neg_sharing:
            raise ValueError("batch must be divisible by neg_sharing")
        if neg_sharing % nd:
            raise ValueError("neg_sharing tile must be divisible by data axis")
    if vocab_size_padded % nv:
        raise ValueError(f"vocab {vocab_size_padded} not divisible by {nv}")
    vss = vocab_size_padded // nv

    def step(u_local, v_local, slab_tokens, slab_sents, shrink, negs, alpha):
        u_local, v_local, loss = _sharded_skipgram_body(
            u_local, v_local, slab_tokens, slab_sents, shrink, negs, alpha,
            hyper, batch_size, neg_sharing, vss, neg_pool=neg_pool)
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
