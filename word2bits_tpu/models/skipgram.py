"""Skip-gram with negative sampling, virtually quantized — slab formulation.

The reference implements only CBOW (SURVEY.md section 0: the `hs` flag and
Huffman fields are dead code, there is no skip-gram path).  Skip-gram is
provided as a documented extension because Word2Bits' own description
(BASELINE north star) frames the algorithm family as word2vec-with-
quantization: per (center, context) pair the *context* word's input row
predicts the center against K negatives, with the same quantize-on-read STE
contract, LUT sigmoid gradient, per-visit weight decay, and skip/remap
negative-sampling quirks as the CBOW path.

TPU formulation mirrors cbow_slab: one gather of the B+2W-position slab,
pair scores as MXU matmuls against (optionally tile-shared) negatives, and
u-updates grouped by slab position (windowed sums -> one B+2W-row scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.models.cbow_slab import SlabInputs, _context_masks
from word2bits_tpu.ops.quantize import quantize
from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut


def skipgram_slab_step(u, v, inputs: SlabInputs, alpha, hyper: CBOWHyper,
                       batch_size: int, neg_sharing: int = 0,
                       dedup_block: int = 0, neg_pool: int = 1,
                       dense_hot=None):
    """One synchronous skip-gram step over B consecutive centers.

    Every (center b, offset o) pair trains input row u[token[b+o]] against
    targets {center_b} + negatives. Returns (u, v, loss).

    dense_hot = (w_cold, hot_w[H]): exact hot-stratum negatives per PAIR
    (models/cbow_fused.py semantics, [B*2W, H] MXU contraction);
    inputs.neg_ids then carries cold-only draws weighted by w_cold.
    """
    B, W, K, D = batch_size, hyper.window, hyper.negative, u.shape[1]
    bl, reg = hyper.bitlevel, hyper.reg
    # compute in f32 even when the backing store is bf16 (cfg.dtype), exactly
    # as cbow_slab.slab_step: the LUT sigmoid bin index and log-loss must not
    # run in bf16.
    dt = jnp.float32

    if dedup_block:
        from word2bits_tpu.ops.scatter import scatter_add_dedup

        def scat(tab, ids, rows):
            return scatter_add_dedup(tab, ids, rows.astype(tab.dtype),
                                     dedup_block)
    else:
        def scat(tab, ids, rows):
            return tab.at[ids].add(rows.astype(tab.dtype))

    slab_ids = jnp.maximum(inputs.slab_tokens, 0)
    centers = slab_ids[W:W + B]
    u_slab = u[slab_ids].astype(dt)                       # [B+2W, D]
    q_slab = quantize(u_slab, bl)

    offsets, mask, valid = _context_masks(inputs, B, W)
    mf = (mask & valid[:, None]).astype(dt)               # [B, 2W]
    # pair input rows via shifted slices: q_in[b, oi] = q_slab[W+b+o]
    q_in = jnp.stack([q_slab[W + o:W + o + B] for o in offsets], axis=1)  # [B,2W,D]
    u_in = jnp.stack([u_slab[W + o:W + o + B] for o in offsets], axis=1)

    two_ar = 2.0 * alpha * reg

    # --- positive (center) target per pair ---
    v_c = v[centers].astype(dt)
    q_vc = quantize(v_c, bl)
    f_pos = jnp.einsum("bod,bd->bo", q_in, q_vc)          # [B, 2W]
    g_pos = (1.0 - sigmoid_lut(f_pos)) * alpha * mf
    # per-pair loss: log sigma(f) - reg(||q_v||^2 + ||q_u||^2); reg == 0
    # is static — skip the squared-norm passes (XLA does not fold 0*x;
    # same guard as the CBOW steps, round 5)
    if reg:
        vc_sq = jnp.sum(q_vc * q_vc, axis=-1)             # [B]
        in_sq = jnp.sum(q_in * q_in, axis=-1)             # [B, 2W]
        pos_reg = reg * (vc_sq[:, None] + in_sq)
    else:
        pos_reg = 0.0
    loss = jnp.sum((jnp.log(sigmoid_exact(f_pos)) - pos_reg) * mf)

    # dv[center] += sum_o g_pos * q_in - 2*alpha*reg*v_c per visit
    pair_cnt = jnp.sum(mf, axis=1)                        # [B]
    dv_center = jnp.einsum("bo,bod->bd", g_pos, q_in) \
        - two_ar * v_c * pair_cnt[:, None]
    # per-pair input-row gradient accumulator
    din = g_pos[..., None] * q_vc[:, None, :]             # [B, 2W, D]

    dv_hot = None
    if dense_hot is not None:
        # exact hot-stratum negatives per (center, offset) PAIR: one
        # [B*2W, H] MXU contraction against all H hot words with weight
        # hot_w[h] = K * P(draw h) (see models/cbow_fused.py); computed
        # from the PRE-update v rows, applied after the sampled scatters
        hot_w = jnp.asarray(dense_hot[1], dt)             # [H]
        H = hot_w.shape[0]
        v_h = v[:H].astype(dt)
        q_vh = quantize(v_h, bl)
        q_in2 = q_in.reshape(B * 2 * W, D)
        f_h = lax.dot_general(q_in2, q_vh, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        c_rep = jnp.broadcast_to(centers[:, None],
                                 (B, 2 * W)).reshape(-1)   # pair centers
        skip_h = jnp.arange(H, dtype=jnp.int32)[None, :] != c_rep[:, None]
        mh = (skip_h.astype(dt) * mf.reshape(-1)[:, None]
              * hot_w[None, :])                            # [B*2W, H]
        g_h = (0.0 - sigmoid_lut(f_h)) * alpha * mh
        hot_reg = (reg * jnp.sum(q_vh * q_vh, axis=-1)[None, :]
                   if reg else 0.0)
        loss = loss + jnp.sum(
            (jnp.log(sigmoid_exact(-f_h)) - hot_reg) * mh)
        din = din + lax.dot_general(
            g_h, q_vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(B, 2 * W, D)
        dv_hot = lax.dot_general(g_h, q_in2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv_hot = dv_hot - two_ar * v_h * jnp.sum(mh, axis=0)[:, None]

    if neg_sharing and neg_sharing > 0:
        G = neg_sharing
        if B % G:
            raise ValueError(f"batch {B} not divisible by neg tile {G}")
        T = B // G
        P = neg_pool if neg_pool and neg_pool > 1 else 1
        negs = inputs.neg_ids                             # [T, P*Kl]
        PK = negs.shape[1]
        v_n = v[negs].astype(dt)
        q_vn = quantize(v_n, bl)                          # [T, P*K, D]
        from word2bits_tpu.models.cbow_slab import (from_tiles, pool_mask,
                                                    to_tiles)
        q_in4 = to_tiles(q_in, T, G).reshape(T, G * 2 * W, D)
        mf4 = to_tiles(mf, T, G)
        centers3 = to_tiles(centers, T, G)
        # MXU: (G*2W, D) x (D, P*K) per tile
        f_neg = lax.dot_general(q_in4, q_vn, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        f_neg = f_neg.reshape(T, G, 2 * W, PK)
        skip = (negs[:, None, :] != centers3[:, :, None])  # [T, G, P*K]
        eligible = skip.astype(dt)
        if P > 1:
            eligible = eligible * pool_mask(G, negs.shape[1] // P, P,
                                            dt)[None]
        m4 = mf4[..., None] * eligible[:, :, None, :]      # [T,G,2W,PK]
        if dense_hot is not None:
            m4 = m4 * jnp.float32(dense_hot[0])
        g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m4
        vn_sq = (jnp.sum(q_vn * q_vn, axis=-1) if reg
                 else None)                                # [T, K]
        loss = loss + jnp.sum(
            (jnp.log(sigmoid_exact(-f_neg))
             - (reg * vn_sq[:, None, None, :] if reg else 0.0)) * m4)
        # dv[neg] += sum_pairs g * q_in - decay per visit
        g2 = g_neg.reshape(T, G * 2 * W, PK)
        dv_neg = lax.dot_general(g2, q_in4, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)  # [T,K,D]
        visits = jnp.sum(m4, axis=(1, 2))                 # [T, K]
        dv_neg = dv_neg - two_ar * v_n * visits[..., None]
        # din += sum_k g * q_vn : (G*2W, K) x (K, D) per tile
        din_neg = lax.dot_general(
            g2, q_vn, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(T, G, 2 * W, D)
        din = din + from_tiles(din_neg, B)
        v = scat(v, centers, dv_center)
        v = scat(v, negs.reshape(-1), dv_neg.reshape(-1, D))
    else:
        negs = inputs.neg_ids                             # [B, K]
        v_n = v[negs].astype(dt)
        q_vn = quantize(v_n, bl)                          # [B, K, D]
        f_neg = jnp.einsum("bod,bkd->bok", q_in, q_vn)
        skip = (negs != centers[:, None])                 # [B, K]
        m3 = mf[..., None] * skip[:, None, :].astype(dt)  # [B, 2W, K]
        if dense_hot is not None:
            m3 = m3 * jnp.float32(dense_hot[0])
        g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m3
        neg_reg = (reg * jnp.sum(q_vn * q_vn, axis=-1)[:, None, :]
                   if reg else 0.0)
        loss = loss + jnp.sum(
            (jnp.log(sigmoid_exact(-f_neg)) - neg_reg) * m3)
        dv_neg = jnp.einsum("bok,bod->bkd", g_neg, q_in)
        visits = jnp.sum(m3, axis=1)                      # [B, K]
        dv_neg = dv_neg - two_ar * v_n * visits[..., None]
        din = din + jnp.einsum("bok,bkd->bod", g_neg, q_vn)
        v = scat(v, centers, dv_center)
        v = scat(v, negs.reshape(-1), dv_neg.reshape(-1, D))

    if dv_hot is not None:
        head = (v[:dv_hot.shape[0]].astype(dt) + dv_hot).astype(v.dtype)
        v = lax.dynamic_update_slice(v, head, (0, 0))

    # --- u updates grouped by slab position ---
    din = din * mf[..., None] - two_ar * u_in * mf[..., None]
    shifted = jnp.stack(
        [jnp.pad(din[:, oi], ((W + o, W - o), (0, 0)))
         for oi, o in enumerate(offsets)])
    du_slab = jnp.sum(shifted, axis=0)
    u = scat(u, slab_ids, du_slab)
    return u, v, loss


def make_skipgram_train_chunk(hyper: CBOWHyper, vocab_size: int,
                              batch_size: int, steps: int,
                              neg_sharing: int = 0, donate: bool = True,
                              dedup_block: int = 0, neg_pool: int = 1,
                              hot_rows: int = 0, dense_hot=None):
    """Same signature as make_slab_train_chunk, skip-gram objective.

    dense_hot = (kc, w_cold, hot_w[H]) with hot_rows = H: alias_prob/
    alias_alias must be the COLD stratum's arrays (sampling/unigram.
    build_stratified_tables); kc cold lanes drawn per pool at offset H."""
    from word2bits_tpu.sampling.unigram import (AliasTable, _alias_draw,
                                                draw_negatives)

    B, W, K = batch_size, hyper.window, hyper.negative
    P = neg_pool if (neg_sharing and neg_pool and neg_pool > 1) else 1
    neg_rows = (batch_size // neg_sharing) if neg_sharing else batch_size

    def one_step(u, v, s, k, tokens, sent_ids, table, scalars):
        k_neg, k_win = jax.random.split(k)
        base = scalars.base0 + s * B
        wca = scalars.wca_start + s.astype(jnp.float32) * scalars.wca_per_step
        alpha = scalars.alpha0 * (1.0 - wca / scalars.denom)
        alpha = jnp.maximum(alpha, scalars.alpha0 * 1e-4)
        slab_tokens = lax.dynamic_slice(tokens, (base - W,), (B + 2 * W,))
        slab_sents = lax.dynamic_slice(sent_ids, (base - W,), (B + 2 * W,))
        shrink = jax.random.randint(k_win, (B,), 0, W, dtype=jnp.int32)
        if dense_hot is not None:
            negs = hot_rows + _alias_draw(
                k_neg, table.prob, table.alias, (neg_rows, P * dense_hot[0]),
                table.prob.shape[0])
        else:
            negs = draw_negatives(k_neg, table, (neg_rows, P * K), vocab_size)
        inputs = SlabInputs(slab_tokens=slab_tokens, slab_sents=slab_sents,
                            shrink=shrink, neg_ids=negs)
        return skipgram_slab_step(u, v, inputs, alpha, hyper, B, neg_sharing,
                                  dedup_block=dedup_block, neg_pool=P,
                                  dense_hot=(None if dense_hot is None else
                                             (dense_hot[1], dense_hot[2])))

    if steps == 1:
        # No-scan capacity path (see models/cbow_fused.py)
        def chunk1(u, v, tokens, sent_ids, alias_prob, alias_alias,
                   scalars, key):
            table = AliasTable(prob=alias_prob, alias=alias_alias)
            k = jax.random.split(key, 1)[0]
            return one_step(u, v, jnp.int32(0), k, tokens, sent_ids,
                            table, scalars)

        return jax.jit(chunk1, donate_argnums=(0, 1) if donate else ())

    def chunk(u, v, tokens, sent_ids, alias_prob, alias_alias, scalars, key):
        table = AliasTable(prob=alias_prob, alias=alias_alias)
        keys = jax.random.split(key, steps)

        def body(carry, xs):
            u, v, loss = carry
            s, k = xs
            u, v, step_loss = one_step(u, v, s, k, tokens, sent_ids,
                                       table, scalars)
            return (u, v, loss + step_loss), None

        xs = (jnp.arange(steps, dtype=jnp.int32), keys)
        (u, v, loss), _ = lax.scan(body, (u, v, jnp.float32(0.0)), xs)
        return u, v, loss

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(chunk, donate_argnums=donate_argnums)
