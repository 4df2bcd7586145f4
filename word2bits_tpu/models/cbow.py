"""CBOW + negative sampling with virtual quantization: the training core.

TPU-native re-design of the reference Hogwild hot loop
(reference src/word2bits.cpp:363-516): the per-thread, per-word racy SGD
update becomes a synchronous minibatched step — a batch of B centers is
assembled from consecutive corpus positions, context/target rows are gathered,
quantized in the forward pass, scored against 1+K targets, and the
hand-derived reference gradients are applied via scatter-add.  Hogwild's
lost-update races become within-batch gradient accumulation; convergence
parity is validated by analogy accuracy (SURVEY.md section 7).

Reference math preserved exactly (per step, given the same batch):
  * context_avg = mean over context words of quantize(u[w])
    (reference :438-449)
  * f_d = context_avg . quantize(v[target_d]); g_d = (label - sigma_LUT(f)) * alpha
    with the +-6-saturated 83-bins-per-unit LUT (reference :464-475)
  * negative target == center is *skipped* (not resampled), shrinking the
    effective negative count (reference :458)
  * v[target] += g * context_avg - 2*alpha*reg*v[target]   (reference :489-491)
  * u[ctx]    += sum_d g_d * quantize(v[target_d]) - 2*alpha*reg*u[ctx]
    — NOT divided by the context count (reference :494-503)
  * loss = sum_d log sigma_exact(+-f_d) - reg*||quantize(v_d)||^2
           - reg*||quantize(u_ctx)||^2 per context word (reference :437-445,
    :480-484)
  * linear LR decay over the whole run with floor 1e-4*alpha0
    (reference :391-392)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from word2bits_tpu.ops.quantize import quantize
from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut


@dataclass(frozen=True)
class CBOWHyper:
    """Static (trace-time) hyperparameters."""

    bitlevel: int = 1
    size: int = 100
    window: int = 5
    negative: int = 5
    reg: float = 0.0

    def __post_init__(self):
        if self.bitlevel == 3:
            raise ValueError("bitlevel 3 is a reference quantizer hole; rejected")


class Batch(NamedTuple):
    """An assembled CBOW minibatch with static shapes."""

    centers: jax.Array    # int32 [B] (clamped to valid ids; see valid)
    ctx_ids: jax.Array    # int32 [B, 2W]
    ctx_mask: jax.Array   # bool  [B, 2W] — in-sentence, in-shrunk-window, valid
    neg_ids: jax.Array    # int32 [B, K]
    valid: jax.Array      # bool  [B] — center is a real (non-pad) token


def _context_stats(u, batch: Batch, hyper: CBOWHyper):
    """Gather + quantize context rows; masked mean and reg loss."""
    u_rows = u[batch.ctx_ids]                       # [B, 2W, D]
    q_rows = quantize(u_rows, hyper.bitlevel)
    m = batch.ctx_mask[..., None].astype(u.dtype)   # [B, 2W, 1]
    csum = jnp.sum(q_rows * m, axis=1)              # [B, D]
    cw = jnp.sum(batch.ctx_mask, axis=1).astype(u.dtype)  # [B]
    active = batch.valid & (cw > 0)
    context_avg = csum / jnp.maximum(cw, 1.0)[:, None]
    # -reg * ||quantize(u_ctx)||^2 accrues per processed context word
    # (reference :437-445)
    ctx_reg = jnp.sum(jnp.sum(q_rows * q_rows, axis=-1) * batch.ctx_mask, axis=1)
    return u_rows, context_avg, cw, active, ctx_reg


def _negative_stats(v, batch: Batch, context_avg, active, alpha, hyper: CBOWHyper):
    """Score center + negatives; reference g/loss math."""
    B = batch.centers.shape[0]
    targets = jnp.concatenate([batch.centers[:, None], batch.neg_ids], axis=1)  # [B, K+1]
    labels = jnp.zeros_like(targets, dtype=v.dtype).at[:, 0].set(1.0)
    # skip-quirk: negatives equal to the center are masked out entirely
    dmask = jnp.concatenate(
        [jnp.ones((B, 1), dtype=bool), batch.neg_ids != batch.centers[:, None]],
        axis=1,
    ) & active[:, None]

    v_rows = v[targets]                              # [B, K+1, D]
    q_v = quantize(v_rows, hyper.bitlevel)
    f = jnp.einsum("bd,bkd->bk", context_avg, q_v)   # [B, K+1]
    g = (labels - sigmoid_lut(f)) * alpha * dmask.astype(v.dtype)

    # loss: log sigma(f * (-1)^(1-label)) - reg*||q_v||^2, masked
    signed_f = jnp.where(labels > 0, f, -f)
    v_reg = hyper.reg * jnp.sum(q_v * q_v, axis=-1)
    step_loss = (jnp.log(sigmoid_exact(signed_f)) - v_reg) * dmask.astype(v.dtype)
    return targets, v_rows, q_v, g, dmask, jnp.sum(step_loss)


def cbow_minibatch_update(u, v, batch: Batch, alpha, hyper: CBOWHyper):
    """One synchronous SGD step. Returns (u, v, loss)."""
    u_rows, context_avg, cw, active, ctx_reg = _context_stats(u, batch, hyper)
    targets, v_rows, q_v, g, dmask, nloss = _negative_stats(
        v, batch, context_avg, active, alpha, hyper)

    D = u.shape[1]
    two_ar = 2.0 * alpha * hyper.reg

    # v[target] += g*context_avg - 2*alpha*reg*v[target]  (reference :489-491)
    dv = g[..., None] * context_avg[:, None, :] - two_ar * v_rows * dmask[..., None]
    v = v.at[targets.reshape(-1)].add(dv.reshape(-1, D))

    # context_avge = sum_d g_d * quantize(v[target_d])  (reference :486-488)
    context_avge = jnp.einsum("bk,bkd->bd", g, q_v)

    # u[ctx] += context_avge - 2*alpha*reg*u[ctx], NOT divided by cw
    # (reference :494-503)
    cm = (batch.ctx_mask & active[:, None])[..., None].astype(u.dtype)
    du = (context_avge[:, None, :] - two_ar * u_rows) * cm
    u = u.at[batch.ctx_ids.reshape(-1)].add(du.reshape(-1, D))

    loss = nloss - hyper.reg * jnp.sum(ctx_reg * active.astype(u.dtype))
    return u, v, loss


def cbow_forward_scores(u, v, batch: Batch, hyper: CBOWHyper):
    """Forward pass only: (scores f [B, K+1], loss). Jittable; used by the
    eval/entry paths."""
    _, context_avg, _, active, ctx_reg = _context_stats(u, batch, hyper)
    _, _, _, _, _, nloss = _negative_stats(
        v, batch, context_avg, active, jnp.asarray(1.0, u.dtype), hyper)
    targets = jnp.concatenate([batch.centers[:, None], batch.neg_ids], axis=1)
    q_v = quantize(v[targets], hyper.bitlevel)
    f = jnp.einsum("bd,bkd->bk", context_avg, q_v)
    loss = nloss - hyper.reg * jnp.sum(ctx_reg * active.astype(u.dtype))
    return f, loss


# ---------------------------------------------------------------------------
# Batch assembly from epoch arrays (device-side)
# ---------------------------------------------------------------------------

def assemble_batch(tokens, sent_ids, base, key, neg_ids,
                   batch_size: int, window: int) -> Batch:
    """Build a Batch from `batch_size` consecutive centers at padded-array
    offset `base`.  Implements window sampling with uniform shrink
    b in [0, window) (reference src/word2bits.cpp:428-434): effective
    half-width is window - b, and context never crosses sentence boundaries.
    """
    B, W = batch_size, window
    sl = lax.dynamic_slice(tokens, (base - W,), (B + 2 * W,))
    ss = lax.dynamic_slice(sent_ids, (base - W,), (B + 2 * W,))
    centers = sl[W:W + B]
    csent = ss[W:W + B]

    offsets = [o for o in range(-W, W + 1) if o != 0]
    ctx_ids = jnp.stack([sl[W + o:W + o + B] for o in offsets], axis=1)   # [B, 2W]
    ctx_sent = jnp.stack([ss[W + o:W + o + B] for o in offsets], axis=1)

    b = jax.random.randint(key, (B,), 0, W, dtype=jnp.int32)  # shrink (reference :429)
    half = (W - b)[:, None]                                   # [B, 1]
    odist = jnp.abs(jnp.asarray(offsets, dtype=jnp.int32))[None, :]
    in_window = odist <= half

    valid = csent >= 0
    mask = in_window & (ctx_sent == csent[:, None]) & valid[:, None] & (ctx_sent >= 0)
    return Batch(
        centers=jnp.maximum(centers, 0),
        ctx_ids=jnp.maximum(ctx_ids, 0),
        ctx_mask=mask,
        neg_ids=neg_ids,
        valid=valid,
    )


# ---------------------------------------------------------------------------
# Chunked training: a lax.scan over S steps inside one jit
# ---------------------------------------------------------------------------

class ChunkScalars(NamedTuple):
    """Traced per-chunk scalars (LR schedule state, reference :379-393)."""

    base0: jax.Array         # int32 — padded-array offset of the chunk's first center
    alpha0: jax.Array        # f32 — starting_alpha
    wca_start: jax.Array     # f32 — word_count_actual at chunk start
    wca_per_step: jax.Array  # f32 — words consumed per step (B * train_words/centers)
    denom: jax.Array         # f32 — iter * train_words + 1


def make_train_chunk(hyper: CBOWHyper, vocab_size: int, batch_size: int,
                     steps: int, donate: bool = True):
    """Returns a jitted chunk(u, v, tokens, sent_ids, alias_prob, alias_alias,
    scalars, key) -> (u, v, loss_sum) running `steps` synchronous minibatch
    updates under one lax.scan."""
    from word2bits_tpu.sampling.unigram import AliasTable, draw_negatives

    B, W, K = batch_size, hyper.window, hyper.negative

    def chunk(u, v, tokens, sent_ids, alias_prob, alias_alias, scalars, key):
        table = AliasTable(prob=alias_prob, alias=alias_alias)
        keys = jax.random.split(key, steps)

        def body(carry, xs):
            u, v, loss = carry
            s, k = xs
            k_neg, k_win = jax.random.split(k)
            base = scalars.base0 + s * B
            # linear LR decay with 1e-4 floor (reference :391-392)
            wca = scalars.wca_start + s.astype(jnp.float32) * scalars.wca_per_step
            alpha = scalars.alpha0 * (1.0 - wca / scalars.denom)
            alpha = jnp.maximum(alpha, scalars.alpha0 * 1e-4)

            neg = draw_negatives(k_neg, table, (B, K), vocab_size)
            batch = assemble_batch(tokens, sent_ids, base, k_win, neg, B, W)
            u, v, step_loss = cbow_minibatch_update(u, v, batch, alpha, hyper)
            return (u, v, loss + step_loss), None

        xs = (jnp.arange(steps, dtype=jnp.int32), keys)
        (u, v, loss), _ = lax.scan(body, (u, v, jnp.float32(0.0)), xs)
        return u, v, loss

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(chunk, donate_argnums=donate_argnums)
