"""The training core vs a Python transcription of the reference hot loop
(reference src/word2bits.cpp:424-504).

With B=1 and distinct targets there is no within-batch staleness, so the
batched step must match the sequential reference update to float tolerance.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import (
    Batch,
    CBOWHyper,
    assemble_batch,
    cbow_minibatch_update,
    make_train_chunk,
)
from tests.test_quantize import ref_quantize_py
from tests.test_sigmoid import build_reference_exp_table, ref_lut_sigmoid

EXP_TABLE = build_reference_exp_table()


def ref_sigmoid_exact(val):
    if val > 6:
        return 1.0
    if val < -6:
        return 1e-9
    return 1.0 / (1.0 + math.exp(-val))


def reference_update(u, v, center, ctx, targets_labels, alpha, bitlevel, reg):
    """Sequential reference math for one center word. targets_labels is the
    (target, label) list after the skip-quirk filtering."""
    u = u.copy()
    v = v.copy()
    D = u.shape[1]
    q = lambda x: ref_quantize_py(float(x), bitlevel)
    loss = 0.0

    context_avg = np.zeros(D, dtype=np.float64)
    for w in ctx:
        qu = np.asarray([q(u[w, c]) for c in range(D)])
        context_avg += qu
        loss += -reg * float(qu @ qu)
    cw = len(ctx)
    if cw == 0:
        return u, v, loss
    context_avg /= cw

    context_avge = np.zeros(D, dtype=np.float64)
    for target, label in targets_labels:
        qv = np.asarray([q(v[target, c]) for c in range(D)])
        f = float(context_avg @ qv)
        local_reg = reg * float(qv @ qv)
        g = (label - ref_lut_sigmoid(f, EXP_TABLE)) * alpha
        dot = f * ((-1.0) ** (1 - label))
        loss += math.log(ref_sigmoid_exact(dot)) - local_reg
        context_avge += g * qv
        v[target] += (g * context_avg - 2 * alpha * reg * v[target]).astype(v.dtype)
    for w in ctx:
        u[w] += (context_avge - 2 * alpha * reg * u[w]).astype(u.dtype)
    return u, v, loss


def _mk_params(V, D, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    return u, v


def _single_batch(center, ctx, negs, W=3):
    B = 1
    ctx_ids = np.zeros((B, 2 * W), np.int32)
    ctx_mask = np.zeros((B, 2 * W), bool)
    for i, c in enumerate(ctx):
        ctx_ids[0, i] = c
        ctx_mask[0, i] = True
    return Batch(
        centers=jnp.asarray([center], jnp.int32),
        ctx_ids=jnp.asarray(ctx_ids),
        ctx_mask=jnp.asarray(ctx_mask),
        neg_ids=jnp.asarray([negs], jnp.int32),
        valid=jnp.asarray([True]),
    )


@pytest.mark.parametrize("bitlevel,reg", [(0, 0.0), (1, 0.0), (2, 0.0),
                                          (1, 0.01), (4, 0.001)])
def test_minibatch_matches_reference_sequential(bitlevel, reg):
    V, D = 20, 16
    u, v = _mk_params(V, D)
    center, ctx, negs = 3, [1, 2, 5], [7, 9, 11]
    alpha = 0.05
    hyper = CBOWHyper(bitlevel=bitlevel, size=D, window=3, negative=3, reg=reg)
    batch = _single_batch(center, ctx, negs)

    u2, v2, loss = cbow_minibatch_update(
        jnp.asarray(u), jnp.asarray(v), batch, jnp.float32(alpha), hyper)

    tl = [(center, 1)] + [(t, 0) for t in negs]
    ru, rv, rloss = reference_update(u, v, center, ctx, tl, alpha, bitlevel, reg)

    np.testing.assert_allclose(np.asarray(u2), ru, atol=2e-6)
    np.testing.assert_allclose(np.asarray(v2), rv, atol=2e-6)
    np.testing.assert_allclose(float(loss), rloss, atol=1e-4)


def test_negative_equal_center_is_skipped():
    """reference :458 — target == center contributes nothing."""
    V, D = 10, 8
    u, v = _mk_params(V, D)
    hyper = CBOWHyper(bitlevel=1, size=D, window=2, negative=2, reg=0.0)
    center, ctx = 4, [1, 2]

    b_skip = _single_batch(center, ctx, [center, 7], W=2)
    u2, v2, loss2 = cbow_minibatch_update(
        jnp.asarray(u), jnp.asarray(v), b_skip, jnp.float32(0.05), hyper)

    tl = [(center, 1), (7, 0)]  # the center-negative dropped
    ru, rv, rloss = reference_update(u, v, center, ctx, tl, 0.05, 1, 0.0)
    np.testing.assert_allclose(np.asarray(u2), ru, atol=2e-6)
    np.testing.assert_allclose(np.asarray(v2), rv, atol=2e-6)
    np.testing.assert_allclose(float(loss2), rloss, atol=1e-4)


def test_no_context_no_update():
    """cw == 0: the reference skips everything (reference :448)."""
    V, D = 10, 8
    u, v = _mk_params(V, D)
    hyper = CBOWHyper(bitlevel=1, size=D, window=2, negative=2)
    batch = _single_batch(3, [], [5, 6], W=2)
    u2, v2, loss = cbow_minibatch_update(
        jnp.asarray(u), jnp.asarray(v), batch, jnp.float32(0.05), hyper)
    np.testing.assert_array_equal(np.asarray(u2), u)
    np.testing.assert_array_equal(np.asarray(v2), v)
    assert float(loss) == 0.0


def test_invalid_center_no_update():
    V, D = 10, 8
    u, v = _mk_params(V, D)
    hyper = CBOWHyper(bitlevel=1, size=D, window=2, negative=2)
    b = _single_batch(3, [1, 2], [5, 6], W=2)
    b = b._replace(valid=jnp.asarray([False]))
    u2, v2, loss = cbow_minibatch_update(
        jnp.asarray(u), jnp.asarray(v), b, jnp.float32(0.05), hyper)
    np.testing.assert_array_equal(np.asarray(u2), u)
    np.testing.assert_array_equal(np.asarray(v2), v)
    assert float(loss) == 0.0


def test_assemble_batch_sentence_and_shrink():
    W, B = 3, 4
    # padded arrays with halo 3: tokens [pad*3, 10, 11, 12, 20, 21, 22, pad...]
    toks = np.full(16, -1, np.int32)
    sents = np.full(16, -1, np.int32)
    toks[3:9] = [10, 11, 12, 20, 21, 22]
    sents[3:9] = [0, 0, 0, 1, 1, 1]
    batch = assemble_batch(jnp.asarray(toks), jnp.asarray(sents),
                           jnp.int32(3 + 1), jax.random.PRNGKey(0),
                           jnp.zeros((B, 2), jnp.int32), B, W)
    m = np.asarray(batch.ctx_mask)
    ids = np.asarray(batch.ctx_ids)
    centers = np.asarray(batch.centers)
    np.testing.assert_array_equal(centers, [11, 12, 20, 21])
    # center 11 (sentence 0) must never see tokens of sentence 1
    row = 0
    for j in range(2 * W):
        if m[row, j]:
            assert ids[row, j] in (10, 12)
    # center 20 (sentence 1) must never see sentence 0
    row = 2
    for j in range(2 * W):
        if m[row, j]:
            assert ids[row, j] in (21, 22)
    # valid flags
    np.testing.assert_array_equal(np.asarray(batch.valid), [True] * 4)


def test_assemble_batch_padding_invalid():
    W, B = 2, 4
    toks = np.full(12, -1, np.int32)
    sents = np.full(12, -1, np.int32)
    toks[2:5] = [5, 6, 7]
    sents[2:5] = [0, 0, 0]
    batch = assemble_batch(jnp.asarray(toks), jnp.asarray(sents),
                           jnp.int32(2 + 1), jax.random.PRNGKey(0),
                           jnp.zeros((B, 1), jnp.int32), B, W)
    valid = np.asarray(batch.valid)
    np.testing.assert_array_equal(valid, [True, True, False, False])
    m = np.asarray(batch.ctx_mask)
    assert not m[2].any() and not m[3].any()


def test_train_chunk_loss_improves():
    """Smoke: a few chunks of training on a toy corpus reduce the NS loss."""
    from word2bits_tpu.models.cbow import ChunkScalars
    from word2bits_tpu.sampling.unigram import build_alias_table

    rng = np.random.default_rng(0)
    V, D, B, S, W, K = 50, 16, 32, 20, 2, 3
    # toy corpus: structured co-occurrence (pairs 2i, 2i+1 adjacent)
    base_pairs = rng.integers(1, V // 2, size=2000)
    enc = np.stack([2 * base_pairs, 2 * base_pairs + 1], 1).reshape(-1).astype(np.int32)
    counts = np.bincount(enc, minlength=V).astype(np.int64)

    from word2bits_tpu.data.pipeline import build_epoch_arrays
    ep = build_epoch_arrays(enc, counts, 0.0, int(counts.sum()), W,
                            np.random.default_rng(1))

    hyper = CBOWHyper(bitlevel=0, size=D, window=W, negative=K)
    table = build_alias_table(np.maximum(counts, 1) ** 0.75)
    chunk = make_train_chunk(hyper, V, B, S, donate=False)

    u, v = _mk_params(V, D, seed=2)
    u, v = jnp.asarray(u) * 0.1, jnp.asarray(v) * 0.1
    scalars = ChunkScalars(
        base0=jnp.int32(ep.halo), alpha0=jnp.float32(0.1),
        wca_start=jnp.float32(0), wca_per_step=jnp.float32(0),
        denom=jnp.float32(1e9))

    losses = []
    for i in range(6):
        u, v, loss = chunk(u, v, jnp.asarray(ep.tokens), jnp.asarray(ep.sent_ids),
                           table.prob, table.alias, scalars,
                           jax.random.PRNGKey(i))
        losses.append(float(loss))
    # NS log-likelihood loss (negated) should increase (less negative)
    assert losses[-1] > losses[0], losses
