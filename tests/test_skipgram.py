"""Skip-gram slab step vs a brute-force per-pair transcription."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
from word2bits_tpu.models.cbow_slab import SlabInputs, _context_masks
from word2bits_tpu.models.skipgram import (
    make_skipgram_train_chunk,
    skipgram_slab_step,
)
from tests.test_quantize import ref_quantize_py
from tests.test_sigmoid import build_reference_exp_table, ref_lut_sigmoid
from tests.test_cbow import ref_sigmoid_exact

EXP_TABLE = build_reference_exp_table()


def brute_force(u, v, inputs, alpha, bitlevel, reg, B, W, K, neg_sharing):
    """Per-pair sequential evaluation of the documented skip-gram equations,
    with all reads stale (batch semantics)."""
    import math
    u0, v0 = u.copy(), v.copy()
    du = np.zeros_like(u)
    dv = np.zeros_like(v)
    q = np.vectorize(lambda x: ref_quantize_py(float(x), bitlevel))
    toks = np.maximum(np.asarray(inputs.slab_tokens), 0)
    offsets, mask, valid = _context_masks(inputs, B, W)
    mask = np.asarray(mask)
    negs = np.asarray(inputs.neg_ids)
    loss = 0.0
    two_ar = 2 * alpha * reg
    for b in range(B):
        center = toks[W + b]
        if neg_sharing:
            my_negs = negs[b % (B // neg_sharing)]  # strided tile assignment
        else:
            my_negs = negs[b]
        for oi, o in enumerate(offsets):
            if not mask[b, oi]:
                continue
            p = W + b + o
            qu = q(u0[toks[p]]).astype(np.float64)
            neu1e = np.zeros_like(qu)
            for d in range(K + 1):
                if d == 0:
                    t, label = center, 1.0
                else:
                    t = my_negs[d - 1]
                    if t == center:
                        continue
                    label = 0.0
                qv = q(v0[t]).astype(np.float64)
                f = float(qu @ qv)
                g = (label - ref_lut_sigmoid(f, EXP_TABLE)) * alpha
                sf = f if label else -f
                extra = reg * float(qu @ qu) if d == 0 else 0.0
                loss += math.log(ref_sigmoid_exact(sf)) - reg * float(qv @ qv) - extra
                neu1e += g * qv
                dv[t] += g * qu - two_ar * v0[t]
            du[toks[p]] += neu1e - two_ar * u0[toks[p]]
    return u0 + du, v0 + dv, loss


def _setup(seed=0, B=16, W=2, K=3, V=30, D=8, shared=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    toks = rng.integers(1, V, B + 2 * W).astype(np.int32)
    sents = np.sort(rng.integers(0, 3, B + 2 * W)).astype(np.int32)
    shrink = rng.integers(0, W, B).astype(np.int32)
    rows = B // shared if shared else B
    negs = rng.integers(1, V, (rows, K)).astype(np.int32)
    inputs = SlabInputs(slab_tokens=jnp.asarray(toks),
                        slab_sents=jnp.asarray(sents),
                        shrink=jnp.asarray(shrink),
                        neg_ids=jnp.asarray(negs))
    return u, v, inputs


@pytest.mark.parametrize("bitlevel,reg,shared", [(1, 0.0, 0), (0, 0.01, 0),
                                                 (1, 0.005, 4)])
def test_skipgram_matches_bruteforce(bitlevel, reg, shared):
    B, W, K = 16, 2, 3
    u, v, inputs = _setup(B=B, W=W, K=K, shared=shared)
    hyper = CBOWHyper(bitlevel=bitlevel, size=8, window=W, negative=K, reg=reg)
    u1, v1, loss1 = skipgram_slab_step(
        jnp.asarray(u), jnp.asarray(v), inputs, jnp.float32(0.05), hyper, B,
        neg_sharing=shared)
    u2, v2, loss2 = brute_force(u, v, inputs, 0.05, bitlevel, reg, B, W, K,
                                shared)
    np.testing.assert_allclose(np.asarray(u1), u2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), v2, atol=1e-5)
    np.testing.assert_allclose(float(loss1), loss2, rtol=1e-4, atol=1e-4)


def test_skipgram_chunk_learns():
    from word2bits_tpu.data.pipeline import build_epoch_arrays
    from word2bits_tpu.sampling.unigram import build_alias_table

    rng = np.random.default_rng(0)
    V, D, B, S, W, K = 50, 16, 32, 10, 2, 4
    pairs = rng.integers(1, V // 2, size=3000)
    enc = np.stack([2 * pairs, 2 * pairs + 1], 1).reshape(-1).astype(np.int32)
    counts = np.bincount(enc, minlength=V).astype(np.int64)
    ep = build_epoch_arrays(enc, counts, 0.0, int(counts.sum()), W,
                            np.random.default_rng(1))
    hyper = CBOWHyper(bitlevel=0, size=D, window=W, negative=K)
    table = build_alias_table(np.maximum(counts, 1) ** 0.75)
    chunk = make_skipgram_train_chunk(hyper, V, B, S, donate=False)
    u = jnp.asarray(rng.uniform(-0.05, 0.05, (V, D)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-0.05, 0.05, (V, D)).astype(np.float32))
    sc = ChunkScalars(base0=jnp.int32(ep.halo), alpha0=jnp.float32(0.05),
                      wca_start=jnp.float32(0), wca_per_step=jnp.float32(0),
                      denom=jnp.float32(1e9))
    losses = []
    for i in range(8):
        u, v, loss = chunk(u, v, jnp.asarray(ep.tokens),
                           jnp.asarray(ep.sent_ids), table.prob, table.alias,
                           sc, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] > losses[0], losses


def test_skipgram_neg_pool_equals_percenter():
    """neg_pool=G gives every center a private K-column pool: must equal
    per-center mode with those pools unpacked by strided tile position."""
    B, W, K, G = 16, 2, 3, 4
    T = B // G
    u, v, inputs = _setup(B=B, W=W, K=K)
    hyper = CBOWHyper(bitlevel=1, size=8, window=W, negative=K, reg=0.005)
    alpha = jnp.float32(0.05)

    rng = np.random.default_rng(21)
    negs_pool = rng.integers(1, 30, (T, G * K)).astype(np.int32)
    u1, v1, loss1 = skipgram_slab_step(
        jnp.asarray(u), jnp.asarray(v),
        inputs._replace(neg_ids=jnp.asarray(negs_pool)),
        alpha, hyper, B, neg_sharing=G, neg_pool=G)

    negs_full = np.stack([
        negs_pool[b % T, (b // T) * K:(b // T + 1) * K] for b in range(B)])
    u2, v2, loss2 = skipgram_slab_step(
        jnp.asarray(u), jnp.asarray(v),
        inputs._replace(neg_ids=jnp.asarray(negs_full)),
        alpha, hyper, B, neg_sharing=0)

    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)


def test_skipgram_dense_hot_equals_weighted_expectation_oracle():
    """Skip-gram dense-hot == exact weighted sum over every hot word.

    Same additivity argument as the CBOW oracle (tests/test_cbow_fused.py):
    with per-center lanes (neg_sharing=0, K=1) a negative equal to the
    center is fully masked, so single-lane steps give exact per-negative
    deltas that must sum (with hot_w / w_cold weights) to the dense step."""
    B, W, V, D, H = 8, 2, 30, 8, 10
    rng = np.random.default_rng(23)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    toks = rng.integers(-1, V, B + 2 * W).astype(np.int32)
    sents = np.sort(rng.integers(0, 3, B + 2 * W)).astype(np.int32)
    shrink = rng.integers(0, W, B).astype(np.int32)
    alpha = jnp.float32(0.07)
    centers = np.maximum(toks[W:W + B], 0)

    def plain(neg_col):
        inp = SlabInputs(slab_tokens=jnp.asarray(toks),
                         slab_sents=jnp.asarray(sents),
                         shrink=jnp.asarray(shrink),
                         neg_ids=jnp.asarray(neg_col.reshape(B, 1)))
        h1 = CBOWHyper(bitlevel=1, size=D, window=W, negative=1, reg=0.01)
        u2, v2, loss = skipgram_slab_step(jnp.asarray(u), jnp.asarray(v),
                                          inp, alpha, h1, B, 0)
        return (np.asarray(u2, np.float64), np.asarray(v2, np.float64),
                float(loss))

    ub, vb, lb = plain(centers)  # all lanes masked (skip-center)
    kc, w_cold = 2, 1.21
    hot_w = (0.05 + rng.uniform(0, 0.3, H)).astype(np.float32)
    hot_w[0] = 0.0
    cold_draws = rng.integers(H, V, (B, kc)).astype(np.int32)

    wu, wv, wl = ub.copy(), vb.copy(), lb
    for h in range(1, H):
        u2, v2, l2 = plain(np.full(B, h, np.int32))
        wu += hot_w[h] * (u2 - ub)
        wv += hot_w[h] * (v2 - vb)
        wl += hot_w[h] * (l2 - lb)
    for j in range(kc):
        u2, v2, l2 = plain(cold_draws[:, j])
        wu += w_cold * (u2 - ub)
        wv += w_cold * (v2 - vb)
        wl += w_cold * (l2 - lb)

    inp = SlabInputs(slab_tokens=jnp.asarray(toks),
                     slab_sents=jnp.asarray(sents),
                     shrink=jnp.asarray(shrink),
                     neg_ids=jnp.asarray(cold_draws))
    hk = CBOWHyper(bitlevel=1, size=D, window=W, negative=kc, reg=0.01)
    gu, gv, gl = skipgram_slab_step(jnp.asarray(u), jnp.asarray(v), inp,
                                    alpha, hk, B, 0,
                                    dense_hot=(w_cold, hot_w))
    np.testing.assert_allclose(np.asarray(gu), wu, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gv), wv, atol=2e-5)
    np.testing.assert_allclose(float(gl), wl, rtol=1e-4)


def test_skipgram_dense_hot_trains(tmp_path):
    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.train import train
    from tests.test_integration import _make_corpus

    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=120)
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=str(tmp_path / "v.bin"), binary=True,
        bitlevel=1, size=16, window=2, negative=6, iter=3, min_count=1,
        batch_size=32, steps_per_chunk=4, model="skipgram",
        hot_rows=8, neg_dense_hot=True, debug=0)
    result = train(cfg)
    assert result.epoch_losses[-1] > result.epoch_losses[0]
