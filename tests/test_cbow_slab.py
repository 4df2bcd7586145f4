"""Slab-formulation step == reference-shaped step, numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import (
    Batch,
    CBOWHyper,
    ChunkScalars,
    cbow_minibatch_update,
)
from word2bits_tpu.models.cbow_slab import (
    SlabInputs,
    _context_masks,
    make_slab_train_chunk,
    slab_step,
)


def _setup(seed=0, B=32, W=3, K=4, V=50, D=16):
    rng = np.random.default_rng(seed)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    # slab with sentence structure and some padding at the end
    toks = rng.integers(1, V, B + 2 * W).astype(np.int32)
    sents = np.sort(rng.integers(0, 4, B + 2 * W)).astype(np.int32)
    toks[-2:] = -1
    sents[-2:] = -1
    shrink = rng.integers(0, W, B).astype(np.int32)
    negs = rng.integers(1, V, (B, K)).astype(np.int32)
    inputs = SlabInputs(
        slab_tokens=jnp.asarray(toks), slab_sents=jnp.asarray(sents),
        shrink=jnp.asarray(shrink), neg_ids=jnp.asarray(negs))
    return u, v, inputs


def _equivalent_batch(inputs: SlabInputs, B, W):
    """Build the per-(center,ctx) Batch matching the slab inputs."""
    offsets, mask, valid = _context_masks(inputs, B, W)
    toks = jnp.maximum(inputs.slab_tokens, 0)
    ctx_ids = jnp.stack([toks[W + o:W + o + B] for o in offsets], axis=1)
    return Batch(centers=toks[W:W + B], ctx_ids=ctx_ids,
                 ctx_mask=mask, neg_ids=inputs.neg_ids, valid=valid)


@pytest.mark.parametrize("bitlevel,reg", [(1, 0.0), (0, 0.01), (2, 0.001),
                                          (4, 0.001)])
def test_slab_equals_reference_shaped(bitlevel, reg):
    B, W, K = 32, 3, 4
    u, v, inputs = _setup(B=B, W=W, K=K)
    hyper = CBOWHyper(bitlevel=bitlevel, size=16, window=W, negative=K, reg=reg)
    alpha = jnp.float32(0.05)

    u1, v1, loss1 = cbow_minibatch_update(
        jnp.asarray(u), jnp.asarray(v), _equivalent_batch(inputs, B, W),
        alpha, hyper)
    u2, v2, loss2 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                              hyper, B, neg_sharing=0)

    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4, atol=1e-4)


def test_shared_negatives_matches_expanded():
    """neg_sharing=G must equal per-center mode with tile-broadcast negatives."""
    B, W, K, G = 32, 3, 4, 8
    u, v, inputs = _setup(B=B, W=W, K=K)
    hyper = CBOWHyper(bitlevel=1, size=16, window=W, negative=K, reg=0.01)
    alpha = jnp.float32(0.05)

    rng = np.random.default_rng(7)
    negs_shared = rng.integers(1, 50, (B // G, K)).astype(np.int32)
    shared_inputs = inputs._replace(neg_ids=jnp.asarray(negs_shared))
    u1, v1, loss1 = slab_step(jnp.asarray(u), jnp.asarray(v), shared_inputs,
                              alpha, hyper, B, neg_sharing=G)

    # expand: strided tiling — center b belongs to tile b % T
    negs_full = np.tile(negs_shared, (G, 1))
    full_inputs = inputs._replace(neg_ids=jnp.asarray(negs_full))
    u2, v2, loss2 = slab_step(jnp.asarray(u), jnp.asarray(v), full_inputs,
                              alpha, hyper, B, neg_sharing=0)

    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)


def test_slab_chunk_runs_and_learns():
    from word2bits_tpu.data.pipeline import build_epoch_arrays
    from word2bits_tpu.sampling.unigram import build_alias_table

    rng = np.random.default_rng(0)
    V, D, B, S, W, K, G = 50, 16, 32, 10, 2, 4, 8
    pairs = rng.integers(1, V // 2, size=3000)
    enc = np.stack([2 * pairs, 2 * pairs + 1], 1).reshape(-1).astype(np.int32)
    counts = np.bincount(enc, minlength=V).astype(np.int64)
    ep = build_epoch_arrays(enc, counts, 0.0, int(counts.sum()), W,
                            np.random.default_rng(1))
    hyper = CBOWHyper(bitlevel=0, size=D, window=W, negative=K)
    table = build_alias_table(np.maximum(counts, 1) ** 0.75)

    for sharing in (0, G):
        chunk = make_slab_train_chunk(hyper, V, B, S, neg_sharing=sharing,
                                      donate=False)
        u = jnp.asarray(rng.uniform(-0.05, 0.05, (V, D)).astype(np.float32))
        v = jnp.asarray(rng.uniform(-0.05, 0.05, (V, D)).astype(np.float32))
        sc = ChunkScalars(base0=jnp.int32(ep.halo), alpha0=jnp.float32(0.1),
                          wca_start=jnp.float32(0), wca_per_step=jnp.float32(0),
                          denom=jnp.float32(1e9))
        losses = []
        for i in range(8):
            u, v, loss = chunk(u, v, jnp.asarray(ep.tokens),
                               jnp.asarray(ep.sent_ids), table.prob,
                               table.alias, sc, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] > losses[0], (sharing, losses)


def test_slab_chunk_equals_reference_chunk():
    """The slab chunk and the original chunk draw identical randomness, so
    they must produce identical trajectories (per-center mode)."""
    from word2bits_tpu.data.pipeline import build_epoch_arrays
    from word2bits_tpu.models.cbow import make_train_chunk
    from word2bits_tpu.sampling.unigram import build_alias_table

    rng = np.random.default_rng(3)
    V, D, B, S, W, K = 40, 8, 16, 6, 2, 3
    enc = rng.integers(1, V, 600).astype(np.int32)
    enc[::37] = 0  # sprinkle sentence breaks
    counts = np.bincount(enc, minlength=V).astype(np.int64)
    ep = build_epoch_arrays(enc, counts, 0.0, int(counts.sum()), W,
                            np.random.default_rng(1))
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.005)
    table = build_alias_table(np.maximum(counts, 1) ** 0.75)
    sc = ChunkScalars(base0=jnp.int32(ep.halo), alpha0=jnp.float32(0.05),
                      wca_start=jnp.float32(0), wca_per_step=jnp.float32(100),
                      denom=jnp.float32(1e6))

    u0 = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v0 = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    args = (jnp.asarray(ep.tokens), jnp.asarray(ep.sent_ids),
            table.prob, table.alias, sc, jax.random.PRNGKey(9))

    c1 = make_train_chunk(hyper, V, B, S, donate=False)
    u1, v1, l1 = c1(jnp.asarray(u0), jnp.asarray(v0), *args)
    c2 = make_slab_train_chunk(hyper, V, B, S, neg_sharing=0, donate=False)
    u2, v2, l2 = c2(jnp.asarray(u0), jnp.asarray(v0), *args)

    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4, atol=1e-4)


def test_neg_pool_full_equals_percenter():
    """neg_pool=G gives every center a private pool: must equal per-center
    mode with the pool negatives unpacked center-by-center."""
    B, W, K, G = 32, 3, 4, 8
    T = B // G
    u, v, inputs = _setup(B=B, W=W, K=K)
    hyper = CBOWHyper(bitlevel=2, size=16, window=W, negative=K, reg=0.01)
    alpha = jnp.float32(0.05)

    rng = np.random.default_rng(11)
    negs_pool = rng.integers(1, 50, (T, G * K)).astype(np.int32)
    u1, v1, loss1 = slab_step(
        jnp.asarray(u), jnp.asarray(v),
        inputs._replace(neg_ids=jnp.asarray(negs_pool)),
        alpha, hyper, B, neg_sharing=G, neg_pool=G)

    # strided tiles: center b is tile b % T, in-tile position g = b // T,
    # and with P == G its pool is g — columns g*K..(g+1)*K
    negs_full = np.stack([
        negs_pool[b % T, (b // T) * K:(b // T + 1) * K] for b in range(B)])
    u2, v2, loss2 = slab_step(
        jnp.asarray(u), jnp.asarray(v),
        inputs._replace(neg_ids=jnp.asarray(negs_full)),
        alpha, hyper, B, neg_sharing=0)

    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)


def test_neg_pool_partial_equals_expanded():
    """P between 1 and G: center g uses pool g % P — must equal per-center
    mode with each center's pool broadcast to it."""
    B, W, K, G, P = 32, 3, 4, 8, 2
    T = B // G
    u, v, inputs = _setup(B=B, W=W, K=K)
    hyper = CBOWHyper(bitlevel=1, size=16, window=W, negative=K, reg=0.0)
    alpha = jnp.float32(0.05)

    rng = np.random.default_rng(13)
    negs_pool = rng.integers(1, 50, (T, P * K)).astype(np.int32)
    u1, v1, loss1 = slab_step(
        jnp.asarray(u), jnp.asarray(v),
        inputs._replace(neg_ids=jnp.asarray(negs_pool)),
        alpha, hyper, B, neg_sharing=G, neg_pool=P)

    negs_full = np.stack([
        negs_pool[b % T,
                  ((b // T) % P) * K:((b // T) % P + 1) * K]
        for b in range(B)])
    u2, v2, loss2 = slab_step(
        jnp.asarray(u), jnp.asarray(v),
        inputs._replace(neg_ids=jnp.asarray(negs_full)),
        alpha, hyper, B, neg_sharing=0)

    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)


def test_neg_pool_chunk_runs_and_learns():
    from word2bits_tpu.data.pipeline import build_epoch_arrays
    from word2bits_tpu.sampling.unigram import build_alias_table

    rng = np.random.default_rng(0)
    V, D, B, S, W, K, G, P = 50, 16, 32, 10, 2, 4, 8, 4
    pairs = rng.integers(1, V // 2, size=3000)
    enc = np.stack([2 * pairs, 2 * pairs + 1], 1).reshape(-1).astype(np.int32)
    counts = np.bincount(enc, minlength=V).astype(np.int64)
    ep = build_epoch_arrays(enc, counts, 0.0, int(counts.sum()), W,
                            np.random.default_rng(1))
    hyper = CBOWHyper(bitlevel=0, size=D, window=W, negative=K)
    table = build_alias_table(np.maximum(counts, 1) ** 0.75)

    chunk = make_slab_train_chunk(hyper, V, B, S, neg_sharing=G,
                                  neg_pool=P, donate=False)
    u = jnp.asarray(rng.uniform(-0.05, 0.05, (V, D)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-0.05, 0.05, (V, D)).astype(np.float32))
    sc = ChunkScalars(base0=jnp.int32(ep.halo), alpha0=jnp.float32(0.1),
                      wca_start=jnp.float32(0), wca_per_step=jnp.float32(0),
                      denom=jnp.float32(1e9))
    losses = []
    for i in range(8):
        u, v, loss = chunk(u, v, jnp.asarray(ep.tokens),
                           jnp.asarray(ep.sent_ids), table.prob,
                           table.alias, sc, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] > losses[0], losses
