"""Sharded scan chunk == single-chip scan chunk on the 8-device CPU mesh.

The chunk draws its negatives/shrinks on device from the same key with the
same split structure as the single-chip chunk (parallel/chunk.py), so with
identical keys the two paths must produce the same parameters and loss up to
float summation order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
from word2bits_tpu.models.cbow_slab import make_slab_train_chunk
from word2bits_tpu.models.skipgram import make_skipgram_train_chunk
from word2bits_tpu.parallel.chunk import make_sharded_chunk
from word2bits_tpu.parallel.mesh import make_mesh
from word2bits_tpu.parallel.sharded import pad_vocab_rows, shard_params
from word2bits_tpu.parallel.sharded_skipgram import _sharded_skipgram_body
from word2bits_tpu.parallel.sharded_slab import _sharded_slab_body


def _setup(seed, S, B, W, V, D):
    rng = np.random.default_rng(seed)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    n = W + S * B + W
    toks = rng.integers(1, V, n).astype(np.int32)
    sents = np.sort(rng.integers(0, 6, n)).astype(np.int32)
    toks[:2] = -1
    sents[:2] = -1
    counts = rng.integers(1, 50, V).astype(np.float64)
    from word2bits_tpu.sampling.unigram import build_alias_table
    table = build_alias_table(counts ** 0.75)
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(250.0),
                           denom=jnp.float32(1e5))
    return u, v, toks, sents, table, scalars


@pytest.mark.parametrize("mesh_shape,shared,model,pool", [
    ({"data": 2, "vocab": 4}, 8, "cbow", 1),
    ({"data": 4, "vocab": 2}, 16, "cbow", 1),
    ({"data": 2, "vocab": 4}, 0, "cbow", 1),
    ({"data": 2, "vocab": 4}, 8, "skipgram", 1),
    # neg_pool: P pools per tile; the center->pool routing crosses data
    # shards (pool_mask offset = shard * G_local), so P values both above
    # and below the data-axis size are exercised
    ({"data": 2, "vocab": 4}, 8, "cbow", 4),
    ({"data": 4, "vocab": 2}, 8, "cbow", 2),
    ({"data": 2, "vocab": 4}, 8, "skipgram", 4),
])
def test_sharded_chunk_equals_single_chunk(mesh_shape, shared, model, pool):
    S, B, W, K, V, D = 3, 32, 3, 4, 45, 16
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    u, v, toks, sents, table, scalars = _setup(0, S, B, W, V, D)
    key = jax.random.PRNGKey(7)

    if model == "skipgram":
        single = make_skipgram_train_chunk(hyper, V, B, S, neg_sharing=shared,
                                           neg_pool=pool, donate=False)
        body = _sharded_skipgram_body
    else:
        single = make_slab_train_chunk(hyper, V, B, S, neg_sharing=shared,
                                       neg_pool=pool, donate=False)
        body = _sharded_slab_body
    u1, v1, loss1 = single(jnp.asarray(u), jnp.asarray(v), jnp.asarray(toks),
                           jnp.asarray(sents), table.prob, table.alias,
                           scalars, key)

    mesh = make_mesh(mesh_shape)
    nv = mesh_shape["vocab"]
    up, vp = pad_vocab_rows(u, nv), pad_vocab_rows(v, nv)
    chunk = make_sharded_chunk(body, hyper, mesh, up.shape[0], V, B, S,
                               neg_sharing=shared, neg_pool=pool,
                               donate=False)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u2, v2, loss2 = chunk(ud, vd, jnp.asarray(toks), jnp.asarray(sents),
                          table.prob, table.alias, scalars, key)

    np.testing.assert_allclose(np.asarray(u2)[:V], np.asarray(u1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(v2)[:V], np.asarray(v1), atol=3e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)


def test_chunk_single_dispatch_per_S_steps():
    """The trainer path must not host-sync inside a chunk: one chunk call
    returns a device scalar, and S scan steps advance the LR schedule
    exactly as S single steps would."""
    S, B, W, K, V, D = 4, 16, 2, 3, 30, 8
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.0)
    u, v, toks, sents, table, scalars = _setup(1, S, B, W, V, D)
    mesh = make_mesh({"data": 2, "vocab": 4})
    up, vp = pad_vocab_rows(u, 4), pad_vocab_rows(v, 4)
    chunk = make_sharded_chunk(_sharded_slab_body, hyper, mesh, up.shape[0],
                               V, B, S, neg_sharing=0, donate=False)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u2, v2, loss = chunk(ud, vd, jnp.asarray(toks), jnp.asarray(sents),
                         table.prob, table.alias, scalars,
                         jax.random.PRNGKey(0))
    assert isinstance(loss, jax.Array) and loss.shape == ()
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(u2)).all()


@pytest.mark.parametrize("mesh_shape,shared", [
    ({"data": 2, "vocab": 4}, 8),
    ({"data": 4, "vocab": 2}, 8),
    ({"data": 2, "vocab": 4}, 0),
])
def test_sharded_dense_hot_chunk_equals_fused_single(mesh_shape, shared):
    """Sharded dense-hot chunk == single-chip chunk with the same key.

    The single-chip reference is the fused dense-hot chunk (shared mode) or
    a step-by-step fused... for per-center mode (shared=0) the sharded body
    is compared across mesh layouts instead (no single-chip per-center
    dense-hot exists; 2x4 and 4x2 must agree with each other)."""
    from word2bits_tpu.sampling.unigram import build_stratified_tables

    S, B, W, K, V, D, H = 3, 32, 3, 4, 45, 16, 12
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    u, v, toks, sents, _, scalars = _setup(0, S, B, W, V, D)
    rng = np.random.default_rng(9)
    counts = rng.integers(1, 50, V).astype(np.float64)
    st = build_stratified_tables(counts ** 0.75, H)
    dh = st.dense_split(K)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(mesh_shape)
    nv = mesh_shape["vocab"]
    up, vp = pad_vocab_rows(u, nv), pad_vocab_rows(v, nv)
    chunk = make_sharded_chunk(_sharded_slab_body, hyper, mesh, up.shape[0],
                               V, B, S, neg_sharing=shared, donate=False,
                               dense_hot=dh, hot_rows=H)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u2, v2, loss2 = chunk(ud, vd, jnp.asarray(toks), jnp.asarray(sents),
                          st.cold.prob, st.cold.alias, scalars, key)

    if shared:
        from word2bits_tpu.data.pipeline import cold_positions
        from word2bits_tpu.models.cbow_fused import (deinterleave, interleave,
                                                     make_fused_train_chunk)
        single = make_fused_train_chunk(hyper, V, B, S, neg_sharing=shared,
                                        donate=False, hot_rows=H,
                                        dense_hot=dh)
        cp = jnp.asarray(cold_positions(toks, B, W, S + 1, H, pad_mult=8))
        t1, loss1 = single(interleave(jnp.asarray(u), jnp.asarray(v)),
                           jnp.asarray(toks), jnp.asarray(sents),
                           st.cold.prob, st.cold.alias, scalars, key, cp)
        u1, v1 = deinterleave(t1)
    else:
        mesh_b = make_mesh({"data": 1, "vocab": 2},
                           devices=jax.devices()[:2])
        upb, vpb = pad_vocab_rows(u, 2), pad_vocab_rows(v, 2)
        chunk_b = make_sharded_chunk(_sharded_slab_body, hyper, mesh_b,
                                     upb.shape[0], V, B, S, neg_sharing=0,
                                     donate=False, dense_hot=dh, hot_rows=H)
        udb, vdb = shard_params(jnp.asarray(upb), jnp.asarray(vpb), mesh_b)
        u1, v1, loss1 = chunk_b(udb, vdb, jnp.asarray(toks),
                                jnp.asarray(sents), st.cold.prob,
                                st.cold.alias, scalars, key)
        u1, v1 = jnp.asarray(u1)[:V], jnp.asarray(v1)[:V]

    np.testing.assert_allclose(np.asarray(u2)[:V], np.asarray(u1)[:V],
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(v2)[:V], np.asarray(v1)[:V],
                               atol=3e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("shared", [8, 0])
def test_sharded_skipgram_dense_hot_equals_single(shared):
    """Sharded skip-gram dense-hot chunk == single-chip skip-gram dense-hot
    chunk with the same key."""
    from word2bits_tpu.sampling.unigram import build_stratified_tables

    S, B, W, K, V, D, H = 3, 32, 3, 4, 45, 16, 12
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    u, v, toks, sents, _, scalars = _setup(1, S, B, W, V, D)
    rng = np.random.default_rng(4)
    counts = rng.integers(1, 50, V).astype(np.float64)
    st = build_stratified_tables(counts ** 0.75, H)
    dh = st.dense_split(K)
    key = jax.random.PRNGKey(11)

    single = make_skipgram_train_chunk(hyper, V, B, S, neg_sharing=shared,
                                       donate=False, hot_rows=H, dense_hot=dh)
    u1, v1, loss1 = single(jnp.asarray(u), jnp.asarray(v), jnp.asarray(toks),
                           jnp.asarray(sents), st.cold.prob, st.cold.alias,
                           scalars, key)

    mesh = make_mesh({"data": 2, "vocab": 4})
    up, vp = pad_vocab_rows(u, 4), pad_vocab_rows(v, 4)
    chunk = make_sharded_chunk(_sharded_skipgram_body, hyper, mesh,
                               up.shape[0], V, B, S, neg_sharing=shared,
                               donate=False, dense_hot=dh, hot_rows=H)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u2, v2, loss2 = chunk(ud, vd, jnp.asarray(toks), jnp.asarray(sents),
                          st.cold.prob, st.cold.alias, scalars, key)

    np.testing.assert_allclose(np.asarray(u2)[:V], np.asarray(u1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(v2)[:V], np.asarray(v1), atol=3e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)
