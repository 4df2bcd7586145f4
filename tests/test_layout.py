"""Balanced hot-head layout (parallel/layout.py): slot-map consistency,
permutation round-trips, and sharded-chunk equality with the single-chip
fused dense-hot path under the interleaved placement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.parallel.layout import (
    from_layout,
    layout_order,
    make_hot_layout,
    pad_hot_weights,
    to_layout,
)


@pytest.mark.parametrize("Vp,nv,H", [(48, 4, 12), (48, 4, 10), (64, 8, 8),
                                     (40, 2, 7), (48, 4, 43)])
def test_owner_local_matches_layout_order(Vp, nv, H):
    layout = make_hot_layout(Vp, nv, H)
    order = layout_order(layout, Vp)                 # slot -> global id
    # every global id appears exactly once
    assert sorted(order.tolist()) == list(range(Vp))
    Vs = Vp // nv
    owner, local = layout.owner_local(jnp.arange(Vp, dtype=jnp.int32))
    owner, local = np.asarray(owner), np.asarray(local)
    for g in range(Vp):
        slot = owner[g] * Vs + local[g]
        assert order[slot] == g, (g, owner[g], local[g])
    # the leading hot_per_shard local slots of shard j are the hot sub-range
    Hs = layout.hot_per_shard
    for j in range(nv):
        np.testing.assert_array_equal(order[j * Vs:j * Vs + Hs],
                                      np.arange(j * Hs, (j + 1) * Hs))


def test_layout_roundtrip_and_pad():
    layout = make_hot_layout(48, 4, 10)
    x = np.random.default_rng(0).normal(size=(48, 5)).astype(np.float32)
    np.testing.assert_array_equal(from_layout(to_layout(x, layout), layout), x)
    w = np.arange(10, dtype=np.float32)
    wp = pad_hot_weights(w, layout)
    assert wp.shape == (layout.hot_pad,)
    np.testing.assert_array_equal(wp[:10], w)
    assert (wp[10:] == 0).all()


def test_make_hot_layout_validation():
    with pytest.raises(ValueError):
        make_hot_layout(48, 4, 0)
    with pytest.raises(ValueError):
        make_hot_layout(48, 4, 48)      # no cold block left
    with pytest.raises(ValueError):
        make_hot_layout(50, 4, 8)       # Vp not divisible by nv


def _setup(seed, S, B, W, V, D):
    from word2bits_tpu.models.cbow import ChunkScalars
    rng = np.random.default_rng(seed)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    n = W + S * B + W
    toks = rng.integers(1, V, n).astype(np.int32)
    sents = np.sort(rng.integers(0, 6, n)).astype(np.int32)
    toks[:2] = -1
    sents[:2] = -1
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(250.0),
                           denom=jnp.float32(1e5))
    return u, v, toks, sents, scalars


@pytest.mark.parametrize("mesh_shape,shared,model", [
    ({"data": 2, "vocab": 4}, 8, "cbow"),
    ({"data": 4, "vocab": 2}, 8, "cbow"),
    ({"data": 2, "vocab": 4}, 0, "cbow"),
    ({"data": 2, "vocab": 4}, 8, "skipgram"),
])
def test_interleaved_dense_hot_chunk_equals_single(mesh_shape, shared, model):
    """Sharded dense-hot chunk under the balanced layout == the single-chip
    dense-hot chunk with the same key (H chosen NOT divisible by nv to
    exercise the zero-padded hot tail)."""
    from word2bits_tpu.models.skipgram import make_skipgram_train_chunk
    from word2bits_tpu.parallel.chunk import make_sharded_chunk
    from word2bits_tpu.parallel.mesh import make_mesh
    from word2bits_tpu.parallel.sharded import pad_vocab_rows, shard_params
    from word2bits_tpu.parallel.sharded_skipgram import _sharded_skipgram_body
    from word2bits_tpu.parallel.sharded_slab import _sharded_slab_body
    from word2bits_tpu.sampling.unigram import build_stratified_tables

    S, B, W, K, V, D, H = 3, 32, 3, 4, 45, 16, 11
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    u, v, toks, sents, scalars = _setup(0, S, B, W, V, D)
    rng = np.random.default_rng(9)
    counts = rng.integers(1, 50, V).astype(np.float64)
    st = build_stratified_tables(counts ** 0.75, H)
    dh = st.dense_split(K)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(mesh_shape)
    nv = mesh_shape["vocab"]
    up, vp = pad_vocab_rows(u, nv), pad_vocab_rows(v, nv)
    layout = make_hot_layout(up.shape[0], nv, H)
    body = (_sharded_skipgram_body if model == "skipgram"
            else _sharded_slab_body)
    chunk = make_sharded_chunk(body, hyper, mesh, up.shape[0], V, B, S,
                               neg_sharing=shared, donate=False,
                               dense_hot=dh, hot_rows=H, hot_layout=layout)
    ud, vd = shard_params(jnp.asarray(to_layout(up, layout)),
                          jnp.asarray(to_layout(vp, layout)), mesh)
    u2, v2, loss2 = chunk(ud, vd, jnp.asarray(toks), jnp.asarray(sents),
                          st.cold.prob, st.cold.alias, scalars, key)
    u2 = from_layout(u2, layout)[:V]
    v2 = from_layout(v2, layout)[:V]

    if model == "skipgram":
        single = make_skipgram_train_chunk(hyper, V, B, S, neg_sharing=shared,
                                           donate=False, hot_rows=H,
                                           dense_hot=dh)
        u1, v1, loss1 = single(jnp.asarray(u), jnp.asarray(v),
                               jnp.asarray(toks), jnp.asarray(sents),
                               st.cold.prob, st.cold.alias, scalars, key)
    elif shared:
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
        # per-center mode: compare against the UNBALANCED sharded chunk
        # (the proven-equal baseline) on the same mesh
        chunk_b = make_sharded_chunk(body, hyper, mesh, up.shape[0], V, B, S,
                                     neg_sharing=0, donate=False,
                                     dense_hot=dh, hot_rows=H)
        udb, vdb = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
        u1, v1, loss1 = chunk_b(udb, vdb, jnp.asarray(toks),
                                jnp.asarray(sents), st.cold.prob,
                                st.cold.alias, scalars, key)

    np.testing.assert_allclose(u2, np.asarray(u1)[:V], atol=3e-5)
    np.testing.assert_allclose(v2, np.asarray(v1)[:V], atol=3e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)


def test_trainer_uses_layout_and_roundtrips_params():
    """ShardedTrainer with -neg-dense-hot builds the layout by default and
    params() returns rows in global order."""
    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.parallel.trainer import ShardedTrainer
    from word2bits_tpu.sampling.unigram import build_stratified_tables

    V, D, H = 45, 16, 11
    cfg = Word2BitsConfig(train_file="x", output_file="y", bitlevel=1,
                          size=D, window=3, negative=4, batch_size=32,
                          neg_sharing=8, hot_rows=H, neg_dense_hot=True,
                          steps_per_chunk=2,
                          mesh_shape={"data": 2, "vocab": 4})
    rng = np.random.default_rng(0)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    counts = rng.integers(1, 50, V).astype(np.float64)
    st = build_stratified_tables(counts ** 0.75, H)
    dh = st.dense_split(cfg.negative)
    tr = ShardedTrainer(cfg, V, u, v, dense_hot=dh)
    assert tr.layout is not None
    u0, v0 = tr.params()
    np.testing.assert_allclose(u0, u, atol=0)
    np.testing.assert_allclose(v0, v, atol=0)
    # opt-out flag
    tr2 = ShardedTrainer(cfg.replace(hot_interleave=False), V, u, v,
                         dense_hot=dh)
    assert tr2.layout is None
