"""Banded-block MXU windowed sums (ops/windowed.py) == the shift
formulation, at the op level and through full training chunks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
from word2bits_tpu.models.cbow_slab import (
    SlabInputs,
    _context_masks,
    make_slab_train_chunk,
    slab_step,
)
from word2bits_tpu.ops.windowed import (
    banded_context,
    banded_usum,
    build_banded_masks,
    pick_tile,
)


def _inputs(seed, B, W, V, K, shared=0):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, V, B + 2 * W).astype(np.int32)
    sents = np.sort(rng.integers(0, 5, B + 2 * W)).astype(np.int32)
    toks[:3] = -1
    sents[:3] = -1
    toks[-2:] = -1
    sents[-2:] = -1
    shrink = rng.integers(0, W, B).astype(np.int32)
    neg_rows = B // shared if shared else B
    negs = rng.integers(0, V, (neg_rows, K)).astype(np.int32)
    return SlabInputs(jnp.asarray(toks), jnp.asarray(sents),
                      jnp.asarray(shrink), jnp.asarray(negs))


@pytest.mark.parametrize("B,W,tile", [(32, 3, 8), (32, 3, 16), (64, 8, 16),
                                      (48, 2, 12)])
def test_banded_masks_match_context_masks(B, W, tile):
    inputs = _inputs(0, B, W, 30, 4)
    offsets, mask, valid = _context_masks(inputs, B, W)
    M, win_idx, valid_b = build_banded_masks(inputs.slab_sents, inputs.shrink,
                                             B, W, tile)
    np.testing.assert_array_equal(np.asarray(valid_b), np.asarray(valid))
    # banded M holds the same (center, offset) bits at o = j - i - W
    M = np.asarray(M)
    Nt = B // tile
    for t in range(Nt):
        for i in range(tile):
            b = t * tile + i
            for oi, o in enumerate(offsets):
                j = i + o + W
                assert M[t, i, j] == float(np.asarray(mask)[b, oi]), (b, o)
    # row sums == context counts; window indices are the slab positions
    np.testing.assert_array_equal(
        M.sum(axis=2).reshape(B), np.asarray(mask).sum(axis=1))
    np.testing.assert_array_equal(
        np.asarray(win_idx)[:, 0], np.arange(Nt) * tile)


def test_banded_context_and_usum_values():
    B, W, V, D, tile = 32, 3, 25, 16, 8
    inputs = _inputs(1, B, W, V, 4)
    rng = np.random.default_rng(2)
    q_slab = jnp.asarray(rng.normal(size=(B + 2 * W, D)).astype(np.float32))
    q_sq = jnp.sum(q_slab * q_slab, axis=-1)
    cavge = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    af = jnp.asarray((rng.random(B) > 0.2).astype(np.float32))

    offsets, mask, valid = _context_masks(inputs, B, W)
    mf = np.asarray(mask).astype(np.float32)
    csum_ref = np.zeros((B, D), np.float32)
    sq_ref = np.zeros((B,), np.float32)
    for oi, o in enumerate(offsets):
        csum_ref += mf[:, oi, None] * np.asarray(q_slab)[W + o:W + o + B]
        sq_ref += mf[:, oi] * np.asarray(q_sq)[W + o:W + o + B]
    mc = mf * np.asarray(af)[:, None]
    du_ref = np.zeros((B + 2 * W, D), np.float32)
    cnt_ref = np.zeros((B + 2 * W,), np.float32)
    for oi, o in enumerate(offsets):
        du_ref[W + o:W + o + B] += mc[:, oi, None] * np.asarray(cavge)
        cnt_ref[W + o:W + o + B] += mc[:, oi]

    M, win_idx, _ = build_banded_masks(inputs.slab_sents, inputs.shrink,
                                       B, W, tile)
    csum, sq_sum, cw = banded_context(q_slab, q_sq, M, win_idx, B)
    np.testing.assert_allclose(np.asarray(csum), csum_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sq_sum), sq_ref, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(cw), mf.sum(axis=1))

    M_af = M * af.reshape(B // tile, tile)[:, :, None]
    du, cnt = banded_usum(M_af, cavge, B, W)
    np.testing.assert_allclose(np.asarray(du), du_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cnt), cnt_ref, atol=1e-5)


def test_pick_tile():
    assert pick_tile(8192, 8, 128) == 128
    assert pick_tile(96, 8, 128) == 96
    assert pick_tile(32, 3, 128) == 32
    assert pick_tile(40, 8, 128) == 40
    assert pick_tile(36, 8, 24) == 18
    with pytest.raises(ValueError):
        pick_tile(10, 8, 128)   # no divisor >= 2W


@pytest.mark.parametrize("shared,pool", [(0, 1), (8, 1), (8, 4)])
def test_banded_slab_step_equals_shift(shared, pool):
    B, W, V, D, K = 32, 3, 40, 16, 4
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32))
    inputs = _inputs(3, B, W, V, pool * K, shared)
    u1, v1, l1 = slab_step(u, v, inputs, 0.05, hyper, B, shared,
                           neg_pool=pool)
    u2, v2, l2 = slab_step(u, v, inputs, 0.05, hyper, B, shared,
                           neg_pool=pool, banded=8)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=2e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5, atol=1e-4)


def test_banded_chunk_equals_shift_chunk():
    from word2bits_tpu.sampling.unigram import build_alias_table
    S, B, W, K, V, D = 3, 32, 3, 4, 45, 16
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32))
    n = W + S * B + W
    toks = jnp.asarray(rng.integers(1, V, n).astype(np.int32))
    sents = jnp.asarray(np.sort(rng.integers(0, 6, n)).astype(np.int32))
    table = build_alias_table(rng.integers(1, 50, V).astype(np.float64) ** .75)
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(250.0),
                           denom=jnp.float32(1e5))
    key = jax.random.PRNGKey(7)
    c1 = make_slab_train_chunk(hyper, V, B, S, neg_sharing=8, donate=False)
    c2 = make_slab_train_chunk(hyper, V, B, S, neg_sharing=8, donate=False,
                               banded=16)
    u1, v1, l1 = c1(u, v, toks, sents, table.prob, table.alias, scalars, key)
    u2, v2, l2 = c2(u, v, toks, sents, table.prob, table.alias, scalars, key)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=3e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-4, atol=1e-4)


def test_banded_fused_chunk_equals_shift():
    """Fused-table path (the bench config family) with banded windowed sums,
    composed with dense-hot negatives."""
    from word2bits_tpu.models.cbow_fused import (deinterleave, interleave,
                                                 make_fused_train_chunk)
    from word2bits_tpu.data.pipeline import cold_positions
    from word2bits_tpu.sampling.unigram import build_stratified_tables
    S, B, W, K, V, D, H = 3, 32, 3, 4, 45, 16, 12
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32))
    n = W + S * B + W
    toks_np = rng.integers(1, V, n).astype(np.int32)
    toks = jnp.asarray(toks_np)
    sents = jnp.asarray(np.sort(rng.integers(0, 6, n)).astype(np.int32))
    st = build_stratified_tables(
        rng.integers(1, 50, V).astype(np.float64) ** 0.75, H)
    dh = st.dense_split(K)
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(250.0),
                           denom=jnp.float32(1e5))
    key = jax.random.PRNGKey(9)
    cp = jnp.asarray(cold_positions(toks_np, B, W, S + 1, H, pad_mult=8))
    kw = dict(neg_sharing=8, donate=False, hot_rows=H, dense_hot=dh)
    c1 = make_fused_train_chunk(hyper, V, B, S, **kw)
    c2 = make_fused_train_chunk(hyper, V, B, S, banded=16, **kw)
    t1, l1 = c1(interleave(u, v), toks, sents, st.cold.prob, st.cold.alias,
                scalars, key, cp)
    t2, l2 = c2(interleave(u, v), toks, sents, st.cold.prob, st.cold.alias,
                scalars, key, cp)
    u1, v1 = deinterleave(t1)
    u2, v2 = deinterleave(t2)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=3e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mesh_shape,shared", [
    ({"data": 2, "vocab": 4}, 8),
    ({"data": 4, "vocab": 2}, 8),
    ({"data": 2, "vocab": 4}, 0),
])
def test_banded_sharded_chunk_equals_single(mesh_shape, shared):
    """Sharded chunk with banded windowed sums == single-chip shift chunk
    (same key => same negatives/shrinks; banded only reorders float sums).
    Banded tiles are per-shard: B_local = B / data."""
    from word2bits_tpu.parallel.chunk import make_sharded_chunk
    from word2bits_tpu.parallel.mesh import make_mesh
    from word2bits_tpu.parallel.sharded import pad_vocab_rows, shard_params
    from word2bits_tpu.parallel.sharded_slab import _sharded_slab_body
    from word2bits_tpu.sampling.unigram import build_alias_table

    S, B, W, K, V, D = 3, 32, 3, 4, 45, 16
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    rng = np.random.default_rng(0)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    n = W + S * B + W
    toks = rng.integers(1, V, n).astype(np.int32)
    sents = np.sort(rng.integers(0, 6, n)).astype(np.int32)
    toks[:2] = -1
    sents[:2] = -1
    table = build_alias_table(rng.integers(1, 50, V).astype(np.float64) ** 0.75)
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(250.0),
                           denom=jnp.float32(1e5))
    key = jax.random.PRNGKey(7)

    single = make_slab_train_chunk(hyper, V, B, S, neg_sharing=shared,
                                   donate=False)
    u1, v1, loss1 = single(jnp.asarray(u), jnp.asarray(v), jnp.asarray(toks),
                           jnp.asarray(sents), table.prob, table.alias,
                           scalars, key)

    mesh = make_mesh(mesh_shape)
    nv = mesh_shape["vocab"]
    up, vp = pad_vocab_rows(u, nv), pad_vocab_rows(v, nv)
    chunk = make_sharded_chunk(_sharded_slab_body, hyper, mesh, up.shape[0],
                               V, B, S, neg_sharing=shared, donate=False,
                               banded=8)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u2, v2, loss2 = chunk(ud, vd, jnp.asarray(toks), jnp.asarray(sents),
                          table.prob, table.alias, scalars, key)

    np.testing.assert_allclose(np.asarray(u2)[:V], np.asarray(u1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(v2)[:V], np.asarray(v1), atol=3e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)
