"""Fused (V,2D) table step == split-table slab step."""

import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.models.cbow_fused import (
    deinterleave,
    fused_slab_step,
    interleave,
)
from word2bits_tpu.models.cbow_slab import slab_step
from tests.test_cbow_slab import _setup


@pytest.mark.parametrize("bitlevel,reg", [(1, 0.0), (0, 0.01), (2, 0.005),
                                          (4, 0.001)])
def test_fused_equals_split(bitlevel, reg):
    B, W, K, G = 32, 3, 4, 8
    u, v, inputs = _setup(B=B, W=W, K=K)
    rng = np.random.default_rng(5)
    negs = rng.integers(1, 50, (B // G, K)).astype(np.int32)
    inputs = inputs._replace(neg_ids=jnp.asarray(negs))
    hyper = CBOWHyper(bitlevel=bitlevel, size=16, window=W, negative=K,
                      reg=reg)
    alpha = jnp.float32(0.05)

    u1, v1, loss1 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                              hyper, B, neg_sharing=G)
    table = interleave(jnp.asarray(u), jnp.asarray(v))
    table2, loss2 = fused_slab_step(table, inputs, alpha, hyper, B,
                                    neg_sharing=G)
    u2, v2 = deinterleave(table2)

    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)


def test_fused_requires_sharing():
    u, v, inputs = _setup()
    hyper = CBOWHyper(bitlevel=1, size=16, window=3, negative=4)
    with pytest.raises(ValueError):
        fused_slab_step(interleave(jnp.asarray(u), jnp.asarray(v)), inputs,
                        jnp.float32(0.05), hyper, 32, neg_sharing=0)


def test_interleave_roundtrip():
    rng = np.random.default_rng(0)
    u = rng.uniform(-1, 1, (10, 8)).astype(np.float32)
    v = rng.uniform(-1, 1, (10, 8)).astype(np.float32)
    u2, v2 = deinterleave(interleave(jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_array_equal(np.asarray(u2), u)
    np.testing.assert_array_equal(np.asarray(v2), v)


def test_hot_slice_add_equals_scatter():
    """hot_slice_add == .at[].add restricted to ids < H."""
    from word2bits_tpu.ops.scatter import hot_slice_add
    rng = np.random.default_rng(3)
    V, C, N, H = 40, 8, 100, 16
    table = rng.uniform(-1, 1, (V, C)).astype(np.float32)
    ids = rng.integers(0, V, N).astype(np.int32)
    rows = rng.uniform(-1, 1, (N, C)).astype(np.float32)
    hot = ids < H
    want = jnp.asarray(table).at[jnp.asarray(ids[hot])].add(
        jnp.asarray(rows[hot]))
    got = hot_slice_add(jnp.asarray(table), jnp.asarray(ids),
                        jnp.asarray(rows), H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_cold_positions_exact_partition():
    """cold_positions lists, per step, exactly the positions with id >= H."""
    from word2bits_tpu.data.pipeline import cold_positions
    rng = np.random.default_rng(7)
    B, W, H, n_rows = 16, 3, 5, 6
    tokens = rng.integers(-1, 30, n_rows * B + 2 * W + 11).astype(np.int32)
    pos = cold_positions(tokens, B, W, n_rows, H, pad_mult=4)
    span = B + 2 * W
    for t in range(n_rows):
        win = np.maximum(tokens[t * B:t * B + span], 0)
        want = set(np.flatnonzero(win >= H).tolist())
        got = [p for p in pos[t] if p >= 0]
        assert len(got) == len(set(got)), "duplicate cold position"
        assert set(got) == want, f"step {t}: {sorted(got)} != {sorted(want)}"


@pytest.mark.parametrize("bitlevel", [1, 0])
def test_fused_hot_rows_equals_baseline(bitlevel):
    """fused step with the hot/cold scatter split == plain fused step."""
    from word2bits_tpu.models.cbow_slab import SlabInputs

    B, W, K, G, V, D, H = 32, 3, 4, 8, 50, 16, 12
    T = B // G
    rng = np.random.default_rng(11)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    toks = rng.integers(-1, V, B + 2 * W).astype(np.int32)
    sents = np.sort(rng.integers(0, 4, B + 2 * W)).astype(np.int32)
    shrink = rng.integers(0, W, B).astype(np.int32)
    negs = rng.integers(1, V, (T, K)).astype(np.int32)
    inputs = SlabInputs(slab_tokens=jnp.asarray(toks),
                        slab_sents=jnp.asarray(sents),
                        shrink=jnp.asarray(shrink),
                        neg_ids=jnp.asarray(negs))
    hyper = CBOWHyper(bitlevel=bitlevel, size=D, window=W, negative=K,
                      reg=0.01)
    alpha = jnp.float32(0.05)
    table0 = interleave(jnp.asarray(u), jnp.asarray(v))

    base, loss1 = fused_slab_step(table0, inputs, alpha, hyper, B, G)

    ids = np.maximum(toks, 0)
    cold = np.flatnonzero(ids >= H).astype(np.int32)
    C = max(8, ((len(cold) + 3) // 4) * 4)
    cold_pos = np.full(C, -1, np.int32)
    cold_pos[:len(cold)] = cold
    got, loss2 = fused_slab_step(table0, inputs, alpha, hyper, B, G,
                                 hot_rows=H, cold_pos=jnp.asarray(cold_pos))

    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4)


def test_fused_hot_rows_chunk_equals_baseline():
    """Full scan chunk with -hot-rows == baseline chunk (same key stream)."""
    import jax
    from word2bits_tpu.data.pipeline import build_epoch_arrays, cold_positions
    from word2bits_tpu.models.cbow import ChunkScalars
    from word2bits_tpu.models.cbow_fused import make_fused_train_chunk
    from word2bits_tpu.sampling.unigram import build_alias_table

    V, D, B, S, W, K, G, H = 60, 16, 32, 3, 3, 4, 8, 10
    rng = np.random.default_rng(2)
    counts = rng.integers(1, 100, V)
    counts[0] = 0
    encoded = rng.integers(0, V, 400).astype(np.int32)
    ep = build_epoch_arrays(encoded, counts, 1e-3, 400, W,
                            np.random.default_rng(0), capacity=512)
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.0)
    u = rng.uniform(-0.5, 0.5, (V, 2 * D)).astype(np.float32)
    atab = build_alias_table(np.maximum(counts, 1) ** 0.75)
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(B),
                           denom=jnp.float32(2000.0))
    key = jax.random.PRNGKey(9)
    tokens, sents = jnp.asarray(ep.tokens), jnp.asarray(ep.sent_ids)

    base_fn = make_fused_train_chunk(hyper, V, B, S, neg_sharing=G,
                                     donate=False)
    t1, l1 = base_fn(jnp.asarray(u), tokens, sents, atab.prob, atab.alias,
                     scalars, key)

    n_rows = 512 // B + S + 2
    cp = jnp.asarray(cold_positions(ep.tokens, B, W, n_rows, H, pad_mult=8))
    hot_fn = make_fused_train_chunk(hyper, V, B, S, neg_sharing=G,
                                    donate=False, hot_rows=H)
    t2, l2 = hot_fn(jnp.asarray(u), tokens, sents, atab.prob, atab.alias,
                    scalars, key, cp)

    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-4)


def test_fused_neg_pool_equals_split():
    """Fused step with neg_pool must match the split slab step with the
    same pooled negatives."""
    import numpy as np
    from word2bits_tpu.models.cbow_slab import SlabInputs, slab_step

    B, W, K, G, P, V, D = 32, 3, 4, 8, 4, 50, 16
    T = B // G
    rng = np.random.default_rng(5)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    toks = rng.integers(1, V, B + 2 * W).astype(np.int32)
    sents = np.sort(rng.integers(0, 4, B + 2 * W)).astype(np.int32)
    shrink = rng.integers(0, W, B).astype(np.int32)
    negs = rng.integers(1, V, (T, P * K)).astype(np.int32)
    inputs = SlabInputs(slab_tokens=jnp.asarray(toks),
                        slab_sents=jnp.asarray(sents),
                        shrink=jnp.asarray(shrink),
                        neg_ids=jnp.asarray(negs))
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    alpha = jnp.float32(0.05)

    u1, v1, loss1 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                              hyper, B, neg_sharing=G, neg_pool=P)
    table, loss2 = fused_slab_step(interleave(jnp.asarray(u), jnp.asarray(v)),
                                   inputs, alpha, hyper, B, G, neg_pool=P)
    u2, v2 = deinterleave(table)

    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)


def _strat_inputs(rng, B, W, K, P, G, V, H, kh):
    """SlabInputs whose neg ids follow the stratified per-pool lane layout:
    first kh lanes of each pool < H (and > 0), rest >= H."""
    from word2bits_tpu.models.cbow_slab import SlabInputs
    T = B // G
    toks = rng.integers(-1, V, B + 2 * W).astype(np.int32)
    sents = np.sort(rng.integers(0, 4, B + 2 * W)).astype(np.int32)
    shrink = rng.integers(0, W, B).astype(np.int32)
    negs = np.zeros((T, P, K), np.int32)
    negs[:, :, :kh] = rng.integers(1, H, (T, P, kh))
    negs[:, :, kh:] = rng.integers(H, V, (T, P, K - kh))
    return SlabInputs(slab_tokens=jnp.asarray(toks),
                      slab_sents=jnp.asarray(sents),
                      shrink=jnp.asarray(shrink),
                      neg_ids=jnp.asarray(negs.reshape(T, P * K)))


def test_stratified_unit_weights_equal_baseline():
    """strat_lanes with w_hot = w_cold = 1 and the same neg ids must be the
    identity transformation of the step math."""
    B, W, K, G, V, D, H, kh = 32, 3, 6, 8, 50, 16, 12, 4
    rng = np.random.default_rng(5)
    u = rng.uniform(-0.5, 0.5, (V, 2 * D)).astype(np.float32)
    inputs = _strat_inputs(rng, B, W, K, 1, G, V, H, kh)
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    alpha = jnp.float32(0.05)
    t0 = jnp.asarray(u)
    base, l1 = fused_slab_step(t0, inputs, alpha, hyper, B, G)
    got, l2 = fused_slab_step(t0, inputs, alpha, hyper, B, G,
                              strat_lanes=(kh, 1.0, 1.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-6)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)


@pytest.mark.parametrize("neg_pool", [1, 2])
def test_stratified_hot_scatter_equals_plain_scatter(neg_pool):
    """With stratified lanes, the hot/cold scatter routing (dense hot
    accumulation + compact cold scatter) must equal the plain scatter."""
    from word2bits_tpu.data.pipeline import cold_positions

    B, W, K, G, V, D, H, kh = 32, 3, 6, 8, 50, 16, 12, 4
    P = neg_pool
    rng = np.random.default_rng(8)
    u = rng.uniform(-0.5, 0.5, (V, 2 * D)).astype(np.float32)
    inputs = _strat_inputs(rng, B, W, K, P, G, V, H, kh)
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    alpha = jnp.float32(0.05)
    t0 = jnp.asarray(u)
    lanes = (kh, 1.37, 0.81)  # non-unit weights exercise the m3 fold
    base, l1 = fused_slab_step(t0, inputs, alpha, hyper, B, G,
                               neg_pool=P, strat_lanes=lanes)

    ids = np.maximum(np.asarray(inputs.slab_tokens), 0)
    cold = np.flatnonzero(ids >= H).astype(np.int32)
    C = max(8, ((len(cold) + 3) // 4) * 4)
    cp = np.full(C, -1, np.int32)
    cp[:len(cold)] = cold
    got, l2 = fused_slab_step(t0, inputs, alpha, hyper, B, G,
                              neg_pool=P, strat_lanes=lanes, hot_rows=H,
                              cold_pos=jnp.asarray(cp))
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)


def test_dense_hot_equals_weighted_expectation_oracle():
    """Dense-hot negatives == the exact weighted sum over every hot word.

    The negative phase is additive across lanes given fixed inputs, and a
    negative equal to the center is fully masked (the reference skip quirk),
    so with G=1, K=1 the plain step gives exact per-negative deltas:
      step(neg=h) - step(neg=center)  ==  contribution of one draw of h.
    The dense-hot step must equal base + sum_h hot_w[h]*delta(h)
    + w_cold*delta(cold_j) for the sampled cold lanes."""
    from word2bits_tpu.data.pipeline import cold_positions
    from word2bits_tpu.models.cbow_slab import SlabInputs

    B, W, V, D, H = 8, 2, 30, 8, 10
    rng = np.random.default_rng(17)
    u = rng.uniform(-0.5, 0.5, (V, 2 * D)).astype(np.float32)
    toks = rng.integers(-1, V, B + 2 * W).astype(np.int32)
    sents = np.sort(rng.integers(0, 3, B + 2 * W)).astype(np.int32)
    shrink = rng.integers(0, W, B).astype(np.int32)
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=4, reg=0.01)
    alpha = jnp.float32(0.07)
    t0 = jnp.asarray(u)
    centers = np.maximum(toks[W:W + B], 0)

    def plain(neg_col):
        """G=1: per-center tiles; one negative lane holding neg_col."""
        inp = SlabInputs(slab_tokens=jnp.asarray(toks),
                         slab_sents=jnp.asarray(sents),
                         shrink=jnp.asarray(shrink),
                         neg_ids=jnp.asarray(neg_col.reshape(B, 1)))
        h1 = CBOWHyper(bitlevel=1, size=D, window=W, negative=1, reg=0.01)
        tab, loss = fused_slab_step(t0, inp, alpha, h1, B, 1)
        return np.asarray(tab, np.float64), float(loss)

    base_tab, base_loss = plain(centers)  # all lanes masked by skip-center
    kc, w_cold = 2, 1.37
    hot_w = (0.05 + rng.uniform(0, 0.3, H)).astype(np.float32)
    hot_w[0] = 0.0  # id 0 is never drawn
    cold_draws = rng.integers(H, V, (B, kc)).astype(np.int32)

    want_tab = base_tab.copy()
    want_loss = base_loss
    for h in range(1, H):
        tab_h, loss_h = plain(np.full(B, h, np.int32))
        want_tab += hot_w[h] * (tab_h - base_tab)
        want_loss += hot_w[h] * (loss_h - base_loss)
    for j in range(kc):
        tab_c, loss_c = plain(cold_draws[:, j])
        want_tab += w_cold * (tab_c - base_tab)
        want_loss += w_cold * (loss_c - base_loss)

    # dense-hot step with the same cold draws (G=1, kc lanes)
    ids = np.maximum(toks, 0)
    cold = np.flatnonzero(ids >= H).astype(np.int32)
    cp = np.full(max(8, len(cold)), -1, np.int32)
    cp[:len(cold)] = cold
    inp = SlabInputs(slab_tokens=jnp.asarray(toks),
                     slab_sents=jnp.asarray(sents),
                     shrink=jnp.asarray(shrink),
                     neg_ids=jnp.asarray(cold_draws))
    h_kc = CBOWHyper(bitlevel=1, size=D, window=W, negative=kc, reg=0.01)
    got, got_loss = fused_slab_step(t0, inp, alpha, h_kc, B, 1,
                                    hot_rows=H, cold_pos=jnp.asarray(cp),
                                    dense_hot=(w_cold, hot_w))
    np.testing.assert_allclose(np.asarray(got), want_tab, atol=2e-5)
    np.testing.assert_allclose(float(got_loss), want_loss, rtol=1e-4)
