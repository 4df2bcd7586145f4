"""Pallas kernels vs the XLA reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.kernels.quantize_pallas import quantize_pallas
from word2bits_tpu.kernels.score_pallas import quantized_scores_pallas
from word2bits_tpu.ops.quantize import quantize
from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut


@pytest.mark.parametrize("bitlevel", [0, 1, 2, 3, 4, 6])
def test_quantize_pallas_matches_op(bitlevel):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-2, 2, (64, 128)).astype(np.float32))
    got = quantize_pallas(x, bitlevel, 32, True)
    want = quantize(x, bitlevel)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantize_pallas_ragged_rows():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (100, 128)).astype(np.float32))
    got = quantize_pallas(x, 1, 32, True)
    want = quantize(x, 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _xla_negative_phase(cavg3, v_rows, centers3, negs, af3, alpha, bitlevel, reg):
    """The XLA shared-negative phase from models/cbow_slab.py, extracted."""
    from jax import lax
    dt = cavg3.dtype
    T, G, D = cavg3.shape
    q_vn = quantize(v_rows, bitlevel)
    f_neg = lax.dot_general(cavg3, q_vn, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    skip = negs[:, None, :] != centers3[:, :, None]
    m3 = skip.astype(dt) * af3[:, :, None]
    g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m3
    vn_sq = jnp.sum(q_vn * q_vn, axis=-1)
    loss = jnp.sum((jnp.log(sigmoid_exact(-f_neg)) - reg * vn_sq[:, None, :]) * m3)
    cavge = lax.dot_general(g_neg, q_vn, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    dv_neg = lax.dot_general(g_neg, cavg3, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    visits = jnp.sum(m3, axis=1)
    dv_neg = dv_neg - 2.0 * alpha * reg * v_rows * visits[:, :, None]
    return cavge, dv_neg, loss


@pytest.mark.parametrize("reg", [0.0, 0.01])
def test_score_kernel_matches_xla(reg):
    rng = np.random.default_rng(2)
    T, G, K, D, V = 3, 16, 8, 128, 40
    cavg3 = jnp.asarray(rng.uniform(-1, 1, (T, G, D)).astype(np.float32))
    v_rows = jnp.asarray(rng.uniform(-0.5, 0.5, (T, K, D)).astype(np.float32))
    centers3 = jnp.asarray(rng.integers(1, V, (T, G)).astype(np.int32))
    negs = jnp.asarray(rng.integers(1, V, (T, K)).astype(np.int32))
    # force some skip collisions
    negs = negs.at[0, 0].set(centers3[0, 3])
    af3 = jnp.asarray((rng.random((T, G)) < 0.9).astype(np.float32))
    alpha = 0.05
    scalars = jnp.asarray([[alpha]], dtype=jnp.float32)

    got_cavge, got_dv, got_loss = quantized_scores_pallas(
        cavg3, v_rows, centers3, negs, af3, scalars, 1, reg, interpret=True)
    want_cavge, want_dv, want_loss = _xla_negative_phase(
        cavg3, v_rows, centers3, negs, af3, alpha, 1, reg)

    np.testing.assert_allclose(np.asarray(got_cavge), np.asarray(want_cavge),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dv), np.asarray(want_dv),
                               atol=1e-5)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)


class TestHotPallas:
    def test_matches_hot_slice_add(self):
        from word2bits_tpu.kernels.hot_pallas import hot_slice_add_pallas
        from word2bits_tpu.ops.scatter import hot_slice_add
        rng = np.random.default_rng(0)
        V, C, N, H = 300, 40, 777, 128
        table = jnp.asarray(rng.uniform(-1, 1, (V, C)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
        rows = jnp.asarray(rng.uniform(-1, 1, (N, C)).astype(np.float32))
        extra = jnp.asarray(rng.uniform(-1, 1, (H, C)).astype(np.float32))
        want = hot_slice_add(table, ids, rows, H, extra=extra)
        got = hot_slice_add_pallas(table, ids, rows, H, extra=extra,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_step_with_hot_pallas_equals_baseline(self):
        """fused step routed through the Pallas hot kernel == XLA hot path."""
        from word2bits_tpu.data.pipeline import cold_positions
        from word2bits_tpu.models.cbow import CBOWHyper
        from word2bits_tpu.models.cbow_fused import fused_slab_step
        from word2bits_tpu.models.cbow_slab import SlabInputs

        B, W, K, G, V, D, H = 32, 3, 4, 8, 50, 16, 16
        rng = np.random.default_rng(31)
        u = rng.uniform(-0.5, 0.5, (V, 2 * D)).astype(np.float32)
        toks = rng.integers(-1, V, B + 2 * W).astype(np.int32)
        sents = np.sort(rng.integers(0, 4, B + 2 * W)).astype(np.int32)
        inputs = SlabInputs(
            slab_tokens=jnp.asarray(toks), slab_sents=jnp.asarray(sents),
            shrink=jnp.asarray(rng.integers(0, W, B).astype(np.int32)),
            neg_ids=jnp.asarray(rng.integers(1, V, (B // G, K)).astype(np.int32)))
        hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
        ids = np.maximum(toks, 0)
        cold = np.flatnonzero(ids >= H).astype(np.int32)
        cp = np.full(max(8, len(cold)), -1, np.int32)
        cp[:len(cold)] = cold
        kw = dict(hot_rows=H, cold_pos=jnp.asarray(cp))
        base, l1 = fused_slab_step(jnp.asarray(u), inputs, jnp.float32(0.05),
                                   hyper, B, G, **kw)
        got, l2 = fused_slab_step(jnp.asarray(u), inputs, jnp.float32(0.05),
                                  hyper, B, G, hot_pallas=True, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=1e-5)
        np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
