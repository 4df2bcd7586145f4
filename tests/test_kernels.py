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
