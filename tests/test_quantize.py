"""Table-driven tests of quantize() against the verified reference semantics
(reference src/word2bits.cpp:73-108; SURVEY.md section 2 C8)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.ops.quantize import quantize, quantize_ste, quantized_storage_bits


def ref_quantize_py(num: float, bitlevel: int) -> float:
    """Direct Python transcription of the reference algorithm as an oracle."""
    if bitlevel == 0:
        return num
    retval = 0.0
    sign = -1.0 if num < 0 else 1.0
    num *= sign
    if bitlevel == 1:
        return np.float32(sign) / np.float32(3.0)
    if bitlevel == 2:
        retval = 0.25 if (num >= 0 and num <= 0.5) else 0.75
    if bitlevel >= 4:
        seg = int(math.pow(2, bitlevel - 1))
        casted = int(np.float32(num * seg) + np.float32(0.5))
        casted = seg if casted > seg else casted
        retval = casted / float(seg)
    return sign * retval


SAMPLE_INPUTS = [
    0.0, -0.0, 1e-8, -1e-8, 0.1, -0.1, 0.25, -0.25, 0.49999, 0.5, 0.50001,
    -0.5, 0.75, -0.75, 0.999, 1.0, 1.0001, -1.0, 2.5, -2.5, 100.0, -100.0,
    0.0625, 0.093749, 0.09375, 0.09376, -0.031249, 0.333333,
]


@pytest.mark.parametrize("bitlevel", [0, 1, 2, 3, 4, 5, 8])
def test_quantize_matches_reference_oracle(bitlevel):
    x = jnp.asarray(SAMPLE_INPUTS, dtype=jnp.float32)
    got = np.asarray(quantize(x, bitlevel))
    want = np.asarray([ref_quantize_py(v, bitlevel) for v in SAMPLE_INPUTS],
                      dtype=np.float32)
    np.testing.assert_array_equal(got, want)


def test_bitlevel0_identity():
    x = jnp.asarray(np.random.default_rng(0).normal(size=128), dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(quantize(x, 0)), np.asarray(x))


def test_bitlevel1_values():
    x = jnp.asarray([-2.0, -0.001, 0.0, 0.001, 2.0], dtype=jnp.float32)
    got = np.asarray(quantize(x, 1))
    third = np.float32(1.0) / np.float32(3.0)
    np.testing.assert_array_equal(got, np.asarray([-third, -third, third, third, third]))


def test_bitlevel2_boundary():
    x = jnp.asarray([0.5, 0.5000001, -0.5, -0.5000001], dtype=jnp.float32)
    got = np.asarray(quantize(x, 2))
    np.testing.assert_array_equal(got, np.asarray([0.25, 0.75, -0.25, -0.75],
                                                  dtype=np.float32))


def test_bitlevel3_hole_is_reproduced():
    """[verified] reference bitlevel 3 maps everything to 0."""
    x = jnp.asarray(SAMPLE_INPUTS, dtype=jnp.float32)
    got = np.asarray(quantize(x, 3))
    assert np.all(got == 0.0)


def test_bitlevel4_grid():
    # S=8: values snap to k/8 with round-half-up, clipped at 1.
    x = jnp.asarray([0.0624, 0.0625, 0.1875, 5.0], dtype=jnp.float32)
    got = np.asarray(quantize(x, 4))
    np.testing.assert_allclose(got, [0.0, 0.125, 0.25, 1.0], atol=0)


def test_quantize_random_dense_vs_oracle():
    rng = np.random.default_rng(1)
    xs = rng.uniform(-2, 2, size=4096).astype(np.float32)
    for bl in (1, 2, 4, 6):
        got = np.asarray(quantize(jnp.asarray(xs), bl))
        want = np.asarray([ref_quantize_py(float(v), bl) for v in xs], np.float32)
        np.testing.assert_array_equal(got, want)


def test_ste_gradient_is_identity():
    x = jnp.asarray([0.3, -0.7, 1.2], dtype=jnp.float32)
    for bl in (0, 1, 2, 4):
        g = jax.grad(lambda t: jnp.sum(quantize_ste(t, bl) * jnp.asarray([1., 2., 3.])))(x)
        np.testing.assert_array_equal(np.asarray(g), np.asarray([1., 2., 3.], np.float32))


def test_quantize_rejects_traced_bitlevel():
    with pytest.raises(TypeError):
        quantize(jnp.zeros(4), jnp.int32(1))


def test_storage_bits():
    assert quantized_storage_bits(0) == 32
    assert quantized_storage_bits(1) == 1
    assert quantized_storage_bits(2) == 2


def test_config_rejects_bitlevel3():
    from word2bits_tpu.config import Word2BitsConfig
    with pytest.raises(ValueError):
        Word2BitsConfig(bitlevel=3)
    Word2BitsConfig(bitlevel=2)  # fine
