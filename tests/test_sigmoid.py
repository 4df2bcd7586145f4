"""Tests for the two reference sigmoid paths (SURVEY.md section 2 C2)."""

import math

import jax.numpy as jnp
import numpy as np

from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut, EXP_TABLE_SIZE, MAX_EXP


def build_reference_exp_table():
    """Transcription of reference src/word2bits.cpp:614-618."""
    table = np.empty(EXP_TABLE_SIZE, dtype=np.float32)
    for i in range(EXP_TABLE_SIZE):
        e = np.float32(math.exp((i / EXP_TABLE_SIZE * 2 - 1) * MAX_EXP))
        table[i] = e / (e + np.float32(1.0))
    return table


def ref_lut_sigmoid(f: float, table: np.ndarray) -> float:
    """Transcription of the gradient-path lookup (reference src/word2bits.cpp:473-475).
    Note EXP_TABLE_SIZE / MAX_EXP / 2 is C integer division == 83."""
    if f > MAX_EXP:
        return 1.0
    if f < -MAX_EXP:
        return 0.0
    return float(table[int((f + MAX_EXP) * (1000 // 6 // 2))])


def test_lut_matches_reference_table():
    table = build_reference_exp_table()
    fs = np.linspace(-6.5, 6.5, 4001).astype(np.float32)
    got = np.asarray(sigmoid_lut(jnp.asarray(fs)))
    want = np.asarray([ref_lut_sigmoid(float(f), table) for f in fs], np.float32)
    # Bin selection must agree exactly; within a bin, recomputing sigma in
    # float32 vs the reference's table construction differs by ~1e-6, far
    # below the ~6e-3 bin quantization itself.
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_lut_saturation():
    fs = jnp.asarray([6.0001, 100.0, -6.0001, -100.0], dtype=jnp.float32)
    got = np.asarray(sigmoid_lut(fs))
    np.testing.assert_array_equal(got, [1.0, 1.0, 0.0, 0.0])


def test_exact_sigmoid_clamps():
    fs = jnp.asarray([6.0001, -6.0001, 0.0], dtype=jnp.float32)
    got = np.asarray(sigmoid_exact(fs))
    np.testing.assert_allclose(got, [1.0, 1e-9, 0.5], rtol=1e-6)
