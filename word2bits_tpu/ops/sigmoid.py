"""Sigmoid variants matching the reference's two code paths.

The reference uses two different sigmoids:

1. Gradient path: a 1000-entry lookup table over x in [-6, 6]
   (reference src/word2bits.cpp:614-618 builds expTable; :473-475 indexes it
   with `(int)((f + MAX_EXP) * (EXP_TABLE_SIZE / MAX_EXP / 2))`).  Because
   EXP_TABLE_SIZE / MAX_EXP / 2 is C *integer* division, the scale is
   1000/6/2 == 83 (not 83.33).  Outside [-6, 6] the gradient saturates to
   sigma = 1 (f > 6) or sigma = 0 (f < -6).

2. Loss path: exact sigmoid clamped to 1 above +6 and to 1e-9 below -6
   (reference src/word2bits.cpp:67-71), used only inside log() for telemetry.

On TPU the exact sigmoid costs nothing, but the LUT's staircase shifts
gradients slightly; both are provided, `sigmoid_lut` reproduces the reference
bin-for-bin without a table gather by recomputing sigma at the bin's x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EXP_TABLE_SIZE = 1000  # reference src/word2bits.cpp:30
MAX_EXP = 6.0          # reference src/word2bits.cpp:31
_LUT_SCALE = 83.0      # C integer division: 1000 / 6 / 2 == 83


def sigmoid_lut(f: jax.Array) -> jax.Array:
    """The reference gradient-path sigmoid: expTable lookup with +-6 saturation.

    expTable[i] = sigma((i/1000*2 - 1)*6); index = trunc((f+6)*83).  We
    evaluate sigma at the bin's representative x instead of gathering from a
    table — identical values, no memory traffic.
    """
    f = jnp.asarray(f)
    idx = jnp.floor((f + MAX_EXP) * _LUT_SCALE)  # f+6 >= 0 in-branch: trunc == floor
    x_bin = (idx / EXP_TABLE_SIZE * 2.0 - 1.0) * MAX_EXP
    sig = jax.nn.sigmoid(x_bin.astype(f.dtype))
    one = jnp.asarray(1.0, f.dtype)
    zero = jnp.asarray(0.0, f.dtype)
    return jnp.where(f > MAX_EXP, one, jnp.where(f < -MAX_EXP, zero, sig))


def sigmoid_exact(f: jax.Array) -> jax.Array:
    """The reference loss-path sigmoid (reference src/word2bits.cpp:67-71):
    1 above +6, 1e-9 below -6, exact in between."""
    f = jnp.asarray(f)
    sig = jax.nn.sigmoid(f)
    one = jnp.asarray(1.0, f.dtype)
    tiny = jnp.asarray(1e-9, f.dtype)
    return jnp.where(f > MAX_EXP, one, jnp.where(f < -MAX_EXP, tiny, sig))
