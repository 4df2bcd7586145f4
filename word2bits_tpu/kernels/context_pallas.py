"""Fused context+positive forward kernel: quantize -> banded context sums
-> center scores -> positive gradients in ONE VMEM-resident pass per tile.

The round-5 floor decomposition (tools/floor_ablate.py, ARCHITECTURE.md)
put the banded context stage at ~145 us and the positive term at ~26 us of
the shipped bench step's 488 us scatter-free floor — spread across many
small XLA kernels (bf16->f32 casts, quantize, mask dot, divides, score
reductions) each paying its own HBM round-trip on [B, D]-class temps.
This kernel keeps one batch tile's slab window, mask, and center-v rows in
VMEM and emits only the step's real downstream operands:

  cavg       [B, D] f32   context averages     (negative phase input)
  cavge      [B, D] f32   positive gradient accumulator seed
  dv_center  [B, D] f32   center-v update rows
  af         [B, 1] f32   active flags (valid sentence & nonempty context)
  loss       [Nt, 1] f32  per-tile positive log-sigmoid loss sum

Semantics identical to the fused/slab steps' banded path at reg == 0
(reference math: context average src/word2bits.cpp:438-449, positive
score/gradient :462-491 for d == 0); reg != 0 keeps the XLA path (the
squared-norm loss terms and weight-decay consume q_slab/u_slab, which this
kernel deliberately never materializes).  The quantizer and the +-6 LUT
sigmoid are the shared in-register building blocks
(kernels/quantize_pallas.quantize_values, ops/sigmoid) so the reference
semantics live in exactly one place.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from word2bits_tpu.kernels.quantize_pallas import quantize_values
from word2bits_tpu.ops.sigmoid import (
    sigmoid_exact as _sigmoid_exact_values,
    sigmoid_lut as _sigmoid_lut_values,
)


def _kernel(bitlevel: int,
            uwin_ref, vc_ref, m_ref, valid_ref, scal_ref,
            cavg_ref, cavge_ref, dvc_ref, af_ref, loss_ref):
    alpha = scal_ref[0, 0]
    q = quantize_values(uwin_ref[0].astype(jnp.float32), bitlevel)  # [F, D]
    mf = m_ref[0].astype(jnp.float32)                    # [tile, F]
    csum = jax.lax.dot_general(mf, q, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    cw = jnp.sum(mf, axis=1, keepdims=True)              # [tile, 1]
    af = valid_ref[:] * (cw > 0).astype(jnp.float32)     # [tile, 1]
    cavg = csum / jnp.maximum(cw, 1.0)
    q_vc = quantize_values(vc_ref[:].astype(jnp.float32), bitlevel)
    f_pos = jnp.sum(cavg * q_vc, axis=1, keepdims=True)  # [tile, 1]
    g_pos = (1.0 - _sigmoid_lut_values(f_pos)) * alpha * af
    cavg_ref[:] = cavg
    cavge_ref[:] = g_pos * q_vc
    dvc_ref[:] = g_pos * cavg
    af_ref[:] = af
    loss_ref[pl.program_id(0), 0] = jnp.sum(
        jnp.log(_sigmoid_exact_values(f_pos)) * af)


@functools.partial(jax.jit, static_argnums=(5, 6))
def fused_context_pallas(uwin3, vc, Mb, valid, scalars,
                         bitlevel: int, interpret: bool = False):
    """(cavg, cavge, dv_center, af, loss_sum) for the banded fused step.

    uwin3   [Nt, F, D]  sliding tile windows of the slab's u-half
                        (ops/windowed._tile_windows on the bf16 rows)
    vc      [B, D]      center v-half rows (bf16 ok; quantized in-kernel)
    Mb      [Nt, tile, F] banded context masks (0/1; any float dtype)
    valid   [B, 1] f32  center-is-real-token flags
    scalars [1, 1] f32  alpha
    """
    Nt, F, D = uwin3.shape
    B = vc.shape[0]
    tile = B // Nt
    kernel = functools.partial(_kernel, bitlevel)
    out = pl.pallas_call(
        kernel,
        grid=(Nt,),
        in_specs=[
            pl.BlockSpec((1, F, D), lambda k: (k, 0, 0)),
            pl.BlockSpec((tile, D), lambda k: (k, 0)),
            pl.BlockSpec((1, tile, F), lambda k: (k, 0, 0)),
            pl.BlockSpec((tile, 1), lambda k: (k, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, D), lambda k: (k, 0)),
            pl.BlockSpec((tile, D), lambda k: (k, 0)),
            pl.BlockSpec((tile, D), lambda k: (k, 0)),
            pl.BlockSpec((tile, 1), lambda k: (k, 0)),
            # whole (Nt, 1) array in SMEM; each grid step writes its own
            # row (scalar stores go to SMEM, not VMEM — score_pallas
            # convention)
            pl.BlockSpec((Nt, 1), lambda k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((Nt, 1), jnp.float32),
        ],
        interpret=interpret,
    )(uwin3, vc, Mb, valid, scalars)
    cavg, cavge, dvc, af, loss = out
    return cavg, cavge, dvc, af[:, 0], jnp.sum(loss)
