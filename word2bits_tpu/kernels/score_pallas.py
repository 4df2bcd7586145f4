"""Fused negative-phase kernel: quantize -> sigmoid-dot -> gradient matmuls.

One Pallas kernel per tile of G centers fuses the whole shared-negative
phase of the slab step (models/cbow_slab.py):

    q_vn   = quantize(v_rows)                 (VPU, in-register)
    f      = cavg @ q_vn^T                    (MXU, G x D x K)
    g      = (0 - sigma_LUT(f)) * alpha * skip-mask
    cavge += g @ q_vn                         (MXU, G x K x D)
    dv     = g^T @ cavg - 2*alpha*reg*v_rows*visits   (MXU, K x G x D)
    loss  += sum(log sigma_exact(-f) - reg*||q_vn||^2) masked

compared to the XLA path this avoids materializing q_vn and f to HBM and
keeps all three contractions on-chip per tile.  Exact same math as the XLA
implementation (tested equal, interpret mode on CPU and compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from word2bits_tpu.kernels.quantize_pallas import quantize_values
# the ops sigmoids are plain jnp expressions — usable inside Pallas kernels
# directly, so the LUT semantics live in exactly one place
from word2bits_tpu.ops.sigmoid import (
    sigmoid_exact as _sigmoid_exact_values,
    sigmoid_lut as _sigmoid_lut_values,
)


def _kernel(bitlevel, reg, pool,
            cavg_ref, vrows_ref, centers_ref, negs_ref, af_ref, scalars_ref,
            cavge_ref, dv_ref, loss_ref):
    alpha = scalars_ref[0, 0]
    dt = cavg_ref.dtype
    TB = cavg_ref.shape[0]                 # tiles per grid block
    cavg = cavg_ref[:]                     # [TB, G, D]
    v_rows = vrows_ref[:]                  # [TB, P*K, D]
    q_vn = quantize_values(v_rows, bitlevel)
    af = af_ref[:]                         # [TB, G, 1] float
    centers = centers_ref[:]               # [TB, G, 1] int32
    negs = negs_ref[:]                     # [TB, 1, P*K] int32

    # f = cavg @ q_vn^T : [TB, G, P*K] (batched over the block's tiles —
    # TB > 1 amortizes Mosaic's per-grid-step overhead; round-5 experiment)
    f = jax.lax.dot_general(cavg, q_vn, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    skip = (negs != centers).astype(dt)    # [TB, G, P*K] broadcast compare
    m = skip * af                          # [TB, G, P*K]
    if pool > 1:
        # center g uses only negative pool g % P (cbow_slab.pool_mask,
        # computed in-register: iota on the VPU)
        _, G, PK = f.shape
        ctr_pool = jax.lax.broadcasted_iota(jnp.int32, (G, PK), 0) % pool
        neg_pool_ = jax.lax.broadcasted_iota(jnp.int32, (G, PK), 1) \
            // (PK // pool)
        m = m * (ctr_pool == neg_pool_).astype(dt)[None]
    g = (0.0 - _sigmoid_lut_values(f)) * alpha * m

    if reg:
        vn_sq = jnp.sum(q_vn * q_vn, axis=-1)[:, None, :]   # [TB, 1, K]
        loss_ref[pl.program_id(0), 0] = jnp.sum(
            (jnp.log(_sigmoid_exact_values(-f)) - reg * vn_sq) * m)
    else:
        loss_ref[pl.program_id(0), 0] = jnp.sum(
            jnp.log(_sigmoid_exact_values(-f)) * m)

    # cavge contribution: g @ q_vn : [TB, G, D]
    cavge_ref[:] = jax.lax.dot_general(
        g, q_vn, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # dv: g^T @ cavg - 2*alpha*reg * v_rows * visits
    dv = jax.lax.dot_general(g, cavg, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # [TB,K,D]
    if reg:
        visits = jnp.sum(m, axis=1)[..., None]              # [TB, K, 1]
        dv = dv - (2.0 * alpha * reg) * v_rows * visits
    dv_ref[:] = dv


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9))
def quantized_scores_pallas(cavg3, v_rows, centers3, negs, af3, scalars,
                            bitlevel: int, reg: float,
                            neg_pool: int = 1, interpret: bool = False):
    """Run the fused negative phase over all T tiles.

    cavg3   [T, G, D] context averages
    v_rows  [T, P*K, D] gathered (unquantized) negative rows
    centers3[T, G]    center ids
    negs    [T, P*K]  negative ids (neg_pool=P pools per tile; see
                      cbow_slab.pool_mask for the center->pool routing)
    af3     [T, G]    active-center mask (float)
    scalars [1, 1]    (alpha,) — SMEM scalar
    Returns (cavge [T,G,D], dv_neg [T,P*K,D], loss [])."""
    T, G, D = cavg3.shape
    K = v_rows.shape[1]
    # tiles per grid block: bigger blocks amortize Mosaic's per-step
    # overhead; pick the largest divisor of T whose block stays ~<= 2 MB
    TB = 1
    for cand in (16, 8, 4, 2):
        if T % cand == 0 and cand * (G + K) * D * 4 <= (2 << 20):
            TB = cand
            break
    nb = T // TB
    cavge, dv, losses = pl.pallas_call(
        functools.partial(_kernel, bitlevel, reg, neg_pool),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((TB, G, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, K, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, G, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, K), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, G, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, G, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, K, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole (nb,1) array in SMEM; each grid step writes its row
            pl.BlockSpec((nb, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, G, D), cavg3.dtype),
            jax.ShapeDtypeStruct((T, K, D), cavg3.dtype),
            jax.ShapeDtypeStruct((nb, 1), cavg3.dtype),
        ),
        interpret=interpret,
    )(cavg3, v_rows, centers3[..., None], negs[:, None, :],
      af3[..., None].astype(cavg3.dtype), scalars)
    return cavge, dv, jnp.sum(losses)
