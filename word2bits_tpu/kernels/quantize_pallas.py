"""Pallas quantization-rounding kernel.

The sign/ternary/2^bitlevel rounding of the reference quantizer
(reference src/word2bits.cpp:73-108) as a tiled VPU kernel: HBM -> VMEM
blocks, branch-free arithmetic per tile.  Semantically identical to
word2bits_tpu.ops.quantize (tested against it, including the bitlevel-3
hole).

XLA already fuses the jnp formulation into neighboring ops, so this kernel
exists for the cases where quantization IS the op (exporting 3.7M x 800
tables, re-quantizing loaded vectors) and as the building block the fused
kernels inline.  `kernel_body` computes on values already in registers —
reused by score_pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_values(x, bitlevel: int):
    """Branch-free quantize on in-register values (usable inside kernels)."""
    if bitlevel == 0:
        return x
    sign = jnp.where(x < 0, jnp.asarray(-1.0, x.dtype), jnp.asarray(1.0, x.dtype))
    mag = jnp.abs(x)
    if bitlevel == 1:
        return sign * (jnp.asarray(1.0, x.dtype) / jnp.asarray(3.0, x.dtype))
    if bitlevel == 2:
        return sign * jnp.where(mag <= 0.5, jnp.asarray(0.25, x.dtype),
                                jnp.asarray(0.75, x.dtype))
    if bitlevel == 3:
        return x * jnp.asarray(0.0, x.dtype)
    seg = float(2 ** (bitlevel - 1))
    casted = jnp.minimum(jnp.floor(mag * seg + 0.5), seg)
    return sign * (casted / jnp.asarray(seg, x.dtype))


def _quantize_kernel(bitlevel, x_ref, o_ref):
    o_ref[:] = quantize_values(x_ref[:], bitlevel)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def quantize_pallas(x: jax.Array, bitlevel: int, block_rows: int = 512,
                    interpret: bool = False) -> jax.Array:
    """Quantize a 2D array tile-by-tile through VMEM."""
    if x.ndim != 2:
        raise ValueError("quantize_pallas expects a 2D array")
    R, C = x.shape
    br = min(block_rows, R)
    grid = (pl.cdiv(R, br),)
    return pl.pallas_call(
        functools.partial(_quantize_kernel, bitlevel),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((br, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
