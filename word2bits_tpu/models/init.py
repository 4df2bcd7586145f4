"""Parameter initialization.

The reference initializes BOTH tables U(-0.5, 0.5) — no 1/dim scaling, unlike
original word2vec — from a single sequential LCG stream seeded at 1, filling
the v (target/output) table first, then u (context/input)
(reference src/word2bits.cpp:343-361).  At 1-bit quantization only the signs
of the init survive into the first forward pass, so exact parity matters;
`init="reference"` reproduces the stream bit-for-bit via vectorized LCG
skip-ahead.  `init="uniform"` is the same distribution from jax.random.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from word2bits_tpu.utils.lcg import lcg_uniform_block

_BLOCK = 1 << 24  # 16M values per host block (128 MB of u64 lane states)


def _lcg_matrix(start_draw: int, rows: int, cols: int) -> np.ndarray:
    n = rows * cols
    out = np.empty(n, dtype=np.float32)
    for ofs in range(0, n, _BLOCK):
        m = min(_BLOCK, n - ofs)
        out[ofs:ofs + m] = lcg_uniform_block(start_draw + ofs, m)
    return out.reshape(rows, cols)


def init_params(vocab_size: int, size: int, init: str = "reference",
                seed: int = 1, dtype=jnp.float32,
                as_numpy: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Returns (u, v), each [vocab_size, size] in `dtype`.

    "reference": exact reproduction of reference InitNet (v filled first from
    LCG seed 1, then u continues the same stream).
    "uniform":   U(-0.5, 0.5) from jax.random with `seed`.

    as_numpy=True keeps the result HOST-side (numpy): at flagship scale
    (3.7M x 800d) eagerly shipping u and v to the chip forces build_engine's
    padded-fused-table assembly through a device round-trip that peaks at
    ~2x the table and OOMs the 16 GB chip — train() assembles host-side and
    uploads the final table once.
    """
    if init == "reference":
        n = vocab_size * size
        v = _lcg_matrix(0, vocab_size, size)
        u = _lcg_matrix(n, vocab_size, size)
        if as_numpy:
            npdt = jnp.dtype(dtype)  # numpy dtype (ml_dtypes covers bf16)
            return (u.astype(npdt, copy=False), v.astype(npdt, copy=False))
        return (jnp.asarray(u, dtype=dtype), jnp.asarray(v, dtype=dtype))
    if init == "uniform":
        ku, kv = jax.random.split(jax.random.PRNGKey(seed))
        u = jax.random.uniform(ku, (vocab_size, size), dtype=dtype,
                               minval=-0.5, maxval=0.5)
        v = jax.random.uniform(kv, (vocab_size, size), dtype=dtype,
                               minval=-0.5, maxval=0.5)
        if as_numpy:
            return (np.asarray(u), np.asarray(v))
        return (u, v)
    raise ValueError(f"unknown init {init!r}")
