"""Fused context+positive kernel == the XLA banded path (interpret, CPU).

kernels/context_pallas.py computes quantize -> banded context sums ->
center scores -> positive gradients in one VMEM pass; the fused chunk with
context_pallas=True must produce the base chunk's exact updates at
reg == 0 (modulo float summation order inside the kernel's f32 matmul).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
from word2bits_tpu.models.cbow_fused import make_fused_train_chunk
from word2bits_tpu.sampling.unigram import build_alias_table


@pytest.mark.parametrize("steps,pool,simpl,bitlevel", [
    (1, 1, "add", 1), (2, 2, "add", 1), (2, 1, "span", 1),
    # the kernel's in-register quantizer must track ops.quantize at every
    # supported grid (0 = identity, 2-bit, and the >=4 rounding branch)
    (1, 1, "add", 0), (1, 1, "add", 2), (1, 1, "add", 4), (1, 1, "add", 8),
])
def test_fused_chunk_context_pallas_matches_base(rng, steps, pool, simpl,
                                                 bitlevel):
    V, D, B, W, G = 300, 16, 64, 3, 8
    hyper = CBOWHyper(bitlevel=bitlevel, size=D, window=W, negative=5,
                      reg=0.0)
    n = 4 * B + 2 * W + 16
    tokens = jnp.asarray(rng.integers(0, V, size=n).astype(np.int32))
    sents = jnp.asarray((np.arange(n) // 97).astype(np.int32))
    atab = build_alias_table(np.ones(V))
    table = jnp.asarray(rng.normal(size=(V, 2 * D)).astype(np.float32))
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(B),
                           denom=jnp.float32(1e6))
    key = jax.random.PRNGKey(5)

    kw = {}
    tp = table
    if simpl == "span":
        cp, vp = (-2 * D) % 128, (-V) % 64
        kw = dict(scatter_impl="span", col_pad=cp, span_window=64,
                  span_chunk=32)
        tp = jnp.pad(table, ((0, vp), (0, cp)))
    base = make_fused_train_chunk(hyper, V, B, steps, neg_sharing=G,
                                  neg_pool=pool, donate=False, banded=8,
                                  **kw)
    t0, l0 = base(tp, tokens, sents, atab.prob, atab.alias, scalars, key)
    fused = make_fused_train_chunk(hyper, V, B, steps, neg_sharing=G,
                                   neg_pool=pool, donate=False, banded=8,
                                   context_pallas=True, **kw)
    t1, l1 = fused(tp, tokens, sents, atab.prob, atab.alias, scalars, key)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t1[:V, :2 * D]),
                               np.asarray(t0[:V, :2 * D]),
                               atol=1e-4, rtol=1e-4)


def test_context_pallas_requires_banded_and_reg0():
    hyper = CBOWHyper(bitlevel=1, size=16, window=2, negative=3, reg=0.0)
    fn = make_fused_train_chunk(hyper, 100, 32, 1, neg_sharing=8,
                                context_pallas=True)  # banded missing
    args = (jnp.zeros((100, 32), jnp.float32),
            jnp.zeros((200,), jnp.int32), jnp.zeros((200,), jnp.int32),
            jnp.ones((100,), jnp.float32), jnp.zeros((100,), jnp.int32),
            ChunkScalars(base0=jnp.int32(2), alpha0=jnp.float32(0.05),
                         wca_start=jnp.float32(0.0),
                         wca_per_step=jnp.float32(32.0),
                         denom=jnp.float32(1e6)),
            jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="banded"):
        fn(*args)
    hyper_r = CBOWHyper(bitlevel=1, size=16, window=2, negative=3, reg=0.1)
    fn2 = make_fused_train_chunk(hyper_r, 100, 32, 1, neg_sharing=8,
                                 banded=8, context_pallas=True)
    with pytest.raises(ValueError, match="reg"):
        fn2(*args)


@pytest.mark.parametrize("sharing,simpl", [(0, "add"), (8, "add"),
                                           (0, "span")])
def test_slab_chunk_context_pallas_matches_base(rng, sharing, simpl):
    """The SLAB chunk (split u/v tables, incl. the exact per-center mode)
    with context_pallas == the base chunk at reg == 0."""
    from word2bits_tpu.models.cbow_slab import make_slab_train_chunk

    V, D, B, W, steps = 300, 16, 64, 3, 2
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=5, reg=0.0)
    n = 4 * B + 2 * W + 16
    tokens = jnp.asarray(rng.integers(0, V, size=n).astype(np.int32))
    sents = jnp.asarray((np.arange(n) // 97).astype(np.int32))
    atab = build_alias_table(np.ones(V))
    u = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(B),
                           denom=jnp.float32(1e6))
    key = jax.random.PRNGKey(9)

    kw = {}
    pu, pv = u, v
    if simpl == "span":
        pad = ((0, (-V) % 64), (0, (-D) % 128))
        kw = dict(scatter_impl="span", span_window=64, span_chunk=32)
        pu, pv = jnp.pad(u, pad), jnp.pad(v, pad)
    base = make_slab_train_chunk(hyper, V, B, steps, neg_sharing=sharing,
                                 donate=False, banded=8, **kw)
    u0, v0, l0 = base(pu, pv, tokens, sents, atab.prob, atab.alias,
                      scalars, key)
    ctx = make_slab_train_chunk(hyper, V, B, steps, neg_sharing=sharing,
                                donate=False, banded=8,
                                context_pallas=True, **kw)
    u1, v1, l1 = ctx(pu, pv, tokens, sents, atab.prob, atab.alias,
                     scalars, key)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u1[:V, :D]), np.asarray(u0[:V, :D]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v1[:V, :D]), np.asarray(v0[:V, :D]),
                               atol=1e-4, rtol=1e-4)
