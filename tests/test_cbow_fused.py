"""Fused (V,2D) table step == split-table slab step."""

import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.models.cbow_fused import (
    deinterleave,
    fused_slab_step,
    interleave,
)
from word2bits_tpu.models.cbow_slab import slab_step
from tests.test_cbow_slab import _setup


@pytest.mark.parametrize("bitlevel,reg", [(1, 0.0), (0, 0.01), (2, 0.005)])
def test_fused_equals_split(bitlevel, reg):
    B, W, K, G = 32, 3, 4, 8
    u, v, inputs = _setup(B=B, W=W, K=K)
    rng = np.random.default_rng(5)
    negs = rng.integers(1, 50, (B // G, K)).astype(np.int32)
    inputs = inputs._replace(neg_ids=jnp.asarray(negs))
    hyper = CBOWHyper(bitlevel=bitlevel, size=16, window=W, negative=K,
                      reg=reg)
    alpha = jnp.float32(0.05)

    u1, v1, loss1 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                              hyper, B, neg_sharing=G)
    table = interleave(jnp.asarray(u), jnp.asarray(v))
    table2, loss2 = fused_slab_step(table, inputs, alpha, hyper, B,
                                    neg_sharing=G)
    u2, v2 = deinterleave(table2)

    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)


def test_fused_requires_sharing():
    u, v, inputs = _setup()
    hyper = CBOWHyper(bitlevel=1, size=16, window=3, negative=4)
    with pytest.raises(ValueError):
        fused_slab_step(interleave(jnp.asarray(u), jnp.asarray(v)), inputs,
                        jnp.float32(0.05), hyper, 32, neg_sharing=0)


def test_interleave_roundtrip():
    rng = np.random.default_rng(0)
    u = rng.uniform(-1, 1, (10, 8)).astype(np.float32)
    v = rng.uniform(-1, 1, (10, 8)).astype(np.float32)
    u2, v2 = deinterleave(interleave(jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_array_equal(np.asarray(u2), u)
    np.testing.assert_array_equal(np.asarray(v2), v)


def test_fused_neg_pool_equals_split():
    """Fused step with neg_pool must match the split slab step with the
    same pooled negatives."""
    import numpy as np
    from word2bits_tpu.models.cbow_slab import SlabInputs, slab_step

    B, W, K, G, P, V, D = 32, 3, 4, 8, 4, 50, 16
    T = B // G
    rng = np.random.default_rng(5)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    toks = rng.integers(1, V, B + 2 * W).astype(np.int32)
    sents = np.sort(rng.integers(0, 4, B + 2 * W)).astype(np.int32)
    shrink = rng.integers(0, W, B).astype(np.int32)
    negs = rng.integers(1, V, (T, P * K)).astype(np.int32)
    inputs = SlabInputs(slab_tokens=jnp.asarray(toks),
                        slab_sents=jnp.asarray(sents),
                        shrink=jnp.asarray(shrink),
                        neg_ids=jnp.asarray(negs))
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    alpha = jnp.float32(0.05)

    u1, v1, loss1 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                              hyper, B, neg_sharing=G, neg_pool=P)
    table, loss2 = fused_slab_step(interleave(jnp.asarray(u), jnp.asarray(v)),
                                   inputs, alpha, hyper, B, G, neg_pool=P)
    u2, v2 = deinterleave(table)

    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
