"""Sharded slab step == single-device slab step on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.models.cbow_slab import SlabInputs, slab_step
from word2bits_tpu.parallel.mesh import make_mesh
from word2bits_tpu.parallel.sharded import pad_vocab_rows, shard_params
from word2bits_tpu.parallel.sharded_slab import make_sharded_slab_step


def _setup(seed, B, W, K, V, D, shared):
    rng = np.random.default_rng(seed)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    toks = rng.integers(1, V, B + 2 * W).astype(np.int32)
    sents = np.sort(rng.integers(0, 5, B + 2 * W)).astype(np.int32)
    toks[:2] = -1
    sents[:2] = -1
    shrink = rng.integers(0, W, B).astype(np.int32)
    rows = B // shared if shared else B
    negs = rng.integers(1, V, (rows, K)).astype(np.int32)
    return u, v, toks, sents, shrink, negs


@pytest.mark.parametrize("mesh_shape,shared", [
    ({"data": 8, "vocab": 1}, 0),
    ({"data": 2, "vocab": 4}, 0),
    ({"data": 2, "vocab": 4}, 8),
    ({"data": 4, "vocab": 2}, 16),
])
def test_sharded_slab_equals_single(mesh_shape, shared):
    B, W, K, V, D = 64, 3, 4, 45, 16
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    u, v, toks, sents, shrink, negs = _setup(0, B, W, K, V, D, shared)
    alpha = jnp.float32(0.05)

    inputs = SlabInputs(slab_tokens=jnp.asarray(toks),
                        slab_sents=jnp.asarray(sents),
                        shrink=jnp.asarray(shrink),
                        neg_ids=jnp.asarray(negs))
    u1, v1, loss1 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                              hyper, B, neg_sharing=shared)

    mesh = make_mesh(mesh_shape)
    nv = mesh_shape["vocab"]
    up, vp = pad_vocab_rows(u, nv), pad_vocab_rows(v, nv)
    step = make_sharded_slab_step(hyper, mesh, up.shape[0], B,
                                  neg_sharing=shared)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u2, v2, loss2 = step(ud, vd, jnp.asarray(toks), jnp.asarray(sents),
                         jnp.asarray(shrink), jnp.asarray(negs), alpha)

    np.testing.assert_allclose(np.asarray(u2)[:V], np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2)[:V], np.asarray(v1), atol=1e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)
