"""Sharded skip-gram step == single-device skip-gram step."""

import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.models.cbow_slab import SlabInputs
from word2bits_tpu.models.skipgram import skipgram_slab_step
from word2bits_tpu.parallel.mesh import make_mesh
from word2bits_tpu.parallel.sharded import pad_vocab_rows, shard_params
from word2bits_tpu.parallel.sharded_skipgram import make_sharded_skipgram_step
from tests.test_sharded_slab import _setup


@pytest.mark.parametrize("mesh_shape,shared", [
    ({"data": 2, "vocab": 4}, 0),
    ({"data": 2, "vocab": 4}, 8),
    ({"data": 4, "vocab": 2}, 16),
])
def test_sharded_skipgram_equals_single(mesh_shape, shared):
    B, W, K, V, D = 64, 3, 4, 45, 16
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    u, v, toks, sents, shrink, negs = _setup(1, B, W, K, V, D, shared)
    alpha = jnp.float32(0.05)

    inputs = SlabInputs(slab_tokens=jnp.asarray(toks),
                        slab_sents=jnp.asarray(sents),
                        shrink=jnp.asarray(shrink),
                        neg_ids=jnp.asarray(negs))
    u1, v1, loss1 = skipgram_slab_step(jnp.asarray(u), jnp.asarray(v), inputs,
                                       alpha, hyper, B, neg_sharing=shared)

    mesh = make_mesh(mesh_shape)
    nv = mesh_shape["vocab"]
    up, vp = pad_vocab_rows(u, nv), pad_vocab_rows(v, nv)
    step = make_sharded_skipgram_step(hyper, mesh, up.shape[0], B,
                                      neg_sharing=shared)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u2, v2, loss2 = step(ud, vd, jnp.asarray(toks), jnp.asarray(sents),
                         jnp.asarray(shrink), jnp.asarray(negs), alpha)

    np.testing.assert_allclose(np.asarray(u2)[:V], np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2)[:V], np.asarray(v1), atol=1e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)
