"""Vocab-sharded + data-parallel step == single-device step, numerically
(SURVEY.md section 4: distributed tests on a virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import Batch, CBOWHyper, cbow_minibatch_update
from word2bits_tpu.parallel.mesh import make_mesh
from word2bits_tpu.parallel.sharded import (
    make_sharded_train_step,
    pad_vocab_rows,
    shard_params,
)


def _random_batch(rng, B, V, W, K):
    centers = rng.integers(1, V, B).astype(np.int32)
    ctx_ids = rng.integers(1, V, (B, 2 * W)).astype(np.int32)
    ctx_mask = rng.random((B, 2 * W)) < 0.7
    neg_ids = rng.integers(1, V, (B, K)).astype(np.int32)
    valid = rng.random(B) < 0.95
    return Batch(
        centers=jnp.asarray(centers), ctx_ids=jnp.asarray(ctx_ids),
        ctx_mask=jnp.asarray(ctx_mask), neg_ids=jnp.asarray(neg_ids),
        valid=jnp.asarray(valid))


@pytest.mark.parametrize("mesh_shape", [
    {"data": 8, "vocab": 1},
    {"data": 1, "vocab": 8},
    {"data": 2, "vocab": 4},
])
def test_sharded_equals_single_device(mesh_shape):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    rng = np.random.default_rng(0)
    V, D, B, W, K = 37, 16, 16, 2, 3  # V deliberately not divisible by 8
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)

    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    batch = _random_batch(rng, B, V, W, K)
    alpha = jnp.float32(0.05)

    u1, v1, loss1 = cbow_minibatch_update(
        jnp.asarray(u), jnp.asarray(v), batch, alpha, hyper)

    mesh = make_mesh(mesh_shape)
    nv = mesh_shape.get("vocab", 1)
    up = pad_vocab_rows(u, nv)
    vp = pad_vocab_rows(v, nv)
    step = make_sharded_train_step(hyper, mesh, up.shape[0], B)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u2, v2, loss2 = step(ud, vd, batch.centers, batch.ctx_ids, batch.ctx_mask,
                         batch.neg_ids, batch.valid, alpha)

    np.testing.assert_allclose(np.asarray(u2)[:V], np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2)[:V], np.asarray(v1), atol=1e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4)


def test_padding_rows_untouched():
    rng = np.random.default_rng(1)
    V, D, B, W, K = 13, 8, 8, 2, 2
    hyper = CBOWHyper(bitlevel=0, size=D, window=W, negative=K)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    mesh = make_mesh({"data": 2, "vocab": 4})
    up, vp = pad_vocab_rows(u, 4), pad_vocab_rows(v, 4)
    step = make_sharded_train_step(hyper, mesh, up.shape[0], B)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    batch = _random_batch(np.random.default_rng(2), B, V, W, K)
    u2, v2, _ = step(ud, vd, batch.centers, batch.ctx_ids, batch.ctx_mask,
                     batch.neg_ids, batch.valid, jnp.float32(0.05))
    # rows beyond V are padding and must remain zero
    assert np.all(np.asarray(u2)[V:] == 0)
    assert np.all(np.asarray(v2)[V:] == 0)


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh({"data": 3, "vocab": 1})  # 8 devices, 3 doesn't divide
