"""-rmw-scatter on the (data, vocab) mesh == the dense-delta mesh path.

The rmw mesh body (parallel/sharded_slab.py rmw=True) replaces the dense
[Vs, D] delta + psum-over-data + add with an all_gather of the (ids, rows)
update lists over the data axis and an in-place Pallas group-RMW scatter
with per-shard local ids (VERDICT r2 item 6 / ROADMAP 4c).  Same sums up to
float summation order, so with identical keys the rmw chunk must match the
plain sharded chunk.

Runs on the 8-virtual-device CPU mesh (tests/conftest.py); the Pallas
kernel runs in interpret mode there (its Mosaic semantics are covered by
the opt-in on-TPU smoke test in test_rmw_chunk.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
from word2bits_tpu.parallel.chunk import make_sharded_chunk
from word2bits_tpu.parallel.mesh import make_mesh
from word2bits_tpu.parallel.sharded import pad_vocab_rows, shard_params
from word2bits_tpu.parallel.sharded_slab import _sharded_slab_body


def _setup(seed, S, B, W, V, D):
    rng = np.random.default_rng(seed)
    u = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)
    n = W + S * B + W
    toks = rng.integers(1, V, n).astype(np.int32)
    sents = np.sort(rng.integers(0, 6, n)).astype(np.int32)
    toks[:2] = -1
    sents[:2] = -1
    counts = rng.integers(1, 50, V).astype(np.float64)
    from word2bits_tpu.sampling.unigram import build_alias_table
    table = build_alias_table(counts ** 0.75)
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(250.0),
                           denom=jnp.float32(1e5))
    return u, v, toks, sents, table, scalars


@pytest.mark.parametrize("mesh_shape,shared,steps", [
    ({"data": 2, "vocab": 4}, 8, 3),
    ({"data": 4, "vocab": 2}, 16, 3),
    ({"data": 1, "vocab": 8}, 8, 3),   # the capacity layout: pure vocab
    ({"data": 2, "vocab": 4}, 0, 3),   # per-center negatives
    ({"data": 2, "vocab": 4}, 8, 1),   # steps=1 takes the no-scan path
])
def test_rmw_mesh_chunk_equals_plain(mesh_shape, shared, steps):
    S, B, W, K, V, D = steps, 32, 3, 4, 61, 16
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    u, v, toks, sents, table, scalars = _setup(0, S, B, W, V, D)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(mesh_shape)
    nv = mesh_shape["vocab"]
    # rmw needs the per-shard row count aligned to the f32 sublane group
    # (kernels/scatter_pallas.group_rows == 8), mirroring ShardedTrainer
    up, vp = pad_vocab_rows(u, nv * 8), pad_vocab_rows(v, nv * 8)

    plain = make_sharded_chunk(_sharded_slab_body, hyper, mesh, up.shape[0],
                               V, B, S, neg_sharing=shared, donate=False)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u1, v1, loss1 = plain(ud, vd, jnp.asarray(toks), jnp.asarray(sents),
                          table.prob, table.alias, scalars, key)

    rmw = make_sharded_chunk(_sharded_slab_body, hyper, mesh, up.shape[0],
                             V, B, S, neg_sharing=shared, donate=False,
                             rmw=True)
    ud2, vd2 = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u2, v2, loss2 = rmw(ud2, vd2, jnp.asarray(toks), jnp.asarray(sents),
                        table.prob, table.alias, scalars, key)

    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=3e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)


def test_rmw_mesh_config_accepted():
    """config validation: -rmw-scatter now composes with -mesh (VERDICT r2
    weak item 4); still rejected with the estimator/kernel variants."""
    from word2bits_tpu.config import Word2BitsConfig
    cfg = Word2BitsConfig(train_file="x", mesh_shape={"data": 1, "vocab": 8},
                          rmw_scatter=True, steps_per_chunk=1,
                          batch_size=64)
    assert cfg.rmw_scatter
    with pytest.raises(ValueError, match="capacity path"):
        Word2BitsConfig(train_file="x", mesh_shape={"data": 1, "vocab": 8},
                        rmw_scatter=True, steps_per_chunk=1, batch_size=64,
                        hot_rows=128, neg_dense_hot=True)
