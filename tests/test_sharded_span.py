"""-scatter-impl span on the (data, vocab) mesh == the dense-delta mesh path.

The span mesh body (parallel/sharded_slab.py scatter_impl="span") replaces
the dense [Vs, D] delta + psum-over-data + add with an all_gather of the
(ids, rows) update lists over the data axis and a per-shard spanning sweep
scatter with local ids (kernels/span_scatter.py; VERDICT r3 item 5).  Same
sums up to float summation order, so with identical keys the span chunk
must match the plain sharded chunk — and both must match the single-chip
slab chunk, which the plain mesh chunk is already proven against
(tests/test_sharded_chunk.py).

Runs on the 8-virtual-device CPU mesh (tests/conftest.py); the Pallas
kernel runs in interpret mode there (Mosaic semantics are covered by the
single-chip span tests' opt-in TPU smoke and the bench path).
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
    ({"data": 1, "vocab": 8}, 8, 3),   # pure vocab sharding
    ({"data": 2, "vocab": 4}, 0, 3),   # per-center negatives
    ({"data": 2, "vocab": 4}, 8, 1),   # steps=1 takes the no-scan path
])
def test_span_mesh_chunk_equals_plain(mesh_shape, shared, steps):
    S, B, W, K, V, D = steps, 32, 3, 4, 61, 16
    SW = 16                           # per-shard sweep window
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    u, v, toks, sents, table, scalars = _setup(0, S, B, W, V, D)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(mesh_shape)
    nv = mesh_shape["vocab"]
    # plain path on minimally padded tables
    up, vp = pad_vocab_rows(u, nv), pad_vocab_rows(v, nv)
    plain = make_sharded_chunk(_sharded_slab_body, hyper, mesh, up.shape[0],
                               V, B, S, neg_sharing=shared, donate=False)
    ud, vd = shard_params(jnp.asarray(up), jnp.asarray(vp), mesh)
    u1, v1, loss1 = plain(ud, vd, jnp.asarray(toks), jnp.asarray(sents),
                          table.prob, table.alias, scalars, key)

    # span storage: shard rows to the sweep window, columns padded to
    # exercise the live-D slicing (ShardedTrainer pads to 128; any width
    # beyond D works the same)
    cpad = 8
    up2 = np.pad(pad_vocab_rows(u, nv * SW), ((0, 0), (0, cpad)))
    vp2 = np.pad(pad_vocab_rows(v, nv * SW), ((0, 0), (0, cpad)))
    span = make_sharded_chunk(_sharded_slab_body, hyper, mesh, up2.shape[0],
                              V, B, S, neg_sharing=shared, donate=False,
                              scatter_impl="span", span_window=SW,
                              span_chunk=16)
    ud2, vd2 = shard_params(jnp.asarray(up2), jnp.asarray(vp2), mesh)
    u2, v2, loss2 = span(ud2, vd2, jnp.asarray(toks), jnp.asarray(sents),
                         table.prob, table.alias, scalars, key)

    u2, v2 = np.asarray(u2), np.asarray(v2)
    np.testing.assert_allclose(u2[:up.shape[0], :D], np.asarray(u1),
                               atol=3e-5)
    np.testing.assert_allclose(v2[:vp.shape[0], :D], np.asarray(v1),
                               atol=3e-5)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4,
                               atol=1e-4)
    # storage padding must stay exactly zero
    for t in (u2[up.shape[0]:], u2[:, D:], v2[vp.shape[0]:], v2[:, D:]):
        assert t.size == 0 or np.abs(t).max() == 0.0


def test_span_trainer_mesh_matches_single_chip():
    """Full ShardedTrainer construction with -scatter-impl span (padding +
    export trim) against the single-chip slab trainer on the same config."""
    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.data.vocab import Vocab
    from word2bits_tpu.models.cbow_slab import make_slab_train_chunk
    from word2bits_tpu.parallel.trainer import ShardedTrainer

    S, B, W, K, V, D = 2, 32, 3, 4, 61, 16
    SW = 16
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.01)
    u, v, toks, sents, table, scalars = _setup(3, S, B, W, V, D)
    key = jax.random.PRNGKey(11)

    cfg = Word2BitsConfig(train_file="unused", bitlevel=1, size=D, window=W,
                          negative=K, reg=0.01, batch_size=B,
                          steps_per_chunk=S, neg_sharing=8,
                          scatter_impl="span", span_window=SW, span_chunk=16,
                          mesh_shape={"data": 2, "vocab": 4})
    trainer = ShardedTrainer(cfg, V, u, v)
    trainer.u, trainer.v, loss_m = trainer.chunk_fn(
        trainer.u, trainer.v, jnp.asarray(toks), jnp.asarray(sents),
        table.prob, table.alias, scalars, key)
    um, vm = trainer.params()

    single = make_slab_train_chunk(hyper, V, B, S, neg_sharing=8,
                                   donate=False)
    u1, v1, loss1 = single(jnp.asarray(u), jnp.asarray(v), jnp.asarray(toks),
                           jnp.asarray(sents), table.prob, table.alias,
                           scalars, key)
    np.testing.assert_allclose(um, np.asarray(u1), atol=3e-5)
    np.testing.assert_allclose(vm, np.asarray(v1), atol=3e-5)
    np.testing.assert_allclose(float(loss_m), float(loss1), rtol=1e-4,
                               atol=1e-4)


def test_span_mesh_config_accepted():
    """config validation: -scatter-impl span now composes with -mesh-shape
    (VERDICT r3 item 5); still rejected with the estimator/kernel variants
    and on non-CBOW models."""
    from word2bits_tpu.config import Word2BitsConfig
    cfg = Word2BitsConfig(train_file="x", mesh_shape={"data": 2, "vocab": 4},
                          scatter_impl="span", batch_size=64)
    assert cfg.scatter_impl == "span"
    with pytest.raises(ValueError, match="does not compose"):
        Word2BitsConfig(train_file="x", mesh_shape={"data": 2, "vocab": 4},
                        scatter_impl="span", batch_size=64,
                        rmw_scatter=True, steps_per_chunk=1)
    with pytest.raises(ValueError, match="CBOW"):
        Word2BitsConfig(train_file="x", model="skipgram",
                        scatter_impl="span", batch_size=64)
