"""rmw_scatter capacity chunk == base fused chunk (interpret mode, CPU).

The Pallas group-RMW scatter path exists so the full-Wikipedia table fits
one chip (XLA's scatter copy-inserts a second table on the TPU backend —
kernels/scatter_pallas.py docstring).  Equality here proves the padded
storage layout (row groups + 128-lane columns) changes nothing about the
model: padded lanes stay zero and the update sums match the plain scatter
modulo duplicate summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np

from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
from word2bits_tpu.models.cbow_fused import make_fused_train_chunk
from word2bits_tpu.sampling.unigram import build_alias_table


def _setup(V, D, B, W, steps, seed=0):
    rng = np.random.default_rng(seed)
    n_tokens = steps * B + 2 * W + 32
    tokens = jnp.asarray(rng.integers(0, V, n_tokens).astype(np.int32))
    sents = jnp.asarray((np.arange(n_tokens) // 50).astype(np.int32))
    counts = np.maximum(rng.zipf(1.5, V).astype(np.float64), 1.0)
    atab = build_alias_table(counts ** 0.75)
    table = jnp.asarray(
        rng.normal(scale=0.1, size=(V, 2 * D)).astype(np.float32))
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(B),
                           denom=jnp.float32(1e9))
    key = jax.random.PRNGKey(7)
    return tokens, sents, atab, table, scalars, key


def test_rmw_chunk_matches_base():
    V, D, B, W, G, steps = 64, 16, 32, 3, 8, 2
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=4, reg=0.0)
    tokens, sents, atab, table, scalars, key = _setup(V, D, B, W, steps)

    base = make_fused_train_chunk(hyper, V, B, steps, neg_sharing=G,
                                  donate=False)
    t_base, l_base = base(table, tokens, sents, atab.prob, atab.alias,
                          scalars, key)

    col_pad = (-2 * D) % 128
    rmw = make_fused_train_chunk(hyper, V, B, steps, neg_sharing=G,
                                 donate=False, rmw_scatter=True,
                                 col_pad=col_pad)
    table_pad = jnp.pad(table, ((0, 0), (0, col_pad)))
    t_rmw, l_rmw = rmw(table_pad, tokens, sents, atab.prob, atab.alias,
                       scalars, key)

    np.testing.assert_allclose(float(l_rmw), float(l_base), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t_rmw[:, :2 * D]),
                               np.asarray(t_base), rtol=1e-4, atol=1e-5)
    # padded lanes must remain exactly zero (they carry no model state)
    assert float(jnp.max(jnp.abs(t_rmw[:, 2 * D:]))) == 0.0


def test_rmw_chunk_padded_vocab_rows():
    """Rows past the logical vocab (group padding) are never touched."""
    V, D, B, W, G, steps = 52, 16, 32, 3, 8, 1
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=4, reg=0.0)
    tokens, sents, atab, table, scalars, key = _setup(V, D, B, W, steps)

    base = make_fused_train_chunk(hyper, V, B, steps, neg_sharing=G,
                                  donate=False)
    t_base, _ = base(table, tokens, sents, atab.prob, atab.alias,
                     scalars, key)

    col_pad = (-2 * D) % 128
    vpad = (-V) % 8                      # f32 group = 8 rows
    rmw = make_fused_train_chunk(hyper, V, B, steps, neg_sharing=G,
                                 donate=False, rmw_scatter=True,
                                 col_pad=col_pad)
    table_pad = jnp.pad(table, ((0, vpad), (0, col_pad)))
    t_rmw, _ = rmw(table_pad, tokens, sents, atab.prob, atab.alias,
                   scalars, key)

    assert vpad > 0
    np.testing.assert_allclose(np.asarray(t_rmw[:V, :2 * D]),
                               np.asarray(t_base), rtol=1e-4, atol=1e-5)
    assert float(jnp.max(jnp.abs(t_rmw[V:]))) == 0.0


def test_rmw_train_end_to_end(tmp_path):
    """`-rmw-scatter` through train(): padded storage, unpadded export."""
    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.io.vectors import read_vectors
    from word2bits_tpu.train import train

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(40)]
    corpus = tmp_path / "c.txt"
    corpus.write_text("\n".join(
        " ".join(words[rng.integers(0, 40)] for _ in range(12))
        for _ in range(300)) + "\n")
    out = tmp_path / "v.bin"
    cfg = Word2BitsConfig(
        train_file=str(corpus), output_file=str(out), binary=True,
        size=16, iter=2, min_count=1, batch_size=64, steps_per_chunk=1,
        neg_sharing=8, fused_tables=True, rmw_scatter=True, debug=0)
    res = train(cfg)
    assert out.exists() and res.steps > 0
    assert np.isfinite(res.epoch_losses).all()
    vocab_words, vecs = read_vectors(str(out))
    # exported vectors carry the LOGICAL shape — no storage padding leaks
    assert vecs.shape[1] == 16
    assert len(vocab_words) == vecs.shape[0] <= 41  # 40 words + </s>
