"""End-to-end training with -fused-tables (interleaved u/v)."""

import numpy as np

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.train import train
from tests.test_integration import _make_corpus


def test_fused_training_matches_shapes_and_learns(tmp_path):
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=120)
    out = str(tmp_path / "v.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, binary=True, bitlevel=1,
        size=16, window=2, negative=4, iter=3, min_count=1,
        batch_size=32, steps_per_chunk=4, neg_sharing=8, fused_tables=True,
        save_every_epoch=True, checkpoint_dir=str(tmp_path / "ck"), debug=0)
    result = train(cfg)
    assert result.u.shape == (result.vocab.size, 16)
    assert result.v.shape == (result.vocab.size, 16)
    assert result.epoch_losses[-1] > result.epoch_losses[0]

    from word2bits_tpu.io.vectors import read_vectors
    words, vecs = read_vectors(out)
    assert words == result.vocab.words
    third = np.float32(1.0) / np.float32(3.0)
    assert set(np.unique(vecs)) <= {third, -third}
    # per-epoch exports and checkpoint written with split shapes
    import os
    assert os.path.exists(out + "_epoch0")
    z = np.load(str(tmp_path / "ck" / "state.npz"))
    assert z["u"].shape == (result.vocab.size, 16)


def test_fused_same_trajectory_as_split(tmp_path):
    """fused and split paths draw identical randomness -> identical params."""
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=60)
    base = dict(train_file=corpus, output_file=str(tmp_path / "o"),
                bitlevel=1, size=8, window=2, negative=4, iter=2, min_count=1,
                batch_size=16, steps_per_chunk=4, neg_sharing=8, debug=0)
    r_split = train(Word2BitsConfig(fused_tables=False, **base))
    r_fused = train(Word2BitsConfig(fused_tables=True, **base))
    np.testing.assert_allclose(r_fused.u, r_split.u, atol=1e-5)
    np.testing.assert_allclose(r_fused.v, r_split.v, atol=1e-5)
