"""Determinism: same seed -> identical parameters (SURVEY.md section 5 — the
synchronous-step replacement for the reference's by-design Hogwild races)."""

import numpy as np

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.train import train
from tests.test_integration import _make_corpus


def test_same_seed_same_params(tmp_path):
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=80)
    base = dict(train_file=corpus, output_file=str(tmp_path / "o"),
                bitlevel=1, size=8, window=2, negative=3, iter=2, min_count=1,
                batch_size=32, steps_per_chunk=4, debug=0, seed=11)
    r1 = train(Word2BitsConfig(**base))
    r2 = train(Word2BitsConfig(**base))
    np.testing.assert_array_equal(r1.u, r2.u)
    np.testing.assert_array_equal(r1.v, r2.v)
    assert r1.epoch_losses == r2.epoch_losses


def test_different_seed_different_params(tmp_path):
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=80)
    base = dict(train_file=corpus, output_file=str(tmp_path / "o"),
                bitlevel=1, size=8, window=2, negative=3, iter=1, min_count=1,
                batch_size=32, steps_per_chunk=4, debug=0, init="uniform")
    r1 = train(Word2BitsConfig(seed=1, **base))
    r2 = train(Word2BitsConfig(seed=2, **base))
    assert not np.array_equal(r1.u, r2.u)
