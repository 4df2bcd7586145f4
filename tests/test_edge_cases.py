"""Degenerate inputs: tiny corpora, empty vocab slices, extreme flags."""

import numpy as np
import pytest

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.data.corpus import build_vocab, encode_corpus
from word2bits_tpu.train import train


def test_single_sentence_corpus(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("alpha beta alpha beta alpha beta gamma\n" * 5)
    cfg = Word2BitsConfig(train_file=str(p), output_file=str(tmp_path / "o"),
                          size=8, window=2, negative=2, iter=1, min_count=1,
                          batch_size=8, steps_per_chunk=2, debug=0)
    result = train(cfg)
    assert np.isfinite(result.epoch_losses[0])


def test_corpus_smaller_than_batch(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("a b c a b c \n")
    cfg = Word2BitsConfig(train_file=str(p), output_file=str(tmp_path / "o"),
                          size=8, window=2, negative=2, iter=2, min_count=1,
                          batch_size=64, steps_per_chunk=4, debug=0)
    result = train(cfg)
    assert len(result.epoch_losses) == 2


def test_min_count_prunes_everything(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("a b c d e \n")  # every count == 1
    vocab = build_vocab(str(p), min_count=5)
    assert vocab.size == 1  # only </s> survives
    enc = encode_corpus(str(p), vocab)
    assert (enc == 0).all()  # just the newline token


def test_training_on_empty_vocab_corpus(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("a b c d e \n")
    cfg = Word2BitsConfig(train_file=str(p), output_file=str(tmp_path / "o"),
                          size=4, window=2, negative=1, iter=1, min_count=5,
                          batch_size=4, steps_per_chunk=1, debug=0)
    result = train(cfg)  # nothing to train on; must not crash
    assert np.isfinite(result.epoch_losses[0])


def test_negative_zero(tmp_path):
    """reference: -negative 0 trains only the positive term."""
    p = tmp_path / "c.txt"
    from tests.test_integration import _make_corpus
    _make_corpus(str(p), n_sentences=30)
    cfg = Word2BitsConfig(train_file=str(p), output_file=str(tmp_path / "o"),
                          size=8, window=2, negative=0, iter=1, min_count=1,
                          batch_size=16, steps_per_chunk=2, debug=0)
    result = train(cfg)
    assert np.isfinite(result.epoch_losses[0])


def test_window_one(tmp_path):
    p = tmp_path / "c.txt"
    from tests.test_integration import _make_corpus
    _make_corpus(str(p), n_sentences=30)
    cfg = Word2BitsConfig(train_file=str(p), output_file=str(tmp_path / "o"),
                          size=8, window=1, negative=2, iter=1, min_count=1,
                          batch_size=16, steps_per_chunk=2, debug=0)
    result = train(cfg)
    assert np.isfinite(result.epoch_losses[0])


def test_high_bitlevel(tmp_path):
    p = tmp_path / "c.txt"
    from tests.test_integration import _make_corpus
    _make_corpus(str(p), n_sentences=30)
    cfg = Word2BitsConfig(train_file=str(p), output_file=str(tmp_path / "o"),
                          bitlevel=8, size=8, window=2, negative=2, iter=1,
                          min_count=1, batch_size=16, steps_per_chunk=2,
                          debug=0)
    result = train(cfg)
    assert np.isfinite(result.epoch_losses[0])
