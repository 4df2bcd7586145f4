"""Vocab build / save / load and corpus tokenization-encoding semantics
(SURVEY.md section 2 C3-C5, C10)."""

import numpy as np
import pytest

from word2bits_tpu.data.corpus import (
    build_vocab,
    count_words,
    encode_corpus,
    split_tokens,
    tokenize_bytes,
)
from word2bits_tpu.data.vocab import SENTENCE_TOKEN, Vocab


CORPUS = b"the cat sat on the mat\nthe dog sat on the log\nthe cat and the dog "


@pytest.fixture
def corpus_file(tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_bytes(CORPUS)
    return str(p)


def test_split_tokens_matches_char_oracle():
    cases = [
        CORPUS,
        b"a b c",              # trailing word w/o separator -> dropped
        b"a b c ",             # trailing space -> c kept
        b"a\nb\n",             # newlines -> </s> tokens
        b"\n\n",               # consecutive newlines -> two </s>
        b"a\r\nb ",            # \r ignored
        b"  a\t\tb  \n",       # runs of separators collapse
        b"",
    ]
    for data in cases:
        assert split_tokens(data) == list(tokenize_bytes(data)), data


def test_newline_yields_sentence_token():
    toks = split_tokens(b"a b\nc ")
    assert toks == [b"a", b"b", b"</s>", b"c"]


def test_trailing_word_dropped_like_reference():
    # reference ReadWordIndex discards the word terminated by EOF
    # (src/word2bits.cpp:177-185)
    assert split_tokens(b"hello world") == [b"hello"]
    assert split_tokens(b"hello world\n") == [b"hello", b"world", b"</s>"]


def test_count_words(corpus_file):
    counts = count_words(corpus_file, use_native=False)
    assert counts["the"] == 6
    assert counts["cat"] == 2
    assert counts[SENTENCE_TOKEN] == 2  # two newlines
    assert "and" in counts


def test_vocab_sort_and_pin(corpus_file):
    vocab = build_vocab(corpus_file, min_count=1, use_native=False)
    assert vocab.words[0] == SENTENCE_TOKEN          # pinned (reference :276)
    assert vocab.words[1] == "the"                   # most frequent
    counts = vocab.counts
    assert np.all(counts[2:] <= counts[1:-1][0])     # descending order
    assert np.all(np.diff(counts[1:]) <= 0)


def test_min_count_prunes_but_not_sentence_token(corpus_file):
    vocab = build_vocab(corpus_file, min_count=2, use_native=False)
    assert SENTENCE_TOKEN in vocab.words
    assert "and" not in vocab.index          # count 1 < 2
    assert "cat" in vocab.index              # count 2
    # train_words = sum of surviving counts (reference :233)
    assert vocab.train_words == int(vocab.counts.sum())


def test_vocab_save_load_roundtrip(tmp_path, corpus_file):
    vocab = build_vocab(corpus_file, min_count=1, use_native=False)
    path = str(tmp_path / "vocab.txt")
    vocab.save(path)
    loaded = Vocab.load(path, min_count=1)
    assert loaded.words == vocab.words
    np.testing.assert_array_equal(loaded.counts, vocab.counts)


def test_encode_corpus_drops_oov(corpus_file):
    vocab = build_vocab(corpus_file, min_count=2, use_native=False)
    ids = encode_corpus(corpus_file, vocab, use_native=False)
    # all ids valid, `</s>`=0 present for the two newlines
    assert ids.min() >= 0
    assert ids.max() < vocab.size
    assert (ids == 0).sum() == 2
    # OOV words (count-1 words pruned at min_count=2) are absent
    decoded = [vocab.words[i] for i in ids]
    assert "and" not in decoded
    assert decoded.count("the") == 6


def test_lookup_oov_is_minus1(corpus_file):
    vocab = build_vocab(corpus_file, min_count=1, use_native=False)
    assert vocab.lookup("zzz-not-present") == -1
