"""Native C++ tokenizer == Python fallback, exactly."""

import numpy as np
import pytest

from word2bits_tpu.data.corpus import count_words, encode_corpus, build_vocab
from word2bits_tpu import native


pytestmark = pytest.mark.skipif(native.lib is None,
                                reason="native lib failed to build")

CORPUS = (b"alpha beta gamma alpha\nbeta beta\r\n"
          b"  gamma\talpha  \n\ndelta epsilon zeta trailing")


@pytest.fixture
def corpus_file(tmp_path):
    p = tmp_path / "c.txt"
    p.write_bytes(CORPUS)
    return str(p)


def test_counts_match_python(corpus_file):
    nat = count_words(corpus_file, use_native=True)
    py = count_words(corpus_file, use_native=False)
    assert nat == py


def test_encode_matches_python(corpus_file):
    vocab = build_vocab(corpus_file, min_count=1, use_native=False)
    nat = encode_corpus(corpus_file, vocab, use_native=True)
    py = encode_corpus(corpus_file, vocab, use_native=False)
    np.testing.assert_array_equal(nat, py)


def test_encode_drops_oov(corpus_file):
    vocab = build_vocab(corpus_file, min_count=2, use_native=False)
    nat = encode_corpus(corpus_file, vocab, use_native=True)
    py = encode_corpus(corpus_file, vocab, use_native=False)
    np.testing.assert_array_equal(nat, py)
    assert nat.max() < vocab.size


def test_long_word_truncation(tmp_path):
    # 5000-char word: stored as exactly the first 4094 chars — the saturated
    # write slot is overwritten by the terminating NUL (reference :150-155).
    w = b"a" * 4999 + b"z"
    p = tmp_path / "c.txt"
    p.write_bytes(w + b" next ")
    nat = count_words(str(p), use_native=True)
    py = count_words(str(p), use_native=False)
    assert nat == py
    long_words = [k for k in py if len(k) > 4000]
    assert long_words == ["a" * 4094]


def test_truncation_boundary(tmp_path):
    # 4094 chars survive intact; 4095 chars lose the final char.
    p = tmp_path / "c.txt"
    p.write_bytes(b"b" * 4094 + b" " + b"c" * 4094 + b"z" + b" ")
    nat = count_words(str(p), use_native=True)
    py = count_words(str(p), use_native=False)
    assert nat == py
    assert py.get("b" * 4094) == 1
    assert py.get("c" * 4094) == 1  # the 4095-char word truncated to 4094


def test_large_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(500)]
    toks = rng.choice(words, size=200_000)
    data = (" ".join(toks) + " ").encode()
    p = tmp_path / "big.txt"
    p.write_bytes(data)
    nat = count_words(str(p), use_native=True)
    py = count_words(str(p), use_native=False)
    assert nat == py
