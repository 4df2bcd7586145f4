"""Epoch array construction: subsampling, sentence segmentation, padding
(SURVEY.md section 2 C10-C12)."""

import numpy as np

from word2bits_tpu.data.pipeline import (
    MAX_SENTENCE_LENGTH,
    build_epoch_arrays,
    subsample_keep_probs,
)


def test_keep_prob_formula():
    # reference src/word2bits.cpp:403-404
    counts = np.asarray([0, 100, 1000, 10], dtype=np.int64)
    T = 1110
    s = 1e-3
    probs = subsample_keep_probs(counts, s, T)
    st = s * T
    for i, cn in enumerate(counts):
        if cn == 0:
            assert probs[i] == 1.0
        else:
            want = (np.sqrt(cn / st) + 1) * st / cn
            np.testing.assert_allclose(probs[i], want)


def test_sample_zero_disables():
    probs = subsample_keep_probs(np.asarray([5, 10]), 0.0, 15)
    assert (probs == 1.0).all()


def _mk(encoded, counts, window=2, sample=0.0, seed=0, capacity=None):
    rng = np.random.default_rng(seed)
    return build_epoch_arrays(np.asarray(encoded, np.int32),
                              np.asarray(counts, np.int64),
                              sample, int(np.sum(counts)), window, rng,
                              capacity=capacity)


def test_sentence_segmentation():
    # ids: 0 == </s>
    enc = [1, 2, 3, 0, 4, 5, 0, 0, 6]
    ep = _mk(enc, [2, 1, 1, 1, 1, 1, 1])
    h = ep.halo
    toks = ep.tokens[h:h + ep.n_tokens]
    sents = ep.sent_ids[h:h + ep.n_tokens]
    np.testing.assert_array_equal(toks, [1, 2, 3, 4, 5, 6])
    # sentence ids increment at each </s>
    assert sents[0] == sents[1] == sents[2]
    assert sents[3] == sents[4]
    assert sents[2] != sents[3]
    assert sents[5] != sents[4]


def test_halo_and_padding():
    ep = _mk([1, 2, 3], [1, 1, 1, 1], window=3)
    assert ep.halo == 3
    assert (ep.tokens[:3] == -1).all()
    assert (ep.sent_ids[:3] == -1).all()
    assert (ep.sent_ids[ep.halo + ep.n_tokens:] == -1).all()


def test_long_sentence_split():
    n = MAX_SENTENCE_LENGTH * 2 + 10
    enc = np.full(n, 1, dtype=np.int32)
    ep = _mk(enc, [0, n], window=1)
    sents = ep.sent_ids[ep.halo:ep.halo + ep.n_tokens]
    # three chunks: 1000 + 1000 + 10
    assert len(np.unique(sents)) == 3
    first = sents[:MAX_SENTENCE_LENGTH]
    assert (first == first[0]).all()
    assert sents[MAX_SENTENCE_LENGTH] != sents[MAX_SENTENCE_LENGTH - 1]


def test_subsampling_drops_frequent():
    rng_enc = np.random.default_rng(0)
    enc = rng_enc.integers(1, 3, size=10000).astype(np.int32)  # words 1, 2
    counts = np.asarray([0, (enc == 1).sum(), (enc == 2).sum()], np.int64)
    ep = _mk(enc, counts, sample=1e-4, seed=1)
    # aggressive subsampling keeps only a fraction
    assert 0 < ep.n_tokens < 6000


def test_capacity_padding_stable():
    ep1 = _mk([1, 2, 3, 0, 4], [1, 1, 1, 1, 1], capacity=64)
    ep2 = _mk([1, 2, 3, 0, 4, 5, 6], [1, 1, 1, 1, 1, 1, 1], capacity=64)
    assert ep1.tokens.shape == ep2.tokens.shape


def test_subsample_never_drops_sentence_tokens():
    enc = np.asarray([1, 0, 1, 0, 1, 0], np.int32)
    counts = np.asarray([3, 3], np.int64)
    ep = _mk(enc, counts, sample=1e-9, seed=2)  # drop nearly everything
    # sentence structure preserved even if all words dropped
    assert ep.n_tokens <= 3
