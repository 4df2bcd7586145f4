"""Multi-segment streamed epochs == single-segment training.

The segment loop (train.py; the reference's byte-offset epoch sharding,
reference src/word2bits.cpp:377-423) hard-cuts the encoded corpus at
-segment-tokens boundaries.  When a segment boundary coincides with a
sentence AND batch boundary, the streamed run performs bit-identical
updates to the unsegmented run: the per-chunk key stream advances one
split per chunk in both (same negatives/shrink draws), windows never cross
sentence seams, and per-segment word accounting reproduces the global
alpha schedule.  This is the strongest form of the multi-segment == single
claim; the general unaligned case differs only by the reference-sanctioned
seam slop (at most `window` context pairs per seam).
"""

import numpy as np
import pytest

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.train import train


def _write_corpus(path, n_sentences=16, words_per_sentence=15, vocab=40,
                  seed=0):
    rng = np.random.default_rng(seed)
    lines = [" ".join(f"w{rng.integers(0, vocab)}"
                      for _ in range(words_per_sentence))
             for _ in range(n_sentences)]
    path.write_text("\n".join(lines) + "\n")


@pytest.mark.parametrize("model,extra", [
    ("cbow", {}),
    ("cbow", dict(fused_tables=True, neg_sharing=10)),
])
def test_aligned_segments_bit_identical(tmp_path, model, extra):
    """4 aligned segments == 1 segment, final tables bitwise equal.

    Construction: sentences of 15 words + `</s>` = 16 raw tokens;
    segment_tokens=64 = 4 sentences = 60 kept centers = 2 batches of 30 =
    one S=2 chunk — every seam is a sentence boundary and a batch boundary,
    and both runs consume 4 chunk-key splits in the same order.
    """
    corpus = tmp_path / "corpus.txt"
    _write_corpus(corpus)
    common = dict(
        train_file=str(corpus), model=model, size=16, window=2, negative=3,
        min_count=1, sample=0.0, alpha=0.05, auto_lr=False, iter=2,
        batch_size=30, steps_per_chunk=2, bitlevel=1, seed=7,
        device_epoch=False, debug=0, **extra)
    res_multi = train(Word2BitsConfig(segment_tokens=64, **common))
    res_single = train(Word2BitsConfig(segment_tokens=1 << 28, **common))

    assert res_multi.steps == res_single.steps
    np.testing.assert_allclose(res_multi.epoch_losses,
                               res_single.epoch_losses, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(res_multi.u),
                                  np.asarray(res_single.u))
    np.testing.assert_array_equal(np.asarray(res_multi.v),
                                  np.asarray(res_single.v))


def test_device_epoch_segments_cover_corpus(tmp_path):
    """The device-built segment path (-device-epoch 1) streams every
    segment: same step count and a finite loss per epoch; segment keys are
    folded per (epoch, segment) so the run is reproducible."""
    corpus = tmp_path / "corpus.txt"
    _write_corpus(corpus, n_sentences=24)
    common = dict(
        train_file=str(corpus), size=16, window=2, negative=3,
        min_count=1, sample=0.0, alpha=0.05, auto_lr=False, iter=1,
        batch_size=30, steps_per_chunk=2, bitlevel=1, seed=7,
        device_epoch=True, debug=0)
    res_a = train(Word2BitsConfig(segment_tokens=128, **common))
    res_b = train(Word2BitsConfig(segment_tokens=128, **common))
    res_one = train(Word2BitsConfig(segment_tokens=1 << 28, **common))
    # deterministic across runs at the same config
    np.testing.assert_array_equal(np.asarray(res_a.u), np.asarray(res_b.u))
    # streams the whole corpus: same number of optimizer steps as the
    # single-segment run (24 sentences * 15 kept = 360 centers; segments of
    # 128 raw = 120 kept = 4 batches each)
    assert res_a.steps == res_one.steps
    assert all(np.isfinite(res_a.epoch_losses))
