"""Streamed epoch segments: coverage, shapes, and end-to-end training."""

import numpy as np

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.data.pipeline import (
    build_epoch_arrays,
    expected_kept_fraction,
    iter_epoch_segments,
)
from word2bits_tpu.train import train
from tests.test_integration import _make_corpus


def test_segments_cover_all_tokens():
    rng = np.random.default_rng(0)
    enc = rng.integers(1, 20, 1000).astype(np.int32)
    counts = np.bincount(enc, minlength=20).astype(np.int64)
    segs = list(iter_epoch_segments(enc, counts, 0.0, int(counts.sum()), 2,
                                    np.random.default_rng(1), 300))
    assert len(segs) == 4  # 300+300+300+100
    total = sum(s.n_tokens for s in segs)
    assert total == 1000
    # all segments share one padded shape
    shapes = {s.tokens.shape for s in segs}
    assert len(shapes) == 1


def test_single_segment_matches_full_build():
    rng = np.random.default_rng(0)
    enc = rng.integers(1, 20, 500).astype(np.int32)
    counts = np.bincount(enc, minlength=20).astype(np.int64)
    full = build_epoch_arrays(enc, counts, 0.0, int(counts.sum()), 2,
                              np.random.default_rng(1))
    seg = next(iter_epoch_segments(enc, counts, 0.0, int(counts.sum()), 2,
                                   np.random.default_rng(1), 10_000))
    np.testing.assert_array_equal(
        seg.tokens[seg.halo:seg.halo + seg.n_tokens],
        full.tokens[full.halo:full.halo + full.n_tokens])


def test_expected_kept_fraction_bounds():
    counts = np.asarray([0, 1000, 10, 5], np.int64)
    f = expected_kept_fraction(counts, 1e-3, int(counts.sum()))
    assert 0 < f <= 1.0
    assert expected_kept_fraction(counts, 0.0, int(counts.sum())) == 1.0


def test_streamed_training_runs(tmp_path):
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=120)
    # sample=0 pins the per-epoch token count: the epoch LOSS SUM is only
    # comparable across epochs when both kept the same tokens (with
    # subsampling on, the draw variance at this corpus size swamps the
    # learning signal — seen when -device-epoch's threefry stream replaced
    # the host numpy stream here)
    cfg = Word2BitsConfig(train_file=corpus, output_file=str(tmp_path / "v"),
                          iter=2, size=8, window=2, negative=3, min_count=1,
                          batch_size=32, steps_per_chunk=4, debug=0,
                          sample=0.0,
                          segment_tokens=200)  # forces many segments
    result = train(cfg)
    assert len(result.epoch_losses) == 2
    assert all(np.isfinite(l) for l in result.epoch_losses)
    assert result.epoch_losses[-1] > result.epoch_losses[0]
