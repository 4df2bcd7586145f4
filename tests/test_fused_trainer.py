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


def test_hot_rows_same_trajectory(tmp_path):
    """-hot-rows N (hot/cold scatter split) must not change the trained
    params vs the plain fused path (same key stream; summation order only)."""
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=80)
    # pin one epoch pipeline: hot_rows auto-disables device_epoch (host
    # cold positions), so a like-for-like trajectory needs the host path
    # on both sides
    base = dict(train_file=corpus, output_file=str(tmp_path / "o"),
                bitlevel=1, size=8, window=2, negative=4, iter=2, min_count=1,
                batch_size=16, steps_per_chunk=4, neg_sharing=8,
                fused_tables=True, debug=0, device_epoch=False)
    r_plain = train(Word2BitsConfig(**base))
    r_hot = train(Word2BitsConfig(hot_rows=6, **base))
    np.testing.assert_allclose(r_hot.u, r_plain.u, atol=1e-5)
    np.testing.assert_allclose(r_hot.v, r_plain.v, atol=1e-5)


def test_hot_rows_streaming_segments(tmp_path):
    """-hot-rows with a streamed corpus (multiple segments per epoch): the
    per-segment cold-position maps keep a stable width and the run matches
    the unstreamed hot-rows run."""
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=80)
    base = dict(train_file=corpus, output_file=str(tmp_path / "o"),
                bitlevel=1, size=8, window=2, negative=4, iter=2, min_count=1,
                batch_size=16, steps_per_chunk=2, neg_sharing=8,
                fused_tables=True, hot_rows=6, debug=0)
    r_whole = train(Word2BitsConfig(**base))
    r_seg = train(Word2BitsConfig(segment_tokens=256, **base))
    # segment boundaries change batch composition (seam slop), so only the
    # run-level health is comparable; exactness is covered above
    assert np.isfinite(r_seg.epoch_losses).all()
    assert r_seg.u.shape == r_whole.u.shape


def test_neg_stratify_trains_and_converges(tmp_path):
    """-neg-stratify 1 -hot-rows H: full training runs and learns; output
    vectors stay reference-format."""
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=120)
    out = str(tmp_path / "v.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, binary=True, bitlevel=1,
        size=16, window=2, negative=6, iter=3, min_count=1,
        batch_size=32, steps_per_chunk=4, neg_sharing=8, fused_tables=True,
        hot_rows=8, neg_stratify=True, debug=0)
    result = train(cfg)
    assert result.epoch_losses[-1] > result.epoch_losses[0]
    from word2bits_tpu.io.vectors import read_vectors
    words, vecs = read_vectors(out)
    third = np.float32(1.0) / np.float32(3.0)
    assert set(np.unique(vecs)) <= {third, -third}


def test_neg_dense_hot_trains_and_converges(tmp_path):
    """-neg-dense-hot 1 -hot-rows H: exact hot-stratum negatives; full run
    learns, reference-format output."""
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=120)
    out = str(tmp_path / "v.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, binary=True, bitlevel=1,
        size=16, window=2, negative=6, iter=3, min_count=1,
        batch_size=32, steps_per_chunk=4, neg_sharing=8, fused_tables=True,
        hot_rows=8, neg_dense_hot=True, debug=0)
    result = train(cfg)
    assert result.epoch_losses[-1] > result.epoch_losses[0]
    from word2bits_tpu.io.vectors import read_vectors
    words, vecs = read_vectors(out)
    third = np.float32(1.0) / np.float32(3.0)
    assert set(np.unique(vecs)) <= {third, -third}


def test_neg_dense_hot_with_device_epoch(tmp_path):
    """-neg-dense-hot composes with -device-epoch (no cold-position map:
    plain slab scatter + dense hot head delta)."""
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=120)
    out = str(tmp_path / "v.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, binary=True, bitlevel=1,
        size=16, window=2, negative=6, iter=3, min_count=1,
        batch_size=32, steps_per_chunk=4, neg_sharing=8, fused_tables=True,
        hot_rows=8, neg_dense_hot=True, device_epoch=True, debug=0)
    result = train(cfg)
    assert result.epoch_losses[-1] > result.epoch_losses[0]
