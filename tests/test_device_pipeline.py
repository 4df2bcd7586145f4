"""Device epoch builder == host pipeline, bit-for-bit at shared uniforms."""

import numpy as np
import pytest

from word2bits_tpu.data.device_pipeline import (build_with_uniforms,
                                                make_device_epoch_builder)
from word2bits_tpu.data.pipeline import (build_epoch_arrays,
                                         subsample_keep_probs)


def _corpus(rng, n, v, sent_every=40):
    """Zipf-ish ids with `</s>` (id 0) breaks sprinkled in."""
    ids = np.minimum(rng.zipf(1.3, size=n) - 1, v - 2).astype(np.int32) + 1
    brk = rng.random(n) < 1.0 / sent_every
    ids[brk] = 0
    return ids


@pytest.mark.parametrize("n,v,sample", [
    (5_000, 200, 1e-3),
    (5_000, 200, 0.0),      # subsampling disabled
    (3_000, 50, 1e-2),      # aggressive subsampling
])
def test_device_matches_host(n, v, sample):
    rng = np.random.default_rng(7)
    encoded = _corpus(rng, n, v)
    counts = np.bincount(encoded, minlength=v).astype(np.int64)
    counts[0] = 0
    train_words = int(counts.sum())
    window = 5
    capacity = ((n + 1023) // 1024) * 1024

    # one f32 uniform stream shared by both implementations
    uniforms = rng.random(n, dtype=np.float32)
    host = build_epoch_arrays(encoded, counts, sample, train_words, window,
                              rng, capacity=capacity, uniforms=uniforms)
    dt, ds, dn = build_with_uniforms(capacity, window, encoded,
                                     subsample_keep_probs(
                                         counts, sample, train_words),
                                     uniforms)
    assert int(dn) == host.n_tokens
    np.testing.assert_array_equal(np.asarray(dt), host.tokens)
    np.testing.assert_array_equal(np.asarray(ds), host.sent_ids)


def test_long_sentence_resegmentation():
    """No `</s>` at all: sentences split every MAX_SENTENCE_LENGTH words."""
    n, v = 4_096, 100
    rng = np.random.default_rng(3)
    encoded = (rng.integers(1, v, size=n)).astype(np.int32)
    counts = np.bincount(encoded, minlength=v).astype(np.int64)
    train_words = int(counts.sum())
    capacity = 4_096
    uniforms = np.full(n, 0.0, dtype=np.float32)  # keep everything
    host = build_epoch_arrays(encoded, counts, 1e-3, train_words, 5, rng,
                              capacity=capacity, uniforms=uniforms)
    dt, ds, dn = build_with_uniforms(capacity, 5, encoded,
                                     subsample_keep_probs(
                                         counts, 1e-3, train_words),
                                     uniforms)
    assert int(dn) == n
    np.testing.assert_array_equal(np.asarray(ds), host.sent_ids)
    # 4096 kept words with no breaks -> sentence ids 0..4 appear
    valid = np.asarray(ds)[5:5 + n]
    assert valid.min() == 0 and valid.max() == (n - 1) // 1000


def test_builder_with_key_runs():
    """The PRNG-keyed builder produces a well-formed epoch."""
    import jax

    n, v = 2_048, 64
    rng = np.random.default_rng(0)
    encoded = _corpus(rng, n, v)
    counts = np.bincount(encoded, minlength=v).astype(np.int64)
    counts[0] = 0
    build = make_device_epoch_builder(2_048, 5)
    probs = subsample_keep_probs(counts, 1e-3, int(counts.sum()))
    t, s, k = build(encoded, probs.astype(np.float32), jax.random.PRNGKey(1))
    k = int(k)
    t = np.asarray(t)
    s = np.asarray(s)
    assert 0 < k <= n
    assert (t[5:5 + k] > 0).all()          # no `</s>`, no PAD inside
    assert (t[:5] == -1).all() and (s[:5] == -1).all()
    assert (t[5 + k:] == -1).all()
    assert (np.diff(s[5:5 + k]) >= 0).all()  # sentence ids non-decreasing


def test_train_with_device_epoch(tmp_path):
    """End-to-end: -device-epoch 1 trains and writes readable output."""
    from tests.test_integration import _make_corpus
    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.io.vectors import read_vectors
    from word2bits_tpu.train import train

    corpus = str(tmp_path / "corpus.txt")
    _make_corpus(corpus)
    out = str(tmp_path / "vec.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, bitlevel=1, size=16, window=3,
        negative=5, iter=2, min_count=2, alpha=0.05, sample=1e-3, binary=True,
        batch_size=64, steps_per_chunk=8, device_epoch=True)
    res = train(cfg)
    assert all(np.isfinite(l) for l in res.epoch_losses)
    words, vecs = read_vectors(out)
    assert len(words) > 5 and np.isfinite(vecs).all()
    # 1-bit output rows are +-1/3 (reference README.md:122-132)
    np.testing.assert_allclose(np.abs(vecs), 1 / 3, rtol=1e-5)


def test_train_with_device_epoch_multisegment(tmp_path):
    """-device-epoch with -segment-tokens smaller than the corpus: the
    epoch builds device-side per SEGMENT ([nseg, seg_len] upload, per-
    segment key fold) instead of falling back to the host rebuild
    (VERDICT r2 item 7)."""
    from tests.test_integration import _make_corpus
    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.io.vectors import read_vectors
    from word2bits_tpu.train import train

    corpus = str(tmp_path / "corpus.txt")
    _make_corpus(corpus)
    out = str(tmp_path / "vec.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, bitlevel=1, size=16, window=3,
        negative=5, iter=2, min_count=2, alpha=0.05, sample=1e-3, binary=True,
        batch_size=64, steps_per_chunk=8, device_epoch=True,
        segment_tokens=512)   # forces several device-built segments
    res = train(cfg)
    assert all(np.isfinite(l) for l in res.epoch_losses)
    words, vecs = read_vectors(out)
    assert len(words) > 5 and np.isfinite(vecs).all()
    np.testing.assert_allclose(np.abs(vecs), 1 / 3, rtol=1e-5)


def test_train_with_device_epoch_on_mesh(tmp_path):
    """-device-epoch on a (data, vocab) mesh: the device-built epoch arrays
    broadcast replicated into the sharded chunk (VERDICT r2 item 7)."""
    from tests.test_integration import _make_corpus
    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.io.vectors import read_vectors
    from word2bits_tpu.train import train

    corpus = str(tmp_path / "corpus.txt")
    _make_corpus(corpus)
    out = str(tmp_path / "vec.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, bitlevel=1, size=16, window=3,
        negative=5, iter=2, min_count=2, alpha=0.05, sample=1e-3, binary=True,
        batch_size=64, steps_per_chunk=4, device_epoch=True,
        mesh_shape={"data": 2, "vocab": 4})
    res = train(cfg)
    assert all(np.isfinite(l) for l in res.epoch_losses)
    words, vecs = read_vectors(out)
    assert len(words) > 5 and np.isfinite(vecs).all()
    np.testing.assert_allclose(np.abs(vecs), 1 / 3, rtol=1e-5)
