"""End-to-end sharded training over the 8-virtual-device CPU mesh."""

import numpy as np

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.train import train
from tests.test_integration import _make_corpus


def test_sharded_training_end_to_end(tmp_path):
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=150)
    out = str(tmp_path / "v.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, binary=True, bitlevel=1,
        size=16, window=2, negative=4, iter=3, min_count=1,
        batch_size=32, steps_per_chunk=4, neg_sharing=8, debug=0,
        mesh_shape={"data": 2, "vocab": 4})
    result = train(cfg)
    assert len(result.epoch_losses) == 3
    assert all(np.isfinite(l) for l in result.epoch_losses)
    assert result.epoch_losses[-1] > result.epoch_losses[0]
    assert result.u.shape[0] == result.vocab.size  # unpadded on return

    from word2bits_tpu.io.vectors import read_vectors
    words, vecs = read_vectors(out)
    assert words == result.vocab.words
    third = np.float32(1.0) / np.float32(3.0)
    assert set(np.unique(vecs)) <= {third, -third}


def test_sharded_skipgram_end_to_end(tmp_path):
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=100)
    cfg = Word2BitsConfig(train_file=corpus, output_file=str(tmp_path / "o"),
                          model="skipgram", binary=True, bitlevel=1,
                          size=16, window=2, negative=4, iter=2, min_count=1,
                          batch_size=32, steps_per_chunk=4, debug=0,
                          mesh_shape={"data": 2, "vocab": 4})
    result = train(cfg)
    assert len(result.epoch_losses) == 2
    assert all(np.isfinite(l) for l in result.epoch_losses)
    # numerical equality with the single-device step is proven in
    # tests/test_sharded_skipgram.py; tiny-corpus loss trends are noisy
    assert result.u.shape[0] == result.vocab.size


def test_sharded_dense_hot_end_to_end(tmp_path):
    """-mesh-shape + -neg-dense-hot: multi-chip training with exact
    hot-stratum negatives (vocab-axis local, parallel/sharded_slab)."""
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=150)
    out = str(tmp_path / "v.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, binary=True, bitlevel=1,
        size=16, window=2, negative=4, iter=3, min_count=1,
        batch_size=32, steps_per_chunk=4, neg_sharing=8, debug=0,
        mesh_shape={"data": 2, "vocab": 4}, hot_rows=8, neg_dense_hot=True)
    result = train(cfg)
    assert all(np.isfinite(l) for l in result.epoch_losses)
    assert result.epoch_losses[-1] > result.epoch_losses[0]
    from word2bits_tpu.io.vectors import read_vectors
    words, vecs = read_vectors(out)
    third = np.float32(1.0) / np.float32(3.0)
    assert set(np.unique(vecs)) <= {third, -third}


def test_cli_mesh_train_end_to_end(tmp_path, capsys):
    """The full CLI surface with -mesh-shape: flag parse -> ShardedTrainer
    -> epochs -> vector write, on the 8-virtual-device CPU mesh."""
    import numpy as np

    from word2bits_tpu.cli import train_main
    from word2bits_tpu.io.vectors import read_vectors

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(60)]
    corpus = tmp_path / "c.txt"
    corpus.write_text("\n".join(
        " ".join(words[rng.integers(60)] for _ in range(10))
        for _ in range(400)) + "\n")
    out = tmp_path / "vec.bin"
    rc = train_main([
        "-train", str(corpus), "-output", str(out), "-binary", "1",
        "-size", "16", "-window", "3", "-negative", "5", "-iter", "2",
        "-min-count", "1", "-bitlevel", "1", "-batch-size", "64",
        "-steps-per-chunk", "2", "-neg-sharing", "16",
        "-mesh-shape", "data=2,vocab=4", "-debug", "1"])
    assert rc == 0
    assert "Epoch Loss:" in capsys.readouterr().out
    ws, vecs = read_vectors(str(out))
    assert len(ws) == 61  # </s> + 60 words
    # bitlevel-1 rows quantize to +-1/3
    np.testing.assert_allclose(np.unique(np.abs(vecs)), 1.0 / 3, rtol=1e-6)


def test_sharded_bench_winner_composed_end_to_end(tmp_path):
    """The SHIPPED bench winner's flag set driven through the ShardedTrainer
    (VERDICT r4 item 6): -neg-pool 2 -banded-tile 256 -scatter-impl span
    composed on the (data x vocab) mesh via the CLI-visible config."""
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=150)
    out = str(tmp_path / "v.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, binary=True, bitlevel=1,
        size=16, window=2, negative=4, iter=2, min_count=1,
        batch_size=32, steps_per_chunk=4, neg_sharing=8, neg_pool=2,
        banded_tile=8, scatter_impl="span", span_window=16, span_chunk=32,
        alpha=0.10, debug=0, mesh_shape={"data": 2, "vocab": 4})
    result = train(cfg)
    assert len(result.epoch_losses) == 2
    assert all(np.isfinite(l) for l in result.epoch_losses)
    assert result.epoch_losses[-1] > result.epoch_losses[0]
    assert result.u.shape[0] == result.vocab.size  # padding trimmed

    from word2bits_tpu.io.vectors import read_vectors
    words, vecs = read_vectors(out)
    assert words == result.vocab.words
    third = np.float32(1.0) / np.float32(3.0)
    assert set(np.unique(vecs)) <= {third, -third}
