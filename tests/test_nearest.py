"""CLI `nearest` subcommand (word2vec `distance`-tool analog, extension)."""

import numpy as np

from word2bits_tpu.cli import nearest_main
from word2bits_tpu.io.vectors import write_vectors


def _toy_file(tmp_path):
    # cat/dog nearly parallel; rock orthogonal
    words = ["</s>", "cat", "dog", "rock"]
    vecs = np.array([[0.0, 0.0, 1.0],
                     [1.0, 0.1, 0.0],
                     [1.0, 0.0, 0.0],
                     [0.0, 1.0, 0.0]], np.float32)
    p = tmp_path / "v.bin"
    write_vectors(str(p), words, vecs, binary=True)
    return p


def test_nearest_ranks_by_cosine(tmp_path, capsys):
    p = _toy_file(tmp_path)
    assert nearest_main([str(p), "cat", "-topk", "2"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "cat:"
    assert out[1].split()[0] == "dog"          # closest
    assert float(out[1].split()[1]) > 0.99
    assert out[2].split()[0] == "rock"


def test_nearest_case_insensitive_and_oov(tmp_path, capsys):
    p = _toy_file(tmp_path)
    assert nearest_main([str(p), "CAT", "zebra"]) == 0
    out = capsys.readouterr().out
    assert "CAT:" in out and "zebra: not in vocabulary" in out


def test_nearest_requantize(tmp_path, capsys):
    # at bitlevel 1 every dim collapses to +-1/3: cat and dog quantize
    # identical (+,+,+); rock (+,-,+) lands at cosine 1/3
    words = ["cat", "dog", "rock"]
    vecs = np.array([[1.0, 0.1, 0.0],
                     [0.5, 0.2, 0.3],
                     [0.9, -0.5, 0.1]], np.float32)
    p = tmp_path / "q.bin"
    write_vectors(str(p), words, vecs, binary=True)
    assert nearest_main([str(p), "cat", "-bitlevel", "1", "-topk", "2"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[1].split()[0] == "dog"
    assert float(out[1].split()[1]) > 0.999999
    assert out[2].split()[0] == "rock"
    assert abs(float(out[2].split()[1]) - 1 / 3) < 1e-5


def test_nearest_usage():
    assert nearest_main([]) == 0
