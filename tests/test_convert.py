"""CLI `convert` subcommand + the numpy quantize twin.

The converter materializes the reference's post-training workflow: its
evaluator re-quantizes fp32 rows at load (reference
src/compute-accuracy.c:106) and its catalog compresses via gzip (reference
README.md:3-5); `convert` writes the re-quantized / bit-packed files
directly."""

import numpy as np
import pytest

from word2bits_tpu.cli import convert_main
from word2bits_tpu.io.packed import read_packed
from word2bits_tpu.io.vectors import read_vectors, write_vectors
from word2bits_tpu.ops.quantize import quantize, quantize_np


@pytest.mark.parametrize("bitlevel", [0, 1, 2, 3, 4, 5, 8])
def test_quantize_np_matches_jax(rng, bitlevel):
    x = np.concatenate([
        rng.uniform(-2.0, 2.0, 500),
        np.array([0.0, -0.0, 0.5, -0.5, 1.0, -1.0, 1.5, -1.5]),
        np.array([0.25, 0.75, -0.25, -0.75, 1 / 16, -1 / 16]),
    ]).astype(np.float32)
    np.testing.assert_array_equal(
        quantize_np(x, bitlevel), np.asarray(quantize(x, bitlevel)))


def _write_fp32(path, rng, V=7, D=12, binary=True):
    words = [f"w{i}" for i in range(V)]
    vecs = rng.uniform(-1.2, 1.2, (V, D)).astype(np.float32)
    write_vectors(str(path), words, vecs, binary=binary)
    return words, vecs


def test_convert_requantize_binary(tmp_path, rng):
    src, dst = tmp_path / "in.bin", tmp_path / "out.bin"
    words, vecs = _write_fp32(src, rng)
    assert convert_main([str(src), str(dst), "-bitlevel", "1",
                         "-binary", "1"]) == 0
    w2, v2 = read_vectors(str(dst))
    assert w2 == words
    np.testing.assert_array_equal(v2, quantize_np(vecs, 1))


def test_convert_fp32_to_packed(tmp_path, rng):
    src, dst = tmp_path / "in.bin", tmp_path / "out.pack"
    words, vecs = _write_fp32(src, rng, D=17)  # non-multiple-of-8 dims
    assert convert_main([str(src), str(dst), "-bitlevel", "2",
                         "-packed", "1"]) == 0
    w2, v2, bl = read_packed(str(dst))
    assert (w2, bl) == (words, 2)
    np.testing.assert_array_equal(v2, quantize_np(vecs, 2))
    # the packed file is genuinely smaller than the fp32 source
    assert dst.stat().st_size < src.stat().st_size / 4


def test_convert_packed_to_text(tmp_path, rng):
    src = tmp_path / "in.bin"
    mid = tmp_path / "mid.pack"
    dst = tmp_path / "out.txt"
    words, vecs = _write_fp32(src, rng)
    assert convert_main([str(src), str(mid), "-bitlevel", "1",
                         "-packed", "1"]) == 0
    # no -bitlevel: values pass through (already on the 1-bit grid)
    assert convert_main([str(mid), str(dst)]) == 0
    w2, v2 = read_vectors(str(dst))
    assert w2 == words
    np.testing.assert_allclose(v2, quantize_np(vecs, 1), atol=2e-6)


def test_convert_threshold_truncates(tmp_path, rng):
    src, dst = tmp_path / "in.bin", tmp_path / "out.bin"
    words, vecs = _write_fp32(src, rng, V=9)
    assert convert_main([str(src), str(dst), "-threshold", "4",
                         "-binary", "1"]) == 0
    w2, v2 = read_vectors(str(dst))
    assert w2 == words[:4]
    np.testing.assert_array_equal(v2, vecs[:4])


def test_convert_packed_rejects_fp32_grid(tmp_path, rng, capsys):
    src, dst = tmp_path / "in.bin", tmp_path / "out.pack"
    _write_fp32(src, rng)
    assert convert_main([str(src), str(dst), "-packed", "1"]) == 1


def test_convert_usage_line():
    assert convert_main([]) == 0
