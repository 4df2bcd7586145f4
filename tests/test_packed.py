"""Packed 1/2-bit vector storage round-trips and size claims."""

import os

import numpy as np
import pytest

from word2bits_tpu.io.packed import read_packed, write_packed
from word2bits_tpu.ops.quantize import quantize
import jax.numpy as jnp


def _grid_vectors(bitlevel, V=40, D=33, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.uniform(-1, 1, (V, D)).astype(np.float32)
    return np.asarray(quantize(jnp.asarray(raw), bitlevel))


@pytest.mark.parametrize("bitlevel", [1, 2])
def test_roundtrip_exact(tmp_path, bitlevel):
    vecs = _grid_vectors(bitlevel)
    words = [f"w{i}" for i in range(vecs.shape[0])]
    p = str(tmp_path / "v.pack")
    write_packed(p, words, vecs, bitlevel)
    w2, v2, bl = read_packed(p)
    assert w2 == words and bl == bitlevel
    np.testing.assert_array_equal(v2, vecs)


def test_size_reduction(tmp_path):
    V, D = 1000, 256
    vecs = _grid_vectors(1, V, D)
    words = [f"word{i:05d}" for i in range(V)]
    p = str(tmp_path / "v.pack")
    write_packed(p, words, vecs, 1)
    packed = os.path.getsize(p)
    fp32_payload = V * D * 4
    # payload is exactly V*D/8 bytes + header/words
    assert packed < fp32_payload / 20  # >20x smaller than raw fp32 rows


def test_rejects_off_grid(tmp_path):
    with pytest.raises(ValueError):
        write_packed(str(tmp_path / "x"), ["a"],
                     np.asarray([[0.5, 0.1]], np.float32), 1)


def test_rejects_high_bitlevel(tmp_path):
    vecs = _grid_vectors(1, 4, 4)
    with pytest.raises(ValueError):
        write_packed(str(tmp_path / "x"), ["a"] * 4, vecs, 4)


def test_cli_accuracy_reads_packed(tmp_path, capsys):
    """cli accuracy sniffs the W2BPACK1 magic and reports identically to
    the fp32 file for the same vectors."""
    import numpy as np
    from word2bits_tpu.cli import accuracy_main
    from word2bits_tpu.io.packed import write_packed
    from word2bits_tpu.io.vectors import write_vectors

    rng = np.random.default_rng(0)
    words = ["cat", "dog", "sun", "moon", "red", "blue"]
    third = np.float32(1.0) / np.float32(3.0)
    vecs = np.where(rng.random((6, 16)) < 0.5, third, -third).astype(np.float32)
    fp = str(tmp_path / "v.bin")
    pk = str(tmp_path / "v.pack")
    write_vectors(fp, words, vecs, binary=True)
    write_packed(pk, words, vecs, bitlevel=1)
    q = str(tmp_path / "q.txt")
    open(q, "w").write(": sec\ncat dog sun moon\nsun moon red blue\n")

    accuracy_main([fp, "0", "0", "-questions", q])
    out_fp = capsys.readouterr().out
    accuracy_main([pk, "0", "0", "-questions", q])
    out_pk = capsys.readouterr().out
    assert out_fp == out_pk
    assert "Questions seen / total: 2 2" in out_pk
