"""Vector file round-trips and reference byte-format checks
(SURVEY.md section 2 C19)."""

import numpy as np

from word2bits_tpu.io.vectors import output_vectors, read_vectors, write_vectors


WORDS = ["</s>", "the", "cat", "dog"]


def _vectors():
    rng = np.random.default_rng(0)
    return rng.uniform(-1, 1, (4, 8)).astype(np.float32)


def test_binary_roundtrip(tmp_path):
    p = str(tmp_path / "vec.bin")
    vecs = _vectors()
    write_vectors(p, WORDS, vecs, binary=True)
    words, got = read_vectors(p)
    assert words == WORDS
    np.testing.assert_array_equal(got, vecs)


def test_text_roundtrip(tmp_path):
    p = str(tmp_path / "vec.txt")
    vecs = _vectors()
    write_vectors(p, WORDS, vecs, binary=False)
    words, got = read_vectors(p)
    assert words == WORDS
    np.testing.assert_allclose(got, vecs, atol=1e-6)  # %f has 6 decimals


def test_binary_layout_matches_reference_readme():
    """README.md:122-132 shows 1-bit rows as 0x3eaaaaab / 0xbeaaaaab."""
    import io, struct, tempfile, os
    u = np.asarray([[0.2, -0.3]], np.float32)
    v = np.asarray([[0.3, -0.3]], np.float32)
    out = output_vectors(u, v, bitlevel=1)
    third = np.float32(1.0) / np.float32(3.0)
    np.testing.assert_array_equal(out, [[third, -third]])
    assert struct.pack("<f", third) == bytes.fromhex("ab aa aa 3e".replace(" ", ""))

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "v.bin")
        write_vectors(p, ["w"], out, binary=True)
        raw = open(p, "rb").read()
    assert raw.startswith(b"1 2\n")
    body = raw[len(b"1 2\nw "):]
    assert body == struct.pack("<f", third) + struct.pack("<f", -third) + b"\n"


def test_text_format_is_reference_printf(tmp_path):
    """Text rows are '%lf '-formatted: 6 decimals + trailing space."""
    p = str(tmp_path / "v.txt")
    third = np.float32(1.0) / np.float32(3.0)
    write_vectors(p, ["w"], np.asarray([[third, -third]], np.float32))
    content = open(p, "rb").read()
    assert content == b"2 2\nw 0.333333 -0.333333 \n".replace(b"2 2", b"1 2")


def test_header_and_truncation(tmp_path):
    p = str(tmp_path / "vec.bin")
    vecs = _vectors()
    write_vectors(p, WORDS, vecs, binary=True)
    words, got = read_vectors(p, max_words=2)
    assert words == WORDS[:2]
    assert got.shape == (2, 8)


def test_output_vectors_is_quantized_sum():
    u, v = _vectors()[:2], _vectors()[2:]
    out = output_vectors(u, v, bitlevel=2)
    s = u + v
    want = np.where(np.abs(s) <= 0.5, 0.25, 0.75) * np.where(s < 0, -1, 1)
    np.testing.assert_array_equal(out, want.astype(np.float32))


def test_gzip_text_vectors(tmp_path):
    """The reference's pretrained catalog ships .gz text vectors."""
    import gzip
    vecs = _vectors()
    plain = str(tmp_path / "v.txt")
    write_vectors(plain, WORDS, vecs, binary=False)
    gz = str(tmp_path / "v.txt.gz")
    with open(plain, "rb") as fin, gzip.open(gz, "wb") as fout:
        fout.write(fin.read())
    words, got = read_vectors(gz)
    assert words == WORDS
    np.testing.assert_allclose(got, vecs, atol=1e-6)


def test_corrupt_inputs_raise_not_garbage(tmp_path):
    """Truncated/garbage vector files must raise (any exception beats
    silently returning wrong rows); pins the failure MODE, not message."""
    import numpy as np
    import pytest

    from word2bits_tpu.io.packed import read_packed, write_packed
    from word2bits_tpu.io.vectors import read_vectors, write_vectors

    rows = np.ones((3, 4), np.float32) / 3
    b = tmp_path / "v.bin"
    write_vectors(str(b), ["a", "b", "c"], rows, binary=True)
    data = b.read_bytes()
    b.write_bytes(data[: len(data) // 2])
    with pytest.raises(Exception):
        read_vectors(str(b))

    g = tmp_path / "g.bin"
    g.write_bytes(b"not a header at all\x00\xff")
    with pytest.raises(Exception):
        read_vectors(str(g))

    p = tmp_path / "v.pack"
    write_packed(str(p), ["a", "b", "c"], rows, 1)
    data = p.read_bytes()
    p.write_bytes(data[:-3])
    with pytest.raises(Exception):
        read_packed(str(p))
