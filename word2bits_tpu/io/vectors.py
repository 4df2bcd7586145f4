"""Reference-compatible vector serialization.

Format (reference src/word2bits.cpp:544-556,561-576; README.md:122-132):
  header line:  "<vocab_size> <size>\\n"   (ASCII decimal)
  per row:      "<word> "  then `size` values, then "\\n"
    binary=1:   raw little-endian float32 (fwrite)
    binary=0:   printf "%lf " per value — i.e. %f with 6 decimals and a
                trailing space per value (Glove/fasttext text format)

The written vector for word i is quantize(u[i] + v[i], bitlevel)
(reference src/word2bits.cpp:548-552).

The binary format here is byte-for-byte what the reference `compute_accuracy`
loader expects (reference src/compute-accuracy.c:96-106), so outputs
cross-check against the original C evaluator.
"""

from __future__ import annotations

import io as _io
from typing import List, Tuple

import numpy as np


def _encode_word(w: str) -> bytes:
    return w.encode("utf-8", errors="surrogateescape")


def write_vectors(path: str, words: List[str], vectors: np.ndarray,
                  binary: bool = False) -> None:
    """Write rows exactly as the reference does."""
    vectors = np.asarray(vectors, dtype=np.float32)
    V, D = vectors.shape
    if len(words) != V:
        raise ValueError(f"{len(words)} words vs {V} rows")
    buf = _io.BytesIO()
    buf.write(f"{V} {D}\n".encode())
    if binary:
        rows = vectors.astype("<f4", copy=False)
        for i, w in enumerate(words):
            buf.write(_encode_word(w) + b" ")
            buf.write(rows[i].tobytes())
            buf.write(b"\n")
    else:
        for i, w in enumerate(words):
            # C "%lf " prints 6 decimals + trailing space per value
            vals = "".join(f"{x:f} " for x in vectors[i])
            buf.write(_encode_word(w) + b" " + vals.encode() + b"\n")
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def _open_maybe_gzip(path: str):
    """The reference's pretrained-vector catalog ships gzip'd text files
    (reference README.md:27-41); sniff the magic and decompress on the fly."""
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        import gzip
        data = gzip.open(f).read()
        f.close()
        import io as _io
        return _io.BytesIO(data)
    return f


def read_vectors(path: str, binary: bool | None = None,
                 max_words: int = 0) -> Tuple[List[str], np.ndarray]:
    """Read either format (plain or gzip'd). binary=None sniffs the format.
    max_words truncates like the reference evaluator's threshold
    (src/compute-accuracy.c:86)."""
    with _open_maybe_gzip(path) as f:
        header = f.readline().split()
        V, D = int(header[0]), int(header[1])
        if max_words and V > max_words:
            V = max_words
        if binary is None:
            pos = f.tell()
            probe = f.read(4096)
            f.seek(pos)
            # text rows contain only printable ASCII; binary rows contain raw
            # fp32 bytes which are overwhelmingly non-ASCII
            sample = probe.split(b" ", 1)[-1][:64]
            binary = any(b > 0x7E or (b < 0x20 and b not in (0x0A, 0x0D))
                         for b in sample)
        words: List[str] = []
        out = np.empty((V, D), dtype=np.float32)
        if binary:
            # single buffered pass (byte-at-a-time reads are minutes at 3.7M rows)
            data = f.read()
            pos = 0
            row_bytes = 4 * D
            for i in range(V):
                while pos < len(data) and data[pos] == 0x0A:  # skip row breaks
                    pos += 1
                sp = data.index(b" ", pos)
                words.append(data[pos:sp].decode("utf-8",
                                                 errors="surrogateescape"))
                pos = sp + 1
                out[i] = np.frombuffer(data, dtype="<f4", count=D, offset=pos)
                pos += row_bytes
        else:
            for i in range(V):
                line = f.readline()
                parts = line.split()
                words.append(parts[0].decode("utf-8", errors="surrogateescape"))
                out[i] = np.asarray(parts[1:D + 1], dtype=np.float32)
    return words, out


def output_vectors(u: np.ndarray, v: np.ndarray, bitlevel: int) -> np.ndarray:
    """The exported representation: quantize(u + v, bitlevel)
    (reference src/word2bits.cpp:548-550).

    Computed HOST-side via the numpy twin (ops/quantize.quantize_np, proven
    equal to the jax op by tests/test_convert.py): at flagship scale the
    device path uploads an 11.8 GB fp32 sum to a chip that may still hold
    the training table (round-4 export OOM) and fetches it back through
    the wedge-prone tunnel, for an op that is one elementwise pass."""
    from word2bits_tpu.ops.quantize import quantize_np

    s = np.asarray(u, np.float32) + np.asarray(v, np.float32)
    return np.asarray(quantize_np(s, bitlevel), np.float32)
