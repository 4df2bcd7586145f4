"""Packed quantized vector storage (extension).

The reference stores quantized vectors as full fp32 and realizes its 8-16x
compression claim only after gzip (reference README.md:3-5,122-132).  This
module stores 1-bit and 2-bit vectors *actually packed*: b bits per
dimension (1-bit: sign -> +-1/3; 2-bit: sign+magnitude -> {+-0.25, +-0.75}),
plus the word list — a 32x/16x raw reduction vs fp32 rows.

(bitlevel >= 4 grids have 2^(b-1)+1 magnitude levels — k/2^(b-1) for
k=0..2^(b-1), reference src/word2bits.cpp:100-105 — which do not fit b bits;
those stay in the fp32 formats of io/vectors.py.)

Format (little-endian):
  magic b"W2BPACK1"
  uint32 vocab_size, uint32 size, uint32 bitlevel, uint32 words_bytes
  '\\n'-joined utf-8 word list
  payload: per row, ceil(size*bitlevel/8) bytes (rows independently
  addressable)

Round-trips exactly for vectors on the bitlevel's value grid (i.e. outputs
of quantize()).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

MAGIC = b"W2BPACK1"


def _encode_codes(vectors: np.ndarray, bitlevel: int) -> np.ndarray:
    v = np.asarray(vectors, np.float32)
    neg = np.signbit(v).astype(np.uint8)
    if bitlevel == 1:
        if not np.all(np.abs(np.abs(v) * 3.0 - 1.0) < 1e-5):
            raise ValueError("values not on the 1-bit grid (+-1/3)")
        return neg
    if bitlevel == 2:
        a = np.abs(v)
        if not np.all((np.abs(a - 0.25) < 1e-6) | (np.abs(a - 0.75) < 1e-6)):
            raise ValueError("values not on the 2-bit grid (+-0.25/+-0.75)")
        hi = (a > 0.5).astype(np.uint8)
        return (neg << 1) | hi
    raise ValueError(f"packed storage supports bitlevel 1 or 2, got {bitlevel}")


def _decode_codes(codes: np.ndarray, bitlevel: int) -> np.ndarray:
    if bitlevel == 1:
        third = np.float32(1.0) / np.float32(3.0)
        return np.where(codes & 1, -third, third).astype(np.float32)
    mag = np.where(codes & 1, np.float32(0.75), np.float32(0.25))
    return np.where((codes >> 1) & 1, -mag, mag).astype(np.float32)


def write_packed(path: str, words: List[str], vectors: np.ndarray,
                 bitlevel: int) -> None:
    v = np.asarray(vectors, np.float32)
    V, D = v.shape
    codes = _encode_codes(v, bitlevel)
    row_bytes = (D * bitlevel + 7) // 8
    bitmat = np.zeros((V, row_bytes * 8), np.uint8)
    for b in range(bitlevel):
        bitmat[:, b::bitlevel][:, :D] = (codes >> b) & 1
    payload = np.packbits(bitmat, axis=1, bitorder="little").tobytes()

    words_blob = "\n".join(words).encode("utf-8", errors="surrogateescape")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<IIII", V, D, bitlevel, len(words_blob)))
        f.write(words_blob)
        f.write(payload)


def read_packed(path: str) -> Tuple[List[str], np.ndarray, int]:
    with open(path, "rb") as f:
        if f.read(8) != MAGIC:
            raise ValueError("not a W2BPACK1 file")
        V, D, bitlevel, wb = struct.unpack("<IIII", f.read(16))
        words = f.read(wb).decode("utf-8", errors="surrogateescape").split("\n")
        row_bytes = (D * bitlevel + 7) // 8
        raw = np.frombuffer(f.read(V * row_bytes), np.uint8).reshape(V, row_bytes)
    bitmat = np.unpackbits(raw, axis=1, bitorder="little")
    codes = np.zeros((V, D), np.uint8)
    for b in range(bitlevel):
        codes |= (bitmat[:, b::bitlevel][:, :D] << b).astype(np.uint8)
    return words, _decode_codes(codes, bitlevel), bitlevel
