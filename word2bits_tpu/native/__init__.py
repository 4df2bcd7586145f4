"""ctypes bindings for the native tokenizer (word2bits_tpu/native/tokenizer.cpp).

Builds libw2btok.so on first use (g++, cached next to the source).  All entry
points return None on any failure so callers fall back to the pure-Python
implementations in word2bits_tpu.data.corpus.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Dict, List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tokenizer.cpp")
_SO = os.path.join(_DIR, "libw2btok.so")


class _NativeLib:
    def __init__(self, cdll):
        self._lib = cdll
        self._lib.w2b_count_words.restype = ctypes.c_int64
        self._lib.w2b_count_words.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        self._lib.w2b_encode.restype = ctypes.c_int64
        self._lib.w2b_encode.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_char_p]
        self._lib.w2b_alias_build.restype = ctypes.c_int64
        self._lib.w2b_alias_build.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64]
        self._lib.w2b_lcg_fill.restype = ctypes.c_int64
        self._lib.w2b_lcg_fill.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]

    def count_words(self, path: str) -> Optional[Dict[str, int]]:
        with tempfile.NamedTemporaryFile(suffix=".counts", delete=False) as tf:
            out = tf.name
        try:
            n = self._lib.w2b_count_words(path.encode(), out.encode())
            if n < 0:
                return None
            counts: Dict[str, int] = {}
            with open(out, "r", encoding="utf-8",
                      errors="surrogateescape") as f:
                for line in f:
                    sp = line.rsplit(" ", 1)
                    if len(sp) == 2:
                        counts[sp[0]] = int(sp[1])
            return counts
        finally:
            os.unlink(out)

    def encode_corpus(self, path: str, words: List[str]) -> Optional[np.ndarray]:
        with tempfile.NamedTemporaryFile(suffix=".vocab", delete=False,
                                         mode="w", encoding="utf-8",
                                         errors="surrogateescape") as vf:
            vf.write("\n".join(words) + "\n")
            vocab_path = vf.name
        with tempfile.NamedTemporaryFile(suffix=".ids", delete=False) as tf:
            out = tf.name
        try:
            n = self._lib.w2b_encode(path.encode(), vocab_path.encode(),
                                     out.encode())
            if n < 0:
                return None
            return np.fromfile(out, dtype="<i4", count=n)
        finally:
            os.unlink(vocab_path)
            os.unlink(out)

    def lcg_fill(self, start_draw: int, n: int,
                 seed: int = 1) -> Optional[np.ndarray]:
        """Reference-init LCG draws [start_draw, start_draw+n) as float32
        (utils/lcg.lcg_uniform_block fast path)."""
        out = np.empty(n, np.float32)
        try:
            rc = self._lib.w2b_lcg_fill(start_draw, n, seed, out)
        except Exception:
            return None
        return out if rc == n else None

    def alias_build(self, scaled: np.ndarray):
        """Walker construction from mean-1 scaled weights; returns
        (prob float64 [V], alias int64 [V]) or None on failure.
        `scaled` must be a fresh C-contiguous float64 copy (mutated)."""
        V = scaled.shape[0]
        prob = np.empty(V, np.float64)
        alias = np.empty(V, np.int64)
        try:
            rc = self._lib.w2b_alias_build(scaled, prob, alias, V)
        except Exception:
            return None
        return (prob, alias) if rc == V else None


def _build() -> Optional[_NativeLib]:
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=300)
        except Exception:
            return None
    try:
        return _NativeLib(ctypes.CDLL(_SO))
    except OSError:
        return None


lib = _build()
