"""Vectorized reproduction of the reference's 48-bit LCG.

The reference uses `next = next * 25214903917 + 11 (mod 2^64)` (the
java.util.Random multiplier) everywhere randomness is needed; uniform floats
come from `(next & 0xFFFF) / 65536` (reference src/word2bits.cpp:352,358,405,
428,455).  Parameter init consumes this stream *sequentially* from seed 1
(v table first, then u — reference src/word2bits.cpp:343-361), so exact init
parity requires evaluating the k-th LCG state for millions of k.

The affine map f(x) = A*x + C composes in closed form:
    f^(m+n) = (A_n * A_m,  A_n * C_m + C_n)
so the k-th state is computed per element in O(64) vector ops via the binary
decomposition of k — no sequential scan.  All arithmetic is numpy uint64,
which wraps mod 2^64 exactly like the C unsigned long long.
"""

from __future__ import annotations

import numpy as np

LCG_A = np.uint64(25214903917)
LCG_C = np.uint64(11)


def lcg_next(state: np.uint64) -> np.uint64:
    """One scalar LCG step (mod 2^64)."""
    with np.errstate(over="ignore"):
        return np.uint64(state * LCG_A + LCG_C)


def _pow_tables(max_bits: int = 64):
    """(A^(2^j), C_(2^j)) for j in [0, max_bits)."""
    As = np.empty(max_bits, dtype=np.uint64)
    Cs = np.empty(max_bits, dtype=np.uint64)
    a, c = LCG_A, LCG_C
    with np.errstate(over="ignore"):
        for j in range(max_bits):
            As[j] = a
            Cs[j] = c
            # doubling: f^(2n) = f^n o f^n
            c = np.uint64(a * c + c)
            a = np.uint64(a * a)
    return As, Cs


_POW_A, _POW_C = _pow_tables()


def lcg_states_at(ks: np.ndarray, seed: int = 1) -> np.ndarray:
    """State after exactly ks[i] steps from `seed`, vectorized over ks."""
    ks = np.asarray(ks, dtype=np.uint64)
    accA = np.ones_like(ks, dtype=np.uint64)
    accC = np.zeros_like(ks, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(64):
            bit = (ks >> np.uint64(j)) & np.uint64(1)
            if not bit.any():
                if (ks >> np.uint64(j)).max() == 0:
                    break
                continue
            sel = bit.astype(bool)
            # compose: current f^m then f^(2^j)
            a2, c2 = _POW_A[j], _POW_C[j]
            accC[sel] = np.uint64(a2) * accC[sel] + np.uint64(c2)
            accA[sel] = np.uint64(a2) * accA[sel]
        return np.uint64(accA * np.uint64(seed) + accC)


_LANE_BITS = 16           # 65536 lanes: f^65536 is _POW tables entry 16
_LANES = 1 << _LANE_BITS


def lcg_uniform_block(start_draw: int, n: int, seed: int = 1) -> np.ndarray:
    """The reference init stream: values for draws [start_draw, start_draw+n).

    Draw i (0-based) is produced by the state after (i+1) LCG steps from
    `seed`; the value is ((state & 0xFFFF) / 65536) - 0.5, float32
    (reference src/word2bits.cpp:350-360).

    Contiguous draws are generated lane-strided: one O(64) skip-ahead for
    the _LANES lane heads, then each row of _LANES states advances by the
    precomputed affine f^_LANES — 2 vector ops per _LANES draws instead of
    the ~64 masked passes per draw of per-element skip-ahead (the
    per-element path made 3.7M x 800d reference init take ~an hour; this is
    ~2 element-ops per draw, seconds at that scale).  Bit-exact: composes
    the same affine maps, asserted against the scalar oracle in
    tests/test_lcg.py.
    """
    if n <= 0:
        return np.empty(0, dtype=np.float32)
    try:  # native sequential fill (~1 ns/draw, threaded) when available
        from word2bits_tpu import native
        if native.lib is not None:
            out = native.lib.lcg_fill(int(start_draw), int(n), int(seed))
            if out is not None:
                return out
    except Exception:
        pass
    heads = lcg_states_at(
        np.arange(start_draw + 1, start_draw + 1 + _LANES, dtype=np.uint64),
        seed=seed)
    rows = -(-n // _LANES)
    states = np.empty((rows, _LANES), dtype=np.uint64)
    aW, cW = _POW_A[_LANE_BITS], _POW_C[_LANE_BITS]
    cur = heads
    with np.errstate(over="ignore"):
        for r in range(rows):
            states[r] = cur
            if r + 1 < rows:
                cur = aW * cur + cW
    flat = states.reshape(-1)[:n]
    return ((flat & np.uint64(0xFFFF)).astype(np.float32)
            / np.float32(65536.0) - np.float32(0.5))


def lcg_values_scalar(n: int, seed: int = 1) -> np.ndarray:
    """Slow scalar-loop oracle for tests."""
    out = np.empty(n, dtype=np.float32)
    state = np.uint64(seed)
    for i in range(n):
        state = lcg_next(state)
        out[i] = np.float32((state & np.uint64(0xFFFF))) / np.float32(65536.0) - np.float32(0.5)
    return out
