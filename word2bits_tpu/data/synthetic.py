"""Synthetic corpus generation (offline stand-in for text8).

The container has no network egress, so the reference's
data/download_text8.sh pipeline can't fetch enwik8.  For throughput
benchmarking and convergence smoke tests we generate a Zipf-distributed
corpus with text8-like shape: ~17M space-separated lowercase tokens, no
newlines, ~70k distinct words above min-count 5.  (Analogy-accuracy parity
requires the real text8 and is validated via the evaluator cross-check tests
instead.)
"""

from __future__ import annotations

import numpy as np


def zipf_corpus(path: str, n_tokens: int = 17_000_000, vocab: int = 70_000,
                s: float = 1.05, seed: int = 0, chunk: int = 1 << 20) -> None:
    """Write a Zipf(s) corpus of n_tokens words drawn from `vocab` types."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = ranks ** (-s)
    probs /= probs.sum()
    cdf = np.cumsum(probs)
    # word strings: short, letter-only (like text8's lowercase stream)
    words = np.asarray([_word_for(i) for i in range(vocab)], dtype=object)
    with open(path, "wb") as f:
        remaining = n_tokens
        while remaining > 0:
            m = min(chunk, remaining)
            u = rng.random(m)
            ids = np.searchsorted(cdf, u)
            f.write(b" ".join(words[ids]) + b" ")
            remaining -= m


_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _word_for(i: int) -> bytes:
    out = []
    i += 1
    while i > 0:
        i, r = divmod(i - 1, 26)
        out.append(_ALPHA[r])
    return ("w" + "".join(reversed(out))).encode()
