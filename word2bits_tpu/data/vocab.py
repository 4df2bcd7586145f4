"""Vocabulary: build / sort / prune / save / load.

TPU-native re-design of the reference vocab layer (SURVEY.md section 2 C3-C5):
the 30M-slot open-addressing hash (reference src/word2bits.cpp:158-204) is a
CPU-side concern — here a plain dict/Counter does the counting (with a C++
fast path in word2bits_tpu.native for large corpora), and what ships to the
device is only the sorted count array.

Reference semantics preserved:
  * `</s>` pinned at index 0, never pruned (reference src/word2bits.cpp:276,
    :218-219, :225).
  * Newlines in the corpus map to `</s>` (reference src/word2bits.cpp:145-148).
  * Sort by descending count; words with count < min_count dropped
    (reference src/word2bits.cpp:215-242).  The reference's qsort breaks ties
    arbitrarily; we use a deterministic stable sort (ties keep first-occurrence
    order) — documented divergence, affects only the ordering of equal-count
    rows.
  * `train_words` = total count of surviving words incl. `</s>`
    (reference src/word2bits.cpp:233).
  * Save format: "word count\n" lines (reference src/word2bits.cpp:303-308);
    load re-sorts and re-prunes (reference src/word2bits.cpp:310-341).
  * Emergency ReduceVocab pruning with an incrementing min_reduce when the
    number of distinct words exceeds 21M (reference src/word2bits.cpp:244-263,
    :292) is reproduced in the counting paths.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

SENTENCE_TOKEN = "</s>"
# reference: vocab_hash_size=30M, reduce when vocab_size > 0.7 * that
# (reference src/word2bits.cpp:35,292)
REDUCE_THRESHOLD = 21_000_000


@dataclass
class Vocab:
    """Sorted vocabulary. index 0 is always `</s>`."""

    words: List[str]
    counts: np.ndarray  # int64 [V]
    index: Dict[str, int] = field(default_factory=dict)

    def __post_init__(self):
        if not self.index:
            self.index = {w: i for i, w in enumerate(self.words)}

    @property
    def size(self) -> int:
        return len(self.words)

    @property
    def train_words(self) -> int:
        return int(self.counts.sum())

    def lookup(self, word: str) -> int:
        """-1 for OOV, like reference SearchVocab (src/word2bits.cpp:166-174)."""
        return self.index.get(word, -1)

    @staticmethod
    def from_counts(counts: Dict[str, int], min_count: int = 5) -> "Vocab":
        """Sort descending by count, prune < min_count (except `</s>`),
        `</s>` pinned at index 0 (reference src/word2bits.cpp:215-242)."""
        sent_count = counts.get(SENTENCE_TOKEN, 0)
        items = [(w, c) for w, c in counts.items()
                 if w != SENTENCE_TOKEN and c >= min_count]
        # Stable: descending count; ties keep dict insertion (= first-occurrence
        # for our counters) order.
        items.sort(key=lambda wc: -wc[1])
        words = [SENTENCE_TOKEN] + [w for w, _ in items]
        cns = np.asarray([sent_count] + [c for _, c in items], dtype=np.int64)
        return Vocab(words=words, counts=cns)

    def save(self, path: str) -> None:
        """Reference SaveVocab format (src/word2bits.cpp:303-308)."""
        with open(path, "w", encoding="utf-8", errors="surrogateescape") as f:
            for w, c in zip(self.words, self.counts):
                f.write(f"{w} {int(c)}\n")

    @staticmethod
    def load(path: str, min_count: int = 5) -> "Vocab":
        """Reference ReadVocab: read 'word count' lines then re-sort/prune
        (src/word2bits.cpp:310-341)."""
        counts: Dict[str, int] = {}
        with open(path, "r", encoding="utf-8", errors="surrogateescape") as f:
            for line in f:
                parts = line.split()
                if len(parts) != 2:
                    continue
                counts[parts[0]] = int(parts[1])
        return Vocab.from_counts(counts, min_count=min_count)

    def unigram_weights(self, power: float = 0.75) -> np.ndarray:
        """count^power weights for negative sampling
        (reference src/word2bits.cpp:112-128, power=0.75 at :115)."""
        return np.power(self.counts.astype(np.float64), power)


def reduce_counts(counts: Dict[str, int], min_reduce: int) -> Dict[str, int]:
    """Reference ReduceVocab: drop words with count <= min_reduce
    (src/word2bits.cpp:245-263 keeps cn > min_reduce)."""
    return {w: c for w, c in counts.items() if c > min_reduce}
