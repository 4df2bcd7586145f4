"""Corpus tokenization and encoding.

Tokenization rules match the reference ReadWord exactly
(reference src/word2bits.cpp:131-155):
  * word boundaries: space, tab, newline; '\\r' is ignored entirely
  * a newline emits a `</s>` token (after the word it terminated)
  * a final word at EOF with no trailing separator is DISCARDED (ReadWord sets
    eof and ReadWordIndex / the vocab counter both drop it —
    reference src/word2bits.cpp:177-185, :277-279)
  * words longer than MAX_STRING-1 are truncated (reference :152)

Two implementations: a C++ streaming tokenizer (word2bits_tpu.native — used
automatically when its shared library is built) and a NumPy/Python fallback.
Both produce identical token streams.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from word2bits_tpu.data.vocab import (
    REDUCE_THRESHOLD,
    SENTENCE_TOKEN,
    Vocab,
    reduce_counts,
)

MAX_STRING = 4096  # reference src/word2bits.cpp:29


def _truncate_word(w: bytes) -> bytes:
    """Reference truncation quirk (src/word2bits.cpp:150-152): once the write
    index hits MAX_STRING-1 it is decremented after each store, so later chars
    keep overwriting the saturated slot — and the terminating NUL
    (``word[a] = 0``) lands on that same slot, erasing it.  The stored word is
    therefore exactly the first MAX_STRING-2 chars."""
    if len(w) < MAX_STRING - 1:
        return w
    return w[: MAX_STRING - 2]


def tokenize_bytes(data: bytes, drop_trailing: bool = True) -> Iterator[bytes]:
    """Yield tokens from raw corpus bytes with reference ReadWord semantics.
    `</s>` is yielded as the literal bytes b'</s>'."""
    data = data.replace(b"\r", b"")  # reference :139 skips ch==13
    n = len(data)
    start = -1
    for i in range(n):
        c = data[i]
        if c in (0x20, 0x09, 0x0A):  # space, tab, newline
            if start >= 0:
                yield _truncate_word(data[start:i])
                start = -1
            if c == 0x0A:
                yield b"</s>"
        elif start < 0:
            start = i
    # Trailing word with no separator before EOF is dropped (reference quirk).
    if start >= 0 and not drop_trailing:
        yield _truncate_word(data[start:])


def split_tokens(data: bytes) -> List[bytes]:
    """Fast tokenizer: identical stream to tokenize_bytes() (tested against
    it), built from C-level bytes.split instead of a per-char Python loop."""
    data = data.replace(b"\r", b"")
    out: List[bytes] = []
    segments = data.split(b"\n")
    last = len(segments) - 1
    for si, seg in enumerate(segments):
        words = seg.split()
        if si == last:
            # Final segment: a trailing word with no separator is dropped
            # (reference EOF quirk); words followed by space/tab survive.
            if words and not (seg.endswith(b" ") or seg.endswith(b"\t")):
                words = words[:-1]
            out.extend(_truncate_word(w) if len(w) >= MAX_STRING - 1 else w
                       for w in words)
        else:
            out.extend(_truncate_word(w) if len(w) >= MAX_STRING - 1 else w
                       for w in words)
            out.append(b"</s>")
    return out


def _try_native():
    try:
        from word2bits_tpu.native import lib as native_lib  # noqa
        return native_lib
    except Exception:
        return None


def count_words(path: str, use_native: Optional[bool] = None) -> Dict[str, int]:
    """Single-pass word-frequency count (reference LearnVocabFromTrainFile,
    src/word2bits.cpp:265-301), including the emergency ReduceVocab pruning
    when distinct words exceed 21M (reference :292)."""
    native = _try_native() if use_native in (None, True) else None
    if native is not None:
        counts = native.count_words(path)
        if counts is not None:
            return counts
    if use_native is True:
        raise RuntimeError("native tokenizer requested but not available")

    from collections import Counter

    counts: Counter = Counter()
    min_reduce = 1
    with open(path, "rb") as f:
        data = f.read()
    counts.update(split_tokens(data))
    while len(counts) > REDUCE_THRESHOLD:
        counts = Counter(reduce_counts(counts, min_reduce))
        min_reduce += 1
    out = {k.decode("utf-8", errors="surrogateescape"): v for k, v in counts.items()}
    # `</s>` participates even with zero newlines (pinned at index 0).
    out.setdefault(SENTENCE_TOKEN, 0)
    return out


def encode_corpus(path: str, vocab: Vocab,
                  use_native: Optional[bool] = None) -> np.ndarray:
    """Encode the corpus as an int32 id array.

    OOV words are dropped (the reference skips them at train time,
    src/word2bits.cpp:398); newlines appear as id 0 (`</s>`).  This is the
    array the training pipeline subsamples and batches from.
    """
    native = _try_native() if use_native in (None, True) else None
    if native is not None:
        ids = native.encode_corpus(path, vocab.words)
        if ids is not None:
            return ids
    if use_native is True:
        raise RuntimeError("native tokenizer requested but not available")

    index = {w.encode("utf-8", errors="surrogateescape"): i
             for i, w in enumerate(vocab.words)}
    with open(path, "rb") as f:
        data = f.read()
    get = index.get
    ids = [i for i in map(get, split_tokens(data)) if i is not None]
    return np.asarray(ids, dtype=np.int32)


def build_vocab(path: str, min_count: int = 5,
                use_native: Optional[bool] = None) -> Vocab:
    """Corpus scan -> sorted, pruned Vocab."""
    return Vocab.from_counts(count_words(path, use_native=use_native),
                             min_count=min_count)
