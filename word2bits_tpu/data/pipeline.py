"""Epoch array construction: subsampling + sentence segmentation + padding.

The reference worker interleaves corpus reading, frequent-word subsampling and
sentence buffering per thread (reference src/word2bits.cpp:394-413).  The
TPU-native formulation precomputes, once per epoch, a flat *kept-token* array
plus a parallel *sentence-id* array, padded to a fixed capacity so every
training step has static shapes.  The jitted step then slices consecutive
centers and derives contexts from neighbors with matching sentence ids —
dense, vectorized, MXU/VPU-friendly.

Reference semantics preserved:
  * keep probability (sqrt(cn/(s*T)) + 1) * (s*T)/cn, discard when that is
    < uniform (reference src/word2bits.cpp:401-407); `</s>` is never
    subsampled (the sentence-fill loop breaks on word 0 before the check).
  * sentences break at `</s>` and at MAX_SENTENCE_LENGTH=1000 *kept* words
    (reference src/word2bits.cpp:32,408-411); context windows never cross a
    sentence boundary (:431-434).
  * subsampling uses fresh randomness every epoch (per-thread LCG state
    carries across the epoch loop) — here a fresh PRNG seed per epoch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_SENTENCE_LENGTH = 1000  # reference src/word2bits.cpp:32
PAD_ID = np.int32(-1)


def subsample_keep_probs(counts: np.ndarray, sample: float,
                         train_words: int) -> np.ndarray:
    """Per-word keep probability (reference src/word2bits.cpp:403-404).
    Values can exceed 1 (always keep).  sample<=0 disables subsampling."""
    counts = counts.astype(np.float64)
    if sample <= 0:
        return np.ones_like(counts)
    st = sample * float(train_words)
    with np.errstate(divide="ignore", invalid="ignore"):
        ran = (np.sqrt(counts / st) + 1.0) * st / counts
    ran[~np.isfinite(ran)] = 1.0  # count==0 rows (only `</s>` can be 0)
    return ran


@dataclass
class EpochArrays:
    """Device-ready epoch data.

    tokens:   int32 [capacity] — kept word ids; PAD_ID beyond n_tokens and in
              the left halo margin
    sent_ids: int32 [capacity] — sentence index per token; -1 on padding
    n_tokens: number of valid centers
    halo:     number of PAD slots prepended so a slice starting at
              (center - window) is always in bounds
    """

    tokens: np.ndarray
    sent_ids: np.ndarray
    n_tokens: int
    halo: int
    source_len: int = 0  # encoded tokens this segment was built from


def expected_kept_fraction(counts: np.ndarray, sample: float,
                           train_words: int) -> float:
    """E[kept tokens] / train_words under the subsampling distribution —
    used to pre-compute LR word-accounting for streamed epochs."""
    if train_words <= 0:
        return 1.0
    probs = np.minimum(subsample_keep_probs(counts, sample, train_words), 1.0)
    return float((probs * counts).sum() / max(train_words, 1))


def iter_epoch_segments(encoded: np.ndarray, counts: np.ndarray, sample: float,
                        train_words: int, window: int,
                        rng: np.random.Generator, segment_tokens: int,
                        capacity: int | None = None):
    """Yield EpochArrays for fixed-size segments of one epoch, so corpora
    larger than HBM stream through the device.

    Segments hard-cut at segment_tokens boundaries — the same "slop" as the
    reference's per-thread byte-offset sharding (reference
    src/word2bits.cpp:377, SURVEY.md C10): a window never crosses a segment
    seam, losing at most `window` context pairs per seam.  All segments share
    one padded capacity so the jitted chunk compiles once.
    """
    n = len(encoded)
    segment_tokens = max(segment_tokens, 1)
    if capacity is None:
        capacity = ((min(n, segment_tokens) + 1023) // 1024) * 1024
    for start in range(0, n, segment_tokens):
        seg = encoded[start:start + segment_tokens]
        yield build_epoch_arrays(seg, counts, sample, train_words, window,
                                 rng, capacity=capacity)


def cold_positions(tokens: np.ndarray, batch_size: int, window: int,
                   n_rows: int, hot_rows: int, pad_mult: int = 256,
                   min_width: int = 0) -> np.ndarray:
    """Per-step compaction map for the slab scatter's *cold* rows.

    For global step t the training chunk scatters the slab window
    tokens[t*B : t*B + B+2W] (models/cbow_fused.py).  Ids < hot_rows are
    handled densely by ops.scatter.hot_slice_add (the vocab is count-sorted,
    so they are the frequent words); the rest must still be scattered — but
    XLA's scatter loop pays ~per-row whether or not a row is masked, so the
    win requires *compacting* the cold rows to their actual count.  Their
    positions depend only on the epoch token array, so they are precomputed
    here, once per epoch, instead of sorted in-step (in-step sort/compaction
    was measured far too expensive — ROADMAP round-1 scatter notes).

    Returns int32 [n_rows, C]: positions within each step's B+2W slab window
    holding a token id >= hot_rows; -1 padding.  C = max cold count over the
    epoch, rounded up to pad_mult (stable jit shapes across chunks; across
    epochs C can change bucket and trigger one recompile — rare in practice).
    Memory: ~2·C/B int32 per corpus token; intended for text8-scale segments
    (at 2^28-token streamed segments this is a few hundred MB — disable
    -hot-rows there or shrink -segment-tokens).
    """
    B, W = int(batch_size), int(window)
    span = B + 2 * W
    ids = np.maximum(np.asarray(tokens, np.int32), 0)
    need = n_rows * B + 2 * W
    if len(ids) < need:  # right margin for the final (padding-only) steps
        ids = np.concatenate([ids, np.zeros(need - len(ids), np.int32)])
    windows = np.lib.stride_tricks.sliding_window_view(ids, span)[::B][:n_rows]
    cold = windows >= hot_rows                       # [n_rows, span] (a view)
    counts = cold.sum(axis=1)
    C = max(int(counts.max(initial=0)), min_width, 1)
    C = ((C + pad_mult - 1) // pad_mult) * pad_mult
    out = np.full((n_rows, C), -1, np.int32)
    # batched stable argsort floats cold positions first per row
    w = min(C, span)  # C may exceed span when min_width demands it
    for lo in range(0, n_rows, 1024):
        hi = min(lo + 1024, n_rows)
        order = np.argsort(~cold[lo:hi], axis=1, kind="stable")[:, :w]
        ok = np.take_along_axis(cold[lo:hi], order, axis=1)
        out[lo:hi, :w] = np.where(ok, order, -1).astype(np.int32)
    return out


def build_epoch_arrays(encoded: np.ndarray, counts: np.ndarray, sample: float,
                       train_words: int, window: int, rng: np.random.Generator,
                       capacity: int | None = None,
                       uniforms: np.ndarray | None = None) -> EpochArrays:
    """One epoch's subsampled, sentence-segmented, halo-padded arrays.

    `encoded` is the full encoded corpus (id 0 = `</s>` sentence breaks, OOV
    already dropped).  `capacity` fixes the padded length for stable jit
    shapes across epochs (default: len(encoded) rounded up to a multiple of
    1024).  `uniforms` injects the subsampling draws (testing: lets the
    device builder in data/device_pipeline.py be compared bit-for-bit).
    """
    encoded = np.asarray(encoded, dtype=np.int32)
    is_sent = encoded == 0

    keep_probs = subsample_keep_probs(counts, sample, train_words)
    u = rng.random(encoded.shape[0]) if uniforms is None else uniforms
    keep = (u <= keep_probs[encoded]) | is_sent  # `</s>` never subsampled

    kept = encoded[keep]
    kept_is_sent = kept == 0

    # Sentence index: increments after each `</s>`; the `</s>` tokens
    # themselves are then dropped.
    sent_base = np.cumsum(kept_is_sent, dtype=np.int64)
    sent_base = np.concatenate([[0], sent_base[:-1]])  # id of the sentence a token is in
    tokens = kept[~kept_is_sent]
    sent_of_tok = sent_base[~kept_is_sent]

    # Split sentences longer than MAX_SENTENCE_LENGTH kept words: position
    # within sentence // 1000 becomes a sub-sentence component.
    if tokens.shape[0] > 0:
        change = np.concatenate([[True], sent_of_tok[1:] != sent_of_tok[:-1]])
        starts = np.flatnonzero(change)
        pos_in_sent = np.arange(tokens.shape[0], dtype=np.int64)
        pos_in_sent -= np.repeat(starts, np.diff(np.append(starts, tokens.shape[0])))
        sub = pos_in_sent // MAX_SENTENCE_LENGTH
        # combine (sentence, sub) into a single increasing id
        combo = sent_of_tok * ( (pos_in_sent.max() // MAX_SENTENCE_LENGTH) + 2 ) + sub
        # combo is NONDECREASING in token order (sent ids come from a
        # cumsum; sub only grows within a sentence), so consecutive
        # group-ranking == np.unique(..., return_inverse=True) at a
        # fraction of the cost (unique sorts: ~7 s of a 17M-token epoch)
        sent_final = np.cumsum(
            np.concatenate([[0], (combo[1:] != combo[:-1]).astype(np.int32)]),
            dtype=np.int32)
    else:
        sent_final = np.zeros(0, dtype=np.int32)

    n = tokens.shape[0]
    halo = int(window)
    if capacity is None:
        capacity = ((len(encoded) + 1023) // 1024) * 1024
    total = halo + capacity + halo  # left margin + data+padding + right margin
    out_tokens = np.full(total, PAD_ID, dtype=np.int32)
    out_sents = np.full(total, -1, dtype=np.int32)
    out_tokens[halo:halo + n] = tokens
    out_sents[halo:halo + n] = sent_final
    return EpochArrays(tokens=out_tokens, sent_ids=out_sents,
                       n_tokens=n, halo=halo, source_len=len(encoded))
