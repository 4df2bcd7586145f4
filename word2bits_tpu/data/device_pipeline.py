"""Device-side epoch preparation: subsample + compact + segment on the TPU.

The host pipeline (data/pipeline.py) rebuilds each epoch's kept-token and
sentence-id arrays in NumPy (~0.5 s per text8 epoch, ~1 min at the
full-Wikipedia scale) and re-uploads them.  This module performs the same
construction as one jitted program on device, so the encoded corpus uploads
once and epoch prep costs milliseconds of VPU time:

  1. keep mask: uniform draw vs the reference keep probability
     (reference src/word2bits.cpp:401-407); `</s>` never subsampled.
  2. stream compaction: exclusive-cumsum destinations + one scatter
     (unique, monotone indices — XLA lowers this to a fast path, unlike
     the training step's duplicate-id scatters).
  3. sentence ids: raw ids count kept `</s>` breaks; the compacted stream
     is then re-segmented every MAX_SENTENCE_LENGTH=1000 kept words
     (reference src/word2bits.cpp:32,408-411) with a cummax position
     trick, yielding ids identical to the host pipeline's unique-inverse.

All shapes are static (capacity-padded), so the builder compiles once and
is reused every epoch with a fresh PRNG key (the host pipeline's
fresh-seed-per-epoch semantics).  Output arrays are bit-identical to
build_epoch_arrays given the same uniform draws (tests/test_device_pipeline.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from word2bits_tpu.data.pipeline import MAX_SENTENCE_LENGTH, PAD_ID


def _build(capacity: int, halo: int, encoded, keep_probs, uniforms):
    """The jitted body; uniforms is the per-token U(0,1) draw."""
    n = encoded.shape[0]
    total = halo + capacity + halo

    is_sent = encoded == 0
    keep = (uniforms <= keep_probs[encoded]) | is_sent
    final = keep & ~is_sent

    # sentence id of each raw token = number of kept `</s>` strictly before it
    kept_sent = (keep & is_sent).astype(jnp.int32)
    sent_raw = jnp.cumsum(kept_sent) - kept_sent  # exclusive cumsum

    finals = final.astype(jnp.int32)
    dest = jnp.cumsum(finals) - finals  # exclusive: position among kept words
    n_tokens = jnp.sum(finals)

    # compaction scatter: kept words go to halo+dest, everything else is
    # dropped via an out-of-range index (mode="drop")
    idx = jnp.where(final, halo + dest, total)
    tokens = jnp.full((total,), PAD_ID, jnp.int32).at[idx].set(
        encoded, mode="drop")
    sraw = jnp.full((total,), -1, jnp.int32).at[idx].set(
        sent_raw.astype(jnp.int32), mode="drop")

    # re-segment the compacted stream: a new sentence starts where the raw
    # sentence id changes, or every MAX_SENTENCE_LENGTH kept words within one
    valid = sraw >= 0
    prev = jnp.concatenate([jnp.full((1,), -2, jnp.int32), sraw[:-1]])
    is_new = valid & (sraw != prev)
    pos_idx = jnp.arange(total, dtype=jnp.int32)
    start_idx = jax.lax.cummax(jnp.where(is_new, pos_idx, -1))
    pos = pos_idx - start_idx
    boundary = is_new | (valid & (pos > 0) & (pos % MAX_SENTENCE_LENGTH == 0))
    sent_final = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    sents = jnp.where(valid, sent_final, -1).astype(jnp.int32)

    return tokens, sents, n_tokens


def make_device_epoch_builder(capacity: int, halo: int):
    """Returns build(encoded, keep_probs, key) -> (tokens, sents, n_tokens).

    encoded:    int32 [n] device array (id 0 = `</s>`), uploaded once
    keep_probs: float32 [V] from pipeline.subsample_keep_probs
    key:        per-epoch PRNG key (threefry; divergence from the host
                pipeline's numpy Generator stream — same distribution,
                different draws, documented like the training RNG in C9)
    """
    body = functools.partial(_build, capacity, halo)

    @jax.jit
    def build(encoded, keep_probs, key):
        uniforms = jax.random.uniform(key, encoded.shape, jnp.float32)
        return body(encoded, keep_probs.astype(jnp.float32), uniforms)

    return build


def build_with_uniforms(capacity: int, halo: int, encoded, keep_probs,
                        uniforms):
    """Testing entry: identical to the builder but with injected uniforms,
    so outputs can be compared bit-for-bit against the host pipeline."""
    return jax.jit(functools.partial(_build, capacity, halo))(
        encoded, jnp.asarray(keep_probs, jnp.float32),
        jnp.asarray(uniforms, jnp.float32))
