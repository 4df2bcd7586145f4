"""Balanced hot-head vocab layout for the dense-hot sharded step.

The vocab is count-sorted, so the dense-hot negative stratum
(ARCHITECTURE.md; reference hot-loop negatives at src/word2bits.cpp:450-460
replaced by their exact expectation) scores every center against rows with
global id < H.  Under the plain contiguous row-sharding (owner = id // Vs)
those H rows all live on vocab shard 0, and SPMD lockstep forces every other
shard to burn identical [B, H] MXU FLOPs with all-zero weights — nv x
redundancy on the hottest contraction of the step.

This layout splits the hot head ACROSS the vocab shards at placement time:

  layout slot map (global id g, nv shards, Hp = H rounded up to nv):
    g <  Hp : owner = g // (Hp/nv),        local = g % (Hp/nv)
    g >= Hp : owner = (g-Hp) // Cs,        local = Hp/nv + (g-Hp) % Cs
              where Cs = (Vp - Hp) / nv

so shard j's leading Hp/nv local rows are the hot sub-range
[j*Hp/nv, (j+1)*Hp/nv) and the dense-hot contraction shrinks to
[B, Hp/nv] per shard — the same TOTAL FLOPs as one shard of the old design,
i.e. an nv x reduction — while gathers/scatters for arbitrary ids stay two
integer ops (a piecewise owner/local map instead of a divide/mod).

Cold ownership stays contiguous (shard j owns cold block j), so the layout
changes nothing about collective volume: row exchange is still
masked-local-gather + psum, deltas still psum over "data".

Numerically the step is IDENTICAL to the unbalanced design (same terms, same
psum structure); only row placement moves.  Proven equal to the single-chip
fused dense-hot chunk in tests/test_sharded_chunk.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class HotLayout(NamedTuple):
    """Static description of the interleaved hot-head placement."""

    hot_pad: int        # hot boundary rounded up to a multiple of nv (Hp)
    hot_per_shard: int  # Hp // nv
    cold_per_shard: int # (Vp - Hp) // nv
    nv: int

    def owner_local(self, ids):
        """Piecewise (owner shard, local row) map for global ids (jnp)."""
        Hp, Hs, Cs = self.hot_pad, self.hot_per_shard, self.cold_per_shard
        is_hot = ids < Hp
        owner_h = ids // Hs
        local_h = ids % Hs
        c = jnp.maximum(ids - Hp, 0)
        owner_c = c // Cs
        local_c = Hs + c % Cs
        return (jnp.where(is_hot, owner_h, owner_c),
                jnp.where(is_hot, local_h, local_c))


def make_hot_layout(vocab_size_padded: int, nv: int, hot_rows: int) -> HotLayout:
    """Build the layout for `hot_rows` hot ids over `nv` vocab shards.

    hot_rows is rounded UP to a multiple of nv (the padding tail
    [hot_rows, Hp) is laid out as hot but carries zero dense weight — pad
    hot_w with zeros via pad_hot_weights).  Requires Hp < Vp so every shard
    keeps a nonempty cold block.
    """
    if vocab_size_padded % nv:
        raise ValueError(f"vocab {vocab_size_padded} not divisible by {nv}")
    Hp = -(-hot_rows // nv) * nv
    if Hp <= 0:
        raise ValueError("hot layout requires hot_rows > 0")
    if Hp >= vocab_size_padded:
        raise ValueError(
            f"hot head {Hp} (rounded to {nv}) must leave a nonempty cold "
            f"block in a {vocab_size_padded}-row padded vocab")
    return HotLayout(hot_pad=Hp, hot_per_shard=Hp // nv,
                     cold_per_shard=(vocab_size_padded - Hp) // nv, nv=nv)


def pad_hot_weights(hot_w: np.ndarray, layout: HotLayout) -> np.ndarray:
    """Zero-extend the dense hot weights to the layout's padded boundary."""
    pad = layout.hot_pad - hot_w.shape[0]
    if pad < 0:
        raise ValueError("hot_w longer than the layout's hot head")
    if pad == 0:
        return np.asarray(hot_w)
    return np.concatenate([np.asarray(hot_w), np.zeros(pad, hot_w.dtype)])


def layout_order(layout: HotLayout, vocab_size_padded: int) -> np.ndarray:
    """index array: layout slot -> global id (len Vp).  x[layout_order]
    places a (Vp, D) table into layout order for shard_params."""
    Hp, Hs, Cs, nv = layout
    order = np.empty(vocab_size_padded, np.int64)
    for j in range(nv):
        base = j * (Hs + Cs)
        order[base:base + Hs] = np.arange(j * Hs, (j + 1) * Hs)
        order[base + Hs:base + Hs + Cs] = Hp + np.arange(j * Cs, (j + 1) * Cs)
    return order


def to_layout(x, layout: HotLayout):
    """Permute rows of a padded (Vp, ...) array into layout order."""
    return np.asarray(x)[layout_order(layout, np.asarray(x).shape[0])]


def from_layout(x, layout: HotLayout):
    """Inverse of to_layout: recover global row order."""
    x = np.asarray(x)
    order = layout_order(layout, x.shape[0])
    out = np.empty_like(x)
    out[order] = x
    return out
