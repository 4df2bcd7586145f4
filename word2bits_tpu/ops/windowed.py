"""Banded-block MXU formulation of the slab step's windowed sums.

The slab step (models/cbow_slab.py) computes two windowed reductions per
step, each as 2W shifted masked adds over [B, D] arrays (the TPU regrouping
of the reference's per-(center, context) loops at src/word2bits.cpp:431-449
and :494-503):

  csum[b]    = sum_o mask[b, o] * q_slab[W + b + o]      (context sums)
  du_slab[p] = sum_b mask[b, p - b - W] * cavge[b]       (position updates)

At W=8 those are 16 passes over ~[B, D] each — VPU/HBM work.  This module
computes the SAME sums as banded block matmuls on the MXU: tile the batch
into Nt blocks of `tile` centers; a tile's contexts span only tile+2W slab
positions, so with a per-tile [tile, tile+2W] 0/1 mask M

  csum-tile  = M  @ q_window        ([tile, F] x [F, D]  per tile)
  du-window  = M^T @ cavge-tile     ([F, tile] x [tile, D] per tile)

and du windows overlap-add by their 2W halo (tile t's tail rows land on
tile t+1's head).  The mask matrix additionally carries the squared-norm
column trick: augmenting q_window with a ||q||^2 column yields sq_sum from
the same contraction.  Row/column sums of M give cw (context counts) and
cnt (per-position visit counts).

Identical math, different float summation order (MXU reduction tree vs
sequential offset adds) — equality tests run at the step suite's tolerance.
Selected with -banded-tile N (config.banded_tile); measured against the
shift formulation by tools/step_bench.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def pick_tile(B: int, W: int, requested: int) -> int:
    """Largest usable tile <= requested that divides B, with tile >= 2W
    (the overlap-add fold needs the halo to fit one tile)."""
    t = min(requested, B)
    while t >= max(2 * W, 1):
        if B % t == 0:
            return t
        t -= 1
    raise ValueError(f"no banded tile <= {requested} divides B={B} "
                     f"with tile >= 2W={2 * W}")


def build_banded_masks(slab_sents, shrink, B: int, W: int, tile: int):
    """Per-tile banded context masks.

    Returns (M [Nt, tile, F] float32, win_idx [Nt, F] int32, valid [B] bool)
    with F = tile + 2W.  M[t, i, j] = 1 iff slab position t*tile + j is a
    context of center t*tile + i: within the shrunk window (|o| <= W -
    shrink, o != 0 — reference src/word2bits.cpp:428-431), same sentence,
    both unpadded (:431-434 sentence-buffer boundary)."""
    Nt = B // tile
    F = tile + 2 * W
    base = (jnp.arange(Nt, dtype=jnp.int32) * tile)[:, None]
    win_idx = base + jnp.arange(F, dtype=jnp.int32)[None, :]       # [Nt, F]
    sent_win = slab_sents[win_idx]                                 # [Nt, F]
    csent = slab_sents[W + base + jnp.arange(tile, dtype=jnp.int32)[None, :]]
    valid = (csent >= 0)                                           # [Nt, tile]
    shrink3 = shrink.reshape(Nt, tile)
    # offset of window column j relative to center i: o = j - i - W
    o = (jnp.arange(F, dtype=jnp.int32)[None, None, :]
         - jnp.arange(tile, dtype=jnp.int32)[None, :, None] - W)
    in_win = (jnp.abs(o) <= (W - shrink3)[:, :, None]) & (o != 0)
    m = (in_win & (sent_win[:, None, :] == csent[..., None])
         & valid[..., None] & (sent_win[:, None, :] >= 0))
    return m.astype(jnp.float32), win_idx, valid.reshape(B)


def _tile_windows(x, Nt: int, tile: int, W: int):
    """[B+2W, ...] -> [Nt, tile+2W, ...] sliding tile windows via two
    reshapes + one pad — NO row gather (the round-5 floor ablation showed
    the win_idx gather of overlapping windows as a visible slice of the
    scatter-free step; slices/reshapes stream at memcpy speed)."""
    B = Nt * tile
    a = x[:B].reshape((Nt, tile) + x.shape[1:])
    pad = ((0, tile - 2 * W),) + ((0, 0),) * (x.ndim - 1)
    h = jnp.pad(x[tile:], pad).reshape((Nt, tile) + x.shape[1:])[:, :2 * W]
    return jnp.concatenate([a, h], axis=1)


def banded_context(q_slab, q_sq, M, win_idx, B: int):
    """(csum [B, D], sq_sum [B], cw [B]) via one MXU contraction per tile.

    q_sq=None skips the squared-norm column entirely (reg == 0: the only
    consumer is the -reg*||q||^2 loss term) — which also avoids the
    [B+2W, D+1] augmented concat whose off-tile lane count forced a
    relayout copy of the whole slab (round-5 floor ablation).
    """
    del win_idx  # retained in the signature for the mask-builder pairing
    D = q_slab.shape[1]
    Nt, tile, F = M.shape
    W = (F - tile) // 2
    if q_sq is None:
        aug = _tile_windows(q_slab, Nt, tile, W)           # [Nt, F, D]
    else:
        aug = _tile_windows(
            jnp.concatenate([q_slab, q_sq[:, None]], axis=1),
            Nt, tile, W)                                   # [Nt, F, D+1]
    out = lax.dot_general(M, aug, (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
    csum = out[..., :D].reshape(B, D)
    sq_sum = None if q_sq is None else out[..., D].reshape(B)
    cw = jnp.sum(M, axis=2).reshape(B)
    return csum, sq_sum, cw


def banded_usum(M, cavge, B: int, W: int):
    """(du_slab [B+2W, D], cnt [B+2W]) — the transpose contraction with
    overlap-add of each tile's 2W-halo tail onto the next tile's head.
    `M` must already carry any per-center weighting (e.g. the active mask:
    pass M * af)."""
    Nt, tile, F = M.shape
    D = cavge.shape[1]
    cav3 = cavge.reshape(Nt, tile, D)
    duw = lax.dot_general(M, cav3, (((1,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)  # [Nt, F, D]
    cntw = jnp.sum(M, axis=1)                                  # [Nt, F]

    body, tail = duw[:, :tile], duw[:, tile:]                  # halo = 2W rows
    # tile t's tail covers slab rows [(t+1)*tile, (t+1)*tile + 2W):
    # pad each tail to a full tile and shift the stack down by one tile
    shifted = jnp.pad(tail, ((1, 0), (0, tile - 2 * W), (0, 0)))[:Nt]
    du_slab = jnp.concatenate([(body + shifted).reshape(B, D), tail[-1]])

    cbody, ctail = cntw[:, :tile], cntw[:, tile:]
    cshift = jnp.pad(ctail, ((1, 0), (0, tile - 2 * W)))[:Nt]
    cnt = jnp.concatenate([(cbody + cshift).reshape(B), ctail[-1]])
    return du_slab, cnt
