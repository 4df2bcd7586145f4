"""Vocab-sharded + data-parallel training step under shard_map.

The TPU-native replacement for Hogwild (SURVEY.md section 2 C17): a
synchronous step over a ("data", "vocab") mesh where

  * `u`, `v` are sharded by vocabulary rows across the "vocab" axis
    (P("vocab", None)) and replicated across "data",
  * each "data" shard processes B/N_data centers of the global minibatch,
  * embedding rows are fetched from their owning vocab shard with a
    masked-local-gather + psum over "vocab" (the all-gather of minibatch rows
    riding ICI),
  * scatter-add updates are accumulated into a local (V_shard, D) delta,
    summed over "data" with psum, and applied only by the owning shard,
  * loss telemetry is psum'd over both axes.

Numerical equivalence with the single-device step is exact up to float
summation order (asserted in tests on an 8-virtual-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from word2bits_tpu.models.cbow import (
    Batch,
    CBOWHyper,
    _context_stats,
    _negative_stats,
)
from word2bits_tpu.parallel.mesh import DATA_AXIS, VOCAB_AXIS


def shard_params(u, v, mesh: Mesh):
    """Place u, v vocab-row-sharded on the mesh (pad V to the shard count
    upstream if needed)."""
    spec = NamedSharding(mesh, P(VOCAB_AXIS, None))
    return jax.device_put(u, spec), jax.device_put(v, spec)


def _gather_rows(table_local, ids, vocab_shard_size):
    """Fetch global rows `ids` from a vocab-sharded table: mask non-owned
    rows to zero, psum over the vocab axis -> every shard holds the rows."""
    my = lax.axis_index(VOCAB_AXIS)
    owner = ids // vocab_shard_size
    local = ids % vocab_shard_size
    rows = table_local[local]                       # [..., D] (garbage if not owner)
    mine = (owner == my)[..., None].astype(rows.dtype)
    return lax.psum(rows * mine, VOCAB_AXIS)


def _scatter_delta(ids, rows, mask, vocab_shard_size, out_shape):
    """Accumulate masked row-updates into the local shard's delta buffer."""
    my = lax.axis_index(VOCAB_AXIS)
    owner = ids // vocab_shard_size
    local = jnp.where(owner == my, ids % vocab_shard_size, out_shape[0])
    m = (mask & (owner == my))[..., None].astype(rows.dtype)
    delta = jnp.zeros(out_shape, rows.dtype)
    D = out_shape[1]
    return delta.at[local.reshape(-1)].add(
        (rows * m).reshape(-1, D), mode="drop")


def _gather_rows_layout(table_local, ids, layout):
    """_gather_rows under the balanced hot layout (parallel/layout.py):
    ownership follows the piecewise hot/cold slot map instead of
    contiguous-range division.  Same collective (one psum over "vocab")."""
    my = lax.axis_index(VOCAB_AXIS)
    owner, local = layout.owner_local(ids)
    rows = table_local[local]
    mine = (owner == my)[..., None].astype(rows.dtype)
    return lax.psum(rows * mine, VOCAB_AXIS)


def _scatter_delta_layout(ids, rows, mask, layout, out_shape):
    """_scatter_delta under the balanced hot layout."""
    my = lax.axis_index(VOCAB_AXIS)
    owner, local = layout.owner_local(ids)
    local = jnp.where(owner == my, local, out_shape[0])
    m = (mask & (owner == my))[..., None].astype(rows.dtype)
    delta = jnp.zeros(out_shape, rows.dtype)
    D = out_shape[1]
    return delta.at[local.reshape(-1)].add(
        (rows * m).reshape(-1, D), mode="drop")


def sharded_minibatch_update(u_local, v_local, batch: Batch, alpha,
                             hyper: CBOWHyper, vocab_shard_size: int):
    """The cbow_minibatch_update math with vocab-sharded tables.  Runs inside
    shard_map; `batch` holds this data-shard's slice of the global batch."""
    Vs, D = u_local.shape

    # --- context stats (reference :431-449) with remote row fetch ---
    from word2bits_tpu.ops.quantize import quantize
    u_rows = _gather_rows(u_local, batch.ctx_ids, vocab_shard_size)
    q_rows = quantize(u_rows, hyper.bitlevel)
    m = batch.ctx_mask[..., None].astype(u_rows.dtype)
    csum = jnp.sum(q_rows * m, axis=1)
    cw = jnp.sum(batch.ctx_mask, axis=1).astype(u_rows.dtype)
    active = batch.valid & (cw > 0)
    context_avg = csum / jnp.maximum(cw, 1.0)[:, None]
    ctx_reg = jnp.sum(jnp.sum(q_rows * q_rows, axis=-1) * batch.ctx_mask, axis=1)

    # --- negatives (reference :450-492) ---
    from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut
    B = batch.centers.shape[0]
    targets = jnp.concatenate([batch.centers[:, None], batch.neg_ids], axis=1)
    labels = jnp.zeros(targets.shape, u_rows.dtype).at[:, 0].set(1.0)
    dmask = jnp.concatenate(
        [jnp.ones((B, 1), dtype=bool), batch.neg_ids != batch.centers[:, None]],
        axis=1) & active[:, None]

    v_rows = _gather_rows(v_local, targets, vocab_shard_size)
    q_v = quantize(v_rows, hyper.bitlevel)
    f = jnp.einsum("bd,bkd->bk", context_avg, q_v)
    g = (labels - sigmoid_lut(f)) * alpha * dmask.astype(u_rows.dtype)

    signed_f = jnp.where(labels > 0, f, -f)
    v_reg = hyper.reg * jnp.sum(q_v * q_v, axis=-1)
    loss = jnp.sum((jnp.log(sigmoid_exact(signed_f)) - v_reg)
                   * dmask.astype(u_rows.dtype))
    loss = loss - hyper.reg * jnp.sum(ctx_reg * active.astype(u_rows.dtype))

    two_ar = 2.0 * alpha * hyper.reg
    dv = g[..., None] * context_avg[:, None, :] - two_ar * v_rows * dmask[..., None]
    context_avge = jnp.einsum("bk,bkd->bd", g, q_v)
    cm = batch.ctx_mask & active[:, None]
    du = context_avge[:, None, :] - two_ar * u_rows

    # --- apply: local delta buffers summed over the data axis ---
    delta_v = _scatter_delta(targets, dv, dmask, vocab_shard_size, (Vs, D))
    delta_u = _scatter_delta(batch.ctx_ids, du, cm, vocab_shard_size, (Vs, D))
    delta_v = lax.psum(delta_v, DATA_AXIS)
    delta_u = lax.psum(delta_u, DATA_AXIS)
    loss = lax.psum(loss, DATA_AXIS)

    return u_local + delta_u, v_local + delta_v, loss


def make_sharded_train_step(hyper: CBOWHyper, mesh: Mesh, vocab_size_padded: int,
                            batch_size: int):
    """jit(shard_map(...)) one-step function over the (data, vocab) mesh.

    Takes global (replicated) batch arrays of leading dim `batch_size`
    (divisible by the data-axis size) and vocab-sharded u, v
    (`vocab_size_padded` divisible by the vocab-axis size).
    Returns (u, v, loss).
    """
    nd = mesh.shape[DATA_AXIS]
    nv = mesh.shape[VOCAB_AXIS]
    if batch_size % nd:
        raise ValueError(f"batch {batch_size} not divisible by data axis {nd}")
    if vocab_size_padded % nv:
        raise ValueError(f"vocab {vocab_size_padded} not divisible by vocab axis {nv}")
    vocab_shard_size = vocab_size_padded // nv

    def step(u_local, v_local, centers, ctx_ids, ctx_mask, neg_ids, valid, alpha):
        batch = Batch(centers=centers, ctx_ids=ctx_ids, ctx_mask=ctx_mask,
                      neg_ids=neg_ids, valid=valid)
        u_local, v_local, loss = sharded_minibatch_update(
            u_local, v_local, batch, alpha, hyper, vocab_shard_size)
        # loss already summed over data; average the vocab-axis copies
        loss = lax.psum(loss, VOCAB_AXIS) / nv
        return u_local, v_local, loss

    pspec_params = P(VOCAB_AXIS, None)
    pspec_batch = P(DATA_AXIS)
    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(pspec_params, pspec_params, pspec_batch, pspec_batch,
                  pspec_batch, pspec_batch, pspec_batch, P()),
        out_specs=(pspec_params, pspec_params, P()),
    )
    return jax.jit(mapped, donate_argnums=(0, 1))


def pad_vocab_rows(x: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the vocab dimension up to a multiple of the vocab-axis size."""
    V = x.shape[0]
    Vp = ((V + multiple - 1) // multiple) * multiple
    if Vp == V:
        return x
    return np.concatenate(
        [x, np.zeros((Vp - V,) + x.shape[1:], dtype=x.dtype)], axis=0)
