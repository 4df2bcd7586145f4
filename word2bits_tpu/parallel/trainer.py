"""Sharded training driver: the train.py loop over a (data, vocab) mesh.

Both the single-chip and multi-chip paths now scan S steps per jit call:
single-chip via models/cbow_slab.make_slab_train_chunk, multi-chip via
parallel/chunk.make_sharded_chunk wrapping the shard_map step bodies
(parallel/sharded_slab.py, parallel/sharded_skipgram.py).  Negatives and
window shrinks are drawn on device inside the chunk and the loss is fetched
once per chunk, so dispatch latency (~10s of ms through the axon tunnel)
amortizes over S steps instead of gating every step.

Used by train.train() when cfg.mesh_shape is set — e.g.
{"data": 2, "vocab": 4} — and by the driver's dryrun.  On one host this
exercises the full collective graph over however many local devices exist
(8 virtual CPU devices in tests); on a multi-host slice
parallel/multihost.initialize() extends the same mesh over every process's
chips.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.parallel.chunk import make_sharded_chunk
from word2bits_tpu.parallel.mesh import VOCAB_AXIS, make_mesh
from word2bits_tpu.parallel.sharded import pad_vocab_rows, shard_params
from word2bits_tpu.parallel.sharded_skipgram import _sharded_skipgram_body
from word2bits_tpu.parallel.sharded_slab import _sharded_slab_body


class ShardedTrainer:
    """Owns mesh, sharded params, and the chunked step driver."""

    def __init__(self, cfg: Word2BitsConfig, vocab_size: int, u, v,
                 dense_hot=None):
        self.cfg = cfg
        self.mesh = make_mesh(cfg.mesh_shape)
        self.nv = self.mesh.shape[VOCAB_AXIS]
        self.V = vocab_size
        hyper = CBOWHyper(bitlevel=cfg.bitlevel, size=cfg.size,
                          window=cfg.window, negative=cfg.negative,
                          reg=cfg.reg)
        up = pad_vocab_rows(np.asarray(u), self.nv)
        vp = pad_vocab_rows(np.asarray(v), self.nv)
        body = (_sharded_skipgram_body if cfg.model == "skipgram"
                else _sharded_slab_body)
        # balanced hot layout: interleave the dense-hot head across the
        # vocab shards so its MXU contraction is H/nv per shard instead of
        # a redundant H on every shard (parallel/layout.py)
        self.layout = None
        if (dense_hot is not None and cfg.hot_interleave and self.nv > 1
                and -(-cfg.hot_rows // self.nv) * self.nv < up.shape[0]):
            from word2bits_tpu.parallel.layout import make_hot_layout
            self.layout = make_hot_layout(up.shape[0], self.nv, cfg.hot_rows)
        self.col_pad = 0
        if cfg.rmw_scatter:
            # per-shard in-place Pallas RMW needs the shard row count
            # aligned to the dtype's sublane group (kernels/scatter_pallas.
            # group_rows); bump the row padding to nv * group multiples
            from word2bits_tpu.kernels.scatter_pallas import group_rows
            mult = self.nv * group_rows(up.dtype)
            up = pad_vocab_rows(up, mult)
            vp = pad_vocab_rows(vp, mult)
        elif cfg.scatter_impl == "span":
            # per-shard spanning sweep storage (kernels/span_scatter.py):
            # shard rows to the sweep window, columns to the 128-lane tile.
            # Padding stays zero (gathers slice the live D columns, scatter
            # rows re-pad with zeros) and params() trims it off.
            up = pad_vocab_rows(up, self.nv * cfg.span_window)
            vp = pad_vocab_rows(vp, self.nv * cfg.span_window)
            self.col_pad = (-cfg.size) % 128
            if self.col_pad:
                padw = ((0, 0), (0, self.col_pad))
                up, vp = np.pad(up, padw), np.pad(vp, padw)
        self.chunk_fn = make_sharded_chunk(
            body, hyper, self.mesh, up.shape[0], vocab_size,
            cfg.batch_size, cfg.steps_per_chunk,
            neg_sharing=cfg.neg_sharing, neg_pool=cfg.neg_pool,
            dense_hot=dense_hot, hot_rows=cfg.hot_rows,
            hot_layout=self.layout, banded=cfg.banded_tile,
            rmw=cfg.rmw_scatter, scatter_impl=cfg.scatter_impl,
            span_window=cfg.span_window, span_chunk=cfg.span_chunk)
        if self.layout is not None:
            from word2bits_tpu.parallel.layout import to_layout
            up, vp = to_layout(up, self.layout), to_layout(vp, self.layout)
        self.u, self.v = shard_params(jnp.asarray(up), jnp.asarray(vp),
                                      self.mesh)

    def run_chunk(self, tokens_dev, sents_dev, alias_prob, alias_alias,
                  scalars, key) -> jax.Array:
        """One S-step sharded chunk; returns the chunk's loss sum (device)."""
        self.u, self.v, loss = self.chunk_fn(
            self.u, self.v, tokens_dev, sents_dev, alias_prob, alias_alias,
            scalars, key)
        return loss

    def params(self) -> Tuple[np.ndarray, np.ndarray]:
        """Unsharded, unpadded parameter copies (layout undone)."""
        u, v = np.asarray(self.u), np.asarray(self.v)
        if self.layout is not None:
            from word2bits_tpu.parallel.layout import from_layout
            u, v = from_layout(u, self.layout), from_layout(v, self.layout)
        if self.col_pad:
            u, v = u[:, :-self.col_pad], v[:, :-self.col_pad]
        return (u[:self.V], v[:self.V])
