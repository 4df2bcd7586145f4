"""Sharded training driver: the train.py loop over a (data, vocab) mesh.

Single-chip training scans S steps per jit call (models/cbow_slab.py); the
sharded path instead runs the shard_map step (parallel/sharded_slab.py) per
minibatch with host-side chunking of the randomness.  Used by train.train()
when cfg.mesh_shape is set — e.g. {"data": 2, "vocab": 4} — and by the
driver's dryrun.  On one host this exercises the full collective graph over
however many local devices exist (8 virtual CPU devices in tests); on a
multi-host slice parallel/multihost.initialize() extends the same mesh over
every process's chips.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.models.cbow_slab import SlabInputs
from word2bits_tpu.parallel.mesh import VOCAB_AXIS, make_mesh
from word2bits_tpu.parallel.sharded import pad_vocab_rows, shard_params
from word2bits_tpu.parallel.sharded_skipgram import make_sharded_skipgram_step
from word2bits_tpu.parallel.sharded_slab import make_sharded_slab_step
from word2bits_tpu.sampling.unigram import AliasTable, draw_negatives


class ShardedTrainer:
    """Owns mesh, sharded params, and the per-step driver."""

    def __init__(self, cfg: Word2BitsConfig, vocab_size: int, u, v):
        self.cfg = cfg
        self.mesh = make_mesh(cfg.mesh_shape)
        self.nv = self.mesh.shape[VOCAB_AXIS]
        self.V = vocab_size
        hyper = CBOWHyper(bitlevel=cfg.bitlevel, size=cfg.size,
                          window=cfg.window, negative=cfg.negative,
                          reg=cfg.reg)
        up = pad_vocab_rows(np.asarray(u), self.nv)
        vp = pad_vocab_rows(np.asarray(v), self.nv)
        mk = (make_sharded_skipgram_step if cfg.model == "skipgram"
              else make_sharded_slab_step)
        self.step_fn = mk(hyper, self.mesh, up.shape[0], cfg.batch_size,
                          neg_sharing=cfg.neg_sharing)
        self.u, self.v = shard_params(jnp.asarray(up), jnp.asarray(vp),
                                      self.mesh)
        self.W = cfg.window
        self.B = cfg.batch_size
        self.K = cfg.negative
        self.neg_rows = (cfg.batch_size // cfg.neg_sharing
                         if cfg.neg_sharing else cfg.batch_size)

    def run_steps(self, tokens: np.ndarray, sent_ids: np.ndarray, halo: int,
                  n_steps: int, key, alphas) -> Tuple[jax.Array, float]:
        """Run n_steps minibatches over host arrays. Returns (key, loss)."""
        B, W = self.B, self.W
        total = 0.0
        table = self._table
        for s in range(n_steps):
            key, k_neg, k_win = jax.random.split(key, 3)
            base = halo + s * B
            slab_t = jnp.asarray(tokens[base - W: base + B + W])
            slab_s = jnp.asarray(sent_ids[base - W: base + B + W])
            shrink = jax.random.randint(k_win, (B,), 0, W, jnp.int32)
            negs = draw_negatives(k_neg, table, (self.neg_rows, self.K),
                                  self.V)
            self.u, self.v, loss = self.step_fn(
                self.u, self.v, slab_t, slab_s, shrink, negs,
                jnp.float32(alphas[s]))
            total += float(loss)
        return key, total

    def set_table(self, alias_table: AliasTable):
        self._table = alias_table

    def params(self) -> Tuple[np.ndarray, np.ndarray]:
        """Unsharded, unpadded parameter copies."""
        return (np.asarray(self.u)[:self.V], np.asarray(self.v)[:self.V])
