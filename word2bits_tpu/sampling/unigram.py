"""On-device unigram^0.75 negative sampling via an alias table.

The reference materializes a 10^8-entry int array where word i occupies a span
proportional to count(i)^0.75 and draws by uniform index
(reference src/word2bits.cpp:112-128, draw at :456).  That is 400 MB of HBM
and a random-gather per draw with 1e-8 probability granularity.

The TPU-native equivalent is Walker's alias method: two V-length arrays
(acceptance threshold + alias id), O(V) host-side build, O(1) per draw on
device (one uniform pair + one gather), and the count^0.75 distribution is
represented *exactly* rather than rounded to table granularity.

Reference quirks preserved at draw time (reference src/word2bits.cpp:455-458):
  * a drawn target of 0 (`</s>`) is remapped to uniform over [1, vocab_size-1]
  * a drawn target equal to the center word is *skipped* (handled by the
    training step as a mask — the effective negative count shrinks, it is not
    resampled)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class AliasTable:
    """prob[i]: P(keep i | bucket i drawn); alias[i]: the overflow word."""

    prob: jax.Array   # float32 [V]
    alias: jax.Array  # int32 [V]

    @property
    def vocab_size(self) -> int:
        return self.prob.shape[0]


def build_alias_table(weights: np.ndarray) -> AliasTable:
    """O(V) Walker alias construction from unnormalized weights."""
    w = np.asarray(weights, dtype=np.float64)
    if w.ndim != 1 or w.shape[0] == 0:
        raise ValueError("weights must be a non-empty 1D array")
    total = w.sum()
    if total <= 0:
        raise ValueError("weights must have positive sum")
    V = w.shape[0]
    scaled = w * (V / total)  # mean 1
    prob = np.ones(V, dtype=np.float64)
    alias = np.arange(V, dtype=np.int64)

    small = [i for i in range(V) if scaled[i] < 1.0]
    large = [i for i in range(V) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        if scaled[l] < 1.0:
            small.append(l)
        else:
            large.append(l)
    for i in small + large:
        prob[i] = 1.0
        alias[i] = i

    return AliasTable(prob=jnp.asarray(prob, dtype=jnp.float32),
                      alias=jnp.asarray(alias, dtype=jnp.int32))


def draw_negatives(key: jax.Array, table: AliasTable, shape,
                   vocab_size: int) -> jax.Array:
    """Draw negative-sample word ids of `shape` from the unigram^0.75
    distribution, with the reference's remap-0 quirk applied."""
    k_bucket, k_accept, k_remap = jax.random.split(key, 3)
    bucket = jax.random.randint(k_bucket, shape, 0, vocab_size, dtype=jnp.int32)
    accept = jax.random.uniform(k_accept, shape, dtype=jnp.float32)
    target = jnp.where(accept < table.prob[bucket], bucket, table.alias[bucket])
    # reference :457 — drawn 0 becomes uniform over [1, V-1]
    remap = jax.random.randint(k_remap, shape, 1, vocab_size, dtype=jnp.int32)
    return jnp.where(target == 0, remap, target)
