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

    # C++ fast path (native/tokenizer.cpp w2b_alias_build): bit-identical
    # construction, ~1000x the pure-Python stack loop (3.7M rows: ~0.1 s
    # vs minutes — the full-Wikipedia config's startup cost)
    try:
        from word2bits_tpu import native
        if native.lib is not None:
            out = native.lib.alias_build(
                np.ascontiguousarray(scaled, np.float64))
            if out is not None:
                return AliasTable(prob=jnp.asarray(out[0], jnp.float32),
                                  alias=jnp.asarray(out[1], jnp.int32))
    except Exception:
        pass

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


# ---------------------------------------------------------------------------
# Stratified hot/cold negative sampling (extension; no reference analogue).
#
# The training step's remaining cost is the scatter of negative-row updates
# with random duplicate-heavy ids (ARCHITECTURE.md ablation).  Splitting the
# unigram^0.75 distribution at a hot-row boundary H (the vocab is
# count-sorted) and drawing a FIXED number of hot lanes per pool makes the
# hot/cold partition static: hot rows (id < H) accumulate densely on the MXU
# (ops/scatter.hot_slice_add) and the small cold remainder scatters at its
# true count — no per-step compaction or sorting.
#
# Fixing the per-pool hot-lane count kh changes the sampler from iid draws
# to stratified draws; unbiasedness of the expected negative gradient/loss
# is restored by importance weights w_hot = p_hot*K/kh and
# w_cold = (1-p_hot)*K/(K-kh) applied per lane (the step folds them into its
# negative mask).  The marginal over the pooled, weighted draws equals the
# reference's effective distribution exactly, including the remap-0 quirk
# (reference src/word2bits.cpp:455-458), which is folded into the stratum
# weights up front: the drawn-0 mass is redistributed uniformly over
# [1, V-1] BEFORE the split, so id 0 is never drawn and no remap is needed.
# ---------------------------------------------------------------------------


@dataclass
class StratifiedSampler:
    """Hot/cold split of the effective unigram^0.75 draw distribution."""

    hot: AliasTable      # over ids [0, H) (id 0 has zero mass)
    cold: AliasTable     # over ids [H, V) (stored 0-based; draw adds H)
    p_hot: float         # mass of the hot stratum under the effective dist
    hot_rows: int
    hot_probs: np.ndarray = None  # [H] effective draw probability per hot id

    def lane_split(self, negative: int):
        """(kh, w_hot, w_cold): hot lanes per pool of K and the importance
        weights.  kh is clipped so a nonzero stratum always gets >= 1 lane.
        Requires K >= 2 when both strata carry mass — with one lane the
        clamps would contradict (kh=1 > K-1=0), silently dropping the cold
        stratum and biasing the estimator."""
        K = int(negative)
        if K < 2 and 0.0 < self.p_hot < 1.0:
            raise ValueError(
                f"stratified sampling needs negative >= 2 to give each "
                f"nonzero stratum a lane, got negative={K}")
        kh = int(round(K * self.p_hot))
        if self.p_hot < 1.0:
            kh = min(kh, K - 1)
        if self.p_hot > 0.0:
            kh = max(kh, 1)
        w_hot = (self.p_hot * K / kh) if kh else 0.0
        w_cold = ((1.0 - self.p_hot) * K / (K - kh)) if K - kh else 0.0
        return kh, w_hot, w_cold

    def dense_split(self, negative: int):
        """(kc, w_cold, hot_w) for the dense-hot-negatives estimator
        (models/cbow_fused.py): the hot stratum is computed exactly with
        per-word weight hot_w[h] = K * P(draw h); kc cold lanes per pool are
        sampled with importance weight w_cold = (1-p_hot)*K/kc."""
        K = int(negative)
        if self.p_hot >= 1.0:
            raise ValueError("dense_split needs a nonempty cold stratum "
                             "(hot_rows < vocab)")
        kc = max(1, int(round(K * (1.0 - self.p_hot))))
        w_cold = (1.0 - self.p_hot) * K / kc
        return kc, w_cold, (K * self.hot_probs).astype(np.float32)


def build_stratified_tables(weights: np.ndarray,
                            hot_rows: int) -> StratifiedSampler:
    """Split the effective draw distribution at hot_rows.

    `weights` are the raw count^0.75 weights INCLUDING index 0 (`</s>`), as
    passed to build_alias_table; the reference's remap-0 quirk is applied
    here analytically (0's mass spread uniformly over [1, V-1])."""
    w = np.asarray(weights, dtype=np.float64).copy()
    V = w.shape[0]
    H = int(min(hot_rows, V))
    if H < 2:
        raise ValueError("stratified sampling needs hot_rows >= 2")
    if V > 1:
        w[1:] += w[0] / (V - 1)
    w[0] = 0.0
    total = w.sum()
    p_hot = float(w[:H].sum() / total)
    hot = build_alias_table(w[:H])
    cold = (build_alias_table(w[H:]) if H < V
            else AliasTable(prob=jnp.ones((1,), jnp.float32),
                            alias=jnp.zeros((1,), jnp.int32)))
    return StratifiedSampler(hot=hot, cold=cold, p_hot=p_hot, hot_rows=H,
                             hot_probs=(w[:H] / total))


def _alias_draw(key: jax.Array, prob: jax.Array, alias: jax.Array, shape,
                size: int) -> jax.Array:
    k_bucket, k_accept = jax.random.split(key)
    bucket = jax.random.randint(k_bucket, shape, 0, size, dtype=jnp.int32)
    accept = jax.random.uniform(k_accept, shape, dtype=jnp.float32)
    return jnp.where(accept < prob[bucket], bucket, alias[bucket])


def draw_negatives_stratified(key: jax.Array, hot: AliasTable,
                              cold: AliasTable, tiles: int, pools: int,
                              negative: int, kh: int,
                              hot_rows: int) -> jax.Array:
    """[tiles, pools*negative] ids; within each pool of `negative` lanes the
    first kh are hot draws (id < hot_rows), the rest cold (id >= hot_rows)."""
    T, P, K = tiles, pools, negative
    k_hot, k_cold = jax.random.split(key)
    parts = []
    if kh:
        parts.append(_alias_draw(k_hot, hot.prob, hot.alias, (T, P, kh),
                                 hot.prob.shape[0]))
    if K - kh:
        parts.append(hot_rows + _alias_draw(k_cold, cold.prob, cold.alias,
                                            (T, P, K - kh),
                                            cold.prob.shape[0]))
    return jnp.concatenate(parts, axis=2).reshape(T, P * K)
