"""Sharded scan-chunk factory: S synchronous sharded steps per jit call.

The multi-chip analog of models/cbow_slab.make_slab_train_chunk, and the
TPU-native equivalent of the reference's epoch worker loop
(reference src/word2bits.cpp:521-536): one dispatch covers S steps of the
(data, vocab)-sharded update with on-device negative/shrink randomness and
the on-device linear LR schedule, so the host never syncs inside a chunk.
Dispatch latency through the axon tunnel is ~10s of ms — a per-step host
loop caps multi-chip throughput at ~100 steps/sec regardless of chip count,
which is why this chunk exists (round-1 verdict item 3).

Randomness is drawn inside shard_map from the replicated key with exactly
the same split structure as the single-chip chunk (split(key, S); per step
split into k_neg, k_win), so a sharded chunk and a single-chip chunk given
the same key consume identical negatives/shrinks — the basis of the
sharded-chunk == single-chip-chunk equivalence tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.parallel.mesh import DATA_AXIS, VOCAB_AXIS
from word2bits_tpu.sampling.unigram import AliasTable, draw_negatives


def make_sharded_chunk(body_fn, hyper: CBOWHyper, mesh: Mesh,
                       vocab_size_padded: int, vocab_size: int,
                       batch_size: int, steps: int, neg_sharing: int = 0,
                       neg_pool: int = 1, donate: bool = True,
                       dense_hot=None, hot_rows: int = 0, hot_layout=None,
                       banded: int = 0, rmw: bool = False,
                       scatter_impl: str = "add", span_window: int = 512,
                       span_chunk: int = 128):
    """jit(shard_map) chunk running `steps` sharded minibatch steps.

    `body_fn` is one of the per-step sharded bodies
    (parallel/sharded_slab._sharded_slab_body or
    parallel/sharded_skipgram._sharded_skipgram_body), called inside the
    scan with (u_local, v_local, slab_tokens, slab_sents, shrink, negs,
    alpha, hyper, batch_size, neg_sharing, vocab_shard_size).

    Chunk signature matches make_slab_train_chunk:
      chunk(u_local, v_local, tokens, sent_ids, alias_prob, alias_alias,
            scalars, key) -> (u_local, v_local, loss_sum)
    with tokens/sent_ids/alias/scalars/key replicated and u, v sharded
    P("vocab", None).  `vocab_size` (true, unpadded) bounds negative draws;
    `vocab_size_padded` defines the shard layout.

    dense_hot = (kc, w_cold, hot_w[H]) with hot_rows = H enables exact
    hot-stratum negatives (sharded_slab dense_hot): alias_prob/alias_alias
    must then be the COLD stratum's arrays and kc cold lanes are drawn per
    pool at offset H (same key structure as the fused single-chip chunk).

    hot_layout (parallel/layout.HotLayout): u/v must be placed in the
    balanced hot layout (layout.to_layout before shard_params); hot_w is
    zero-padded to layout.hot_pad here.  Each shard then runs its own
    [., H/nv] dense hot sub-range instead of a redundant [., H].
    """
    nd = mesh.shape[DATA_AXIS]
    nv = mesh.shape[VOCAB_AXIS]
    B, W, K = batch_size, hyper.window, hyper.negative
    if batch_size % nd:
        raise ValueError(f"batch {batch_size} not divisible by data axis {nd}")
    if neg_sharing:
        if batch_size % neg_sharing:
            raise ValueError("batch must be divisible by neg_sharing")
        if neg_sharing % nd:
            raise ValueError(
                f"neg_sharing tile ({neg_sharing}) must be divisible by the "
                f"data-axis size ({nd}) so every shard holds whole tile slices")
    if vocab_size_padded % nv:
        raise ValueError(f"vocab {vocab_size_padded} not divisible by {nv}")
    vss = vocab_size_padded // nv
    pools = neg_pool if (neg_sharing and neg_pool and neg_pool > 1) else 1
    neg_rows = (batch_size // neg_sharing) if neg_sharing else batch_size

    def chunk(u_local, v_local, tokens, sent_ids, alias_prob, alias_alias,
              scalars, key):
        table = AliasTable(prob=alias_prob, alias=alias_alias)
        keys = jax.random.split(key, steps)

        def body(carry, xs):
            u_local, v_local, loss = carry
            s, k = xs
            k_neg, k_win = jax.random.split(k)
            base = scalars.base0 + s * B
            wca = scalars.wca_start + s.astype(jnp.float32) * scalars.wca_per_step
            alpha = scalars.alpha0 * (1.0 - wca / scalars.denom)
            alpha = jnp.maximum(alpha, scalars.alpha0 * 1e-4)
            slab_tokens = lax.dynamic_slice(tokens, (base - W,), (B + 2 * W,))
            slab_sents = lax.dynamic_slice(sent_ids, (base - W,), (B + 2 * W,))
            shrink = jax.random.randint(k_win, (B,), 0, W, dtype=jnp.int32)
            body_kw = {}
            if banded:
                # banded windowed sums (cbow slab body only; config gates it)
                body_kw["banded"] = banded
            if rmw:
                # in-place per-shard Pallas RMW scatter (cbow slab body
                # only; config gates it) — pair with steps=1 for the 1x-HBM
                # capacity benefit, since the scan path double-buffers the
                # carried tables
                body_kw["rmw"] = True
            if scatter_impl != "add":
                # per-shard spanning sweep scatter with local ids (cbow
                # slab body only; config gates it) — VERDICT r3 item 5
                body_kw["scatter_impl"] = scatter_impl
                body_kw["span_window"] = span_window
                body_kw["span_chunk"] = span_chunk
            if dense_hot is not None:
                from word2bits_tpu.sampling.unigram import _alias_draw
                negs = hot_rows + _alias_draw(
                    k_neg, table.prob, table.alias,
                    (neg_rows, pools * dense_hot[0]), table.prob.shape[0])
                hot_w = dense_hot[2]
                if hot_layout is not None:
                    from word2bits_tpu.parallel.layout import pad_hot_weights
                    hot_w = pad_hot_weights(hot_w, hot_layout)
                    body_kw["hot_layout"] = hot_layout
                body_kw["dense_hot"] = (dense_hot[1], hot_w)
            else:
                negs = draw_negatives(k_neg, table, (neg_rows, pools * K),
                                      vocab_size)
            u_local, v_local, step_loss = body_fn(
                u_local, v_local, slab_tokens, slab_sents, shrink, negs,
                alpha, hyper, batch_size, neg_sharing, vss, neg_pool=pools,
                **body_kw)
            return (u_local, v_local, loss + step_loss), None

        if steps == 1:
            # no-scan path: lax.scan double-buffers big carried tables
            # (~2x peak HBM per shard); a direct call keeps the donated
            # shard aliased in place — the mesh capacity configuration
            # (pair with -rmw-scatter, which needs it to stay 1x)
            (u_local, v_local, loss), _ = body(
                (u_local, v_local, jnp.float32(0.0)),
                (jnp.int32(0), keys[0]))
        else:
            xs = (jnp.arange(steps, dtype=jnp.int32), keys)
            (u_local, v_local, loss), _ = lax.scan(
                body, (u_local, v_local, jnp.float32(0.0)), xs)
        # per-step losses are already psum'd over "data" inside body_fn and
        # are identical across vocab shards; the psum/nv proves replication
        loss = lax.psum(loss, VOCAB_AXIS) / nv
        return u_local, v_local, loss

    pp = P(VOCAB_AXIS, None)
    rep = P()
    # check_vma=False: the rmw/span bodies' pallas_call cannot declare its
    # varying-mesh-axes type (jax.ShapeDtypeStruct has no axis context in
    # the kernel wrapper); the kernel==plain equality tests are the checker
    mapped = jax.shard_map(
        chunk, mesh=mesh,
        in_specs=(pp, pp, rep, rep, rep, rep, rep, rep),
        out_specs=(pp, pp, rep),
        check_vma=not (rmw or scatter_impl != "add"),
    )
    donate_argnums = (0, 1) if donate else ()
    return jax.jit(mapped, donate_argnums=donate_argnums)
