"""Ablation profiler for the slab training step on the live chip.

The axon backend exposes no working jax.profiler path, so component costs
are measured by differencing stripped-down chunk variants (each variant
removes one stage but keeps the data dependencies that prevent DCE).

Usage: python tools/profile_step.py [B] [G]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from word2bits_tpu.data.pipeline import build_epoch_arrays
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_slab import (
        SlabInputs, _context_masks, to_tiles, from_tiles)
    from word2bits_tpu.ops.quantize import quantize
    from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut
    from word2bits_tpu.sampling.unigram import build_alias_table, draw_negatives, AliasTable

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    S, W, K, D = 64, 8, 24, 200
    z = np.load(os.path.join(REPO, ".bench_cache/enc_4000000_70000_mc5.npz"),
                allow_pickle=True)
    encoded, counts, train_words = z["encoded"], z["counts"], int(z["train_words"])
    V = len(counts)
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K)
    table = build_alias_table(np.maximum(counts, 1) ** 0.75)
    capacity = ((len(encoded) + S * B + 8 + 1023) // 1024) * 1024
    ep = build_epoch_arrays(encoded, counts, 1e-3, train_words, W,
                            np.random.default_rng(0), capacity=capacity)
    tokens, sents = jnp.asarray(ep.tokens), jnp.asarray(ep.sent_ids)
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32))
    v0 = jnp.asarray(rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32))
    T = B // G

    def make_chunk(stage):
        def chunk(u, v, key):
            keys = jax.random.split(key, S)
            tab = AliasTable(prob=table.prob, alias=table.alias)

            def body(carry, xs):
                u, v, acc = carry
                s, k = xs
                k_neg, k_win = jax.random.split(k)
                base = ep.halo + (s % 512) * B
                slab_tokens = lax.dynamic_slice(tokens, (base - W,), (B + 2 * W,))
                slab_sents = lax.dynamic_slice(sents, (base - W,), (B + 2 * W,))
                shrink = jax.random.randint(k_win, (B,), 0, W, jnp.int32)
                negs = draw_negatives(k_neg, tab, (T, K), V)
                inputs = SlabInputs(slab_tokens, slab_sents, shrink, negs)
                if stage == "rng":
                    acc = acc + jnp.sum(negs) + jnp.sum(shrink) + jnp.sum(slab_tokens)
                    return (u, v, acc), None
                slab_ids = jnp.maximum(slab_tokens, 0)
                centers = slab_ids[W:W + B]
                u_slab = u[slab_ids]
                q_slab = quantize(u_slab, 1)
                offsets, mask, valid = _context_masks(inputs, B, W)
                mf = mask.astype(jnp.float32)
                csum = jnp.zeros((B, D), jnp.float32)
                for oi, o in enumerate(offsets):
                    csum = csum + mf[:, oi, None] * q_slab[W + o:W + o + B]
                cw = jnp.sum(mf, axis=1)
                af = (valid & (cw > 0)).astype(jnp.float32)
                cavg = csum / jnp.maximum(cw, 1.0)[:, None]
                if stage == "context":
                    acc = acc + jnp.sum(cavg)
                    return (u, v, acc), None
                v_c = v[centers]
                q_vc = quantize(v_c, 1)
                f_pos = jnp.sum(cavg * q_vc, axis=-1)
                g_pos = (1.0 - sigmoid_lut(f_pos)) * 0.025 * af
                cavge = g_pos[:, None] * q_vc
                dv_center = g_pos[:, None] * cavg
                v_n = v[negs]
                q_vn = quantize(v_n, 1)
                cavg3 = to_tiles(cavg, T, G)
                af3 = to_tiles(af, T, G)
                f_neg = lax.dot_general(cavg3, q_vn, (((2,), (2,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                centers3 = to_tiles(centers, T, G)
                skip = negs[:, None, :] != centers3[:, :, None]
                m3 = skip.astype(jnp.float32) * af3[:, :, None]
                g_neg = (0.0 - sigmoid_lut(f_neg)) * 0.025 * m3
                cavge = cavge + from_tiles(lax.dot_general(
                    g_neg, q_vn, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32), B)
                dv_neg = lax.dot_general(g_neg, cavg3, (((1,), (1,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
                if stage == "forward":
                    acc = acc + jnp.sum(cavge) + jnp.sum(dv_neg) + jnp.sum(dv_center)
                    return (u, v, acc), None
                if stage in ("vscatter", "full"):
                    v = v.at[centers].add(dv_center)
                    v = v.at[negs.reshape(-1)].add(dv_neg.reshape(-1, D))
                if stage == "vscatter":
                    acc = acc + jnp.sum(cavge)
                    return (u, v, acc), None
                mc = mf * af[:, None]
                shifted = jnp.stack(
                    [jnp.pad(mc[:, oi, None] * cavge, ((W + o, W - o), (0, 0)))
                     for oi, o in enumerate(offsets)])
                du_slab = jnp.sum(shifted, axis=0)
                if stage == "uwindow":
                    acc = acc + jnp.sum(du_slab)
                    return (u, v, acc), None
                u = u.at[slab_ids].add(du_slab)
                return (u, v, acc), None

            xs = (jnp.arange(S, dtype=jnp.int32), keys)
            (u, v, acc), _ = lax.scan(body, (u, v, jnp.float32(0)), xs)
            return u, v, acc
        return jax.jit(chunk, donate_argnums=(0, 1))

    print(f"B={B} G={G} S={S}")
    prev = None
    for stage in ("rng", "context", "forward", "vscatter", "uwindow", "full"):
        fn = make_chunk(stage)
        u, v = u0 + 0, v0 + 0
        key = jax.random.PRNGKey(0)
        u, v, acc = fn(u, v, key)
        float(acc)
        t0 = time.perf_counter()
        N = 10
        for i in range(N):
            key, sub = jax.random.split(key)
            u, v, acc = fn(u, v, sub)
        float(acc)
        us = (time.perf_counter() - t0) / N / S * 1e6
        delta = "" if prev is None else f"  (+{us - prev:.0f})"
        print(f"{stage:10s} {us:7.0f} us/step{delta}", flush=True)
        prev = us


if __name__ == "__main__":
    main()
