"""Decompose the SHIPPED bench config's scatter-free floor (VERDICT r4
item 3) by cumulative-stage differencing on the live chip.

The round-4 ablation (tools/ablate_fused.py) established: XLA scatter
1202 us/step -> span 821 us -> dense-probe floor 533 us.  The 533 us of
gathers + scoring matmuls + banded sums is the remaining attack surface;
this tool splits it at the EXACT shipped shape (bf16 fused (V,2D) table,
B=8192/G=64, pool2, banded 256, S=256 scan chunks) so the next kernel
targets the dominant term instead of a guess.

Stages (cumulative; each keeps data deps that prevent DCE):
  rng       slab slices + negative draws + shrink
  gather    fused-table slab gather + quantize
  context   banded context sums (csum/cw/cavg)
  pos       center-v score + positive grads
  negs      negative gather + quantize + the 3 scoring dot_generals
  uwin      banded per-position u sums
  full      + the dense-probe slice RMW (equal-traffic scatter stand-in)

Usage: python tools/floor_ablate.py [--b B] [--g G] [--pool P] [--s S]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    import bench
    from word2bits_tpu.data.pipeline import build_epoch_arrays
    from word2bits_tpu.models.cbow import ChunkScalars  # noqa: F401
    from word2bits_tpu.models.cbow_slab import (SlabInputs, from_tiles,
                                                pool_mask, to_tiles)
    from word2bits_tpu.ops.quantize import quantize
    from word2bits_tpu.ops.sigmoid import sigmoid_exact, sigmoid_lut
    from word2bits_tpu.ops.windowed import (banded_context,
                                            banded_usum,
                                            build_banded_masks, pick_tile)
    from word2bits_tpu.sampling.unigram import (AliasTable,
                                                build_alias_table,
                                                draw_negatives)

    def argval(flag, default):
        return (int(sys.argv[sys.argv.index(flag) + 1])
                if flag in sys.argv else default)

    CFG = bench.CFG
    B = argval("--b", CFG["batch_size"])
    G = argval("--g", CFG["neg_sharing"])
    P = argval("--pool", CFG["neg_pool"])
    S = argval("--s", 256)
    W, K = CFG["window"], CFG["negative"]
    D = argval("--d", CFG["size"])   # --d 256: the lane-alignment probe
    banded = argval("--banded", 256)
    dtype = jnp.dtype(CFG["dtype"])
    encoded, counts, train_words = bench._prepare()
    V = len(counts)
    T = B // G
    atab = build_alias_table(np.maximum(counts, 1) ** 0.75)
    capacity = ((len(encoded) + S * B + 8 + 1023) // 1024) * 1024
    ep = build_epoch_arrays(encoded, counts, CFG["sample"], train_words, W,
                            np.random.default_rng(0), capacity=capacity)
    tokens, sents = jnp.asarray(ep.tokens), jnp.asarray(ep.sent_ids)
    rng = np.random.default_rng(0)
    tbl0 = jnp.asarray(
        rng.uniform(-0.5, 0.5, (V, 2 * D)).astype(np.float32), dtype=dtype)
    alpha = jnp.float32(CFG["alpha"])
    dt = jnp.float32

    def make_chunk(stage):
        def chunk(table, key):
            keys = jax.random.split(key, S)
            tab = AliasTable(prob=atab.prob, alias=atab.alias)

            def body(carry, xs):
                table, acc = carry
                s, k = xs
                k_neg, k_win = jax.random.split(k)
                base = ep.halo + (s % 256) * B
                slab_tokens = lax.dynamic_slice(tokens, (base - W,),
                                                (B + 2 * W,))
                slab_sents = lax.dynamic_slice(sents, (base - W,),
                                               (B + 2 * W,))
                shrink = jax.random.randint(k_win, (B,), 0, W, jnp.int32)
                negs = draw_negatives(k_neg, tab, (T, P * K), V)
                if stage == "rng":
                    return (table, acc + jnp.sum(negs) + jnp.sum(shrink)
                            + jnp.sum(slab_tokens)), None
                inputs = SlabInputs(slab_tokens, slab_sents, shrink, negs)
                slab_ids = jnp.maximum(slab_tokens, 0)
                centers = slab_ids[W:W + B]
                slab_rows = table[slab_ids].astype(dt)
                u_slab = slab_rows[:, :D]
                v_c = slab_rows[W:W + B, D:2 * D]
                q_slab = quantize(u_slab, CFG["bitlevel"])
                if stage == "gather":
                    return (table, acc + jnp.sum(q_slab) + jnp.sum(v_c)), None
                btile = pick_tile(B, W, banded)
                Mb, win_idx, valid = build_banded_masks(
                    inputs.slab_sents, inputs.shrink, B, W, btile)
                csum, sq_sum, cw = banded_context(q_slab, None, Mb,
                                                  win_idx, B)
                active = valid & (cw > 0)
                af = active.astype(dt)
                cavg = csum / jnp.maximum(cw, 1.0)[:, None]
                if stage == "context":
                    return (table, acc + jnp.sum(cavg)), None
                q_vc = quantize(v_c, CFG["bitlevel"])
                f_pos = jnp.sum(cavg * q_vc, axis=-1)
                g_pos = (1.0 - sigmoid_lut(f_pos)) * alpha * af
                cavge = g_pos[:, None] * q_vc
                dv_center = g_pos[:, None] * cavg
                if stage == "pos":
                    return (table, acc + jnp.sum(cavge)
                            + jnp.sum(dv_center)), None
                v_n = table[negs][..., D:2 * D].astype(dt)
                q_vn = quantize(v_n, CFG["bitlevel"])
                cavg3 = to_tiles(cavg, T, G)
                af3 = to_tiles(af, T, G)
                centers3 = to_tiles(centers, T, G)
                f_neg = lax.dot_general(cavg3, q_vn,
                                        (((2,), (2,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                skip = negs[:, None, :] != centers3[:, :, None]
                m3 = skip.astype(dt) * af3[:, :, None]
                if P > 1:
                    m3 = m3 * pool_mask(G, negs.shape[1] // P, P,
                                        dt)[None]
                g_neg = (0.0 - sigmoid_lut(f_neg)) * alpha * m3
                cavge = cavge + from_tiles(lax.dot_general(
                    g_neg, q_vn, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32), B)
                dv_neg = lax.dot_general(g_neg, cavg3,
                                         (((1,), (1,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
                if stage == "negs":
                    return (table, acc + jnp.sum(cavge)
                            + jnp.sum(dv_neg)), None
                M_af = Mb * af.reshape(Mb.shape[0], Mb.shape[1])[:, :, None]
                du_slab, cnt = banded_usum(M_af, cavge, B, W)
                if stage == "uwin":
                    return (table, acc + jnp.sum(du_slab)
                            + jnp.sum(dv_neg) + jnp.sum(dv_center)), None
                # dense-probe stand-in for both scatters: identical row
                # count/traffic, no serialized loop (NOT update-equal)
                dv_slab = jnp.zeros((B + 2 * W, D), dt)
                dv_slab = lax.dynamic_update_slice(dv_slab, dv_center,
                                                   (W, 0))
                fused_rows = jnp.concatenate([du_slab, dv_slab], axis=1)
                n1 = fused_rows.shape[0]
                head = (table[:n1].astype(dt) + fused_rows
                        + 0.0 * slab_ids[:1].astype(dt)).astype(table.dtype)
                table = lax.dynamic_update_slice(table, head, (0, 0))
                nr = dv_neg.reshape(-1, D)
                n2 = nr.shape[0]
                head2 = (table[:n2, D:].astype(dt) + nr
                         + 0.0 * negs.reshape(-1)[:1].astype(dt)
                         ).astype(table.dtype)
                table = lax.dynamic_update_slice(table, head2, (0, D))
                return (table, acc), None

            xs = (jnp.arange(S, dtype=jnp.int32), keys)
            (table, acc), _ = lax.scan(body, (table, jnp.float32(0)), xs)
            return table, acc
        return jax.jit(chunk, donate_argnums=(0,))

    print(f"B={B} G={G} P={P} S={S} banded={banded} dtype={dtype.name}")
    prev = None
    stages = [a for a in sys.argv[1:] if not a.startswith("--")
              and not a.isdigit()] or ["rng", "gather", "context", "pos",
                                       "negs", "uwin", "full"]
    for stage in stages:
        fn = make_chunk(stage)
        table = tbl0 + 0
        key = jax.random.PRNGKey(0)
        table, acc = fn(table, key)
        float(acc)
        t0 = time.perf_counter()
        N = 6
        for _ in range(N):
            key, sub = jax.random.split(key)
            table, acc = fn(table, sub)
        float(acc)
        us = (time.perf_counter() - t0) / N / S * 1e6
        delta = "" if prev is None else f"  (+{us - prev:.0f})"
        print(f"{stage:10s} {us:7.1f} us/step{delta}", flush=True)
        prev = us
        del table


if __name__ == "__main__":
    main()
