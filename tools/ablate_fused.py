"""In-step scatter ablation at the BENCH WINNER config (fused bf16 tables,
B=8192/G=64, banded 256) on the live chip.

Round-2 lesson: standalone scatter microbenches do NOT transfer — the
jitted-in-scan scatter runs a different (donated, in-place) codepath than a
top-level call, so per-row costs differ by orders of magnitude.  This tool
measures the step itself with the scatter term swapped:

  add          production scatter (baseline)
  dense_probe  scatter replaced by a dense slice RMW of identical row
               count/traffic (NOT update-equal; isolates XLA's per-row
               serialization cost from the HBM traffic)
  sortuniq     argsort + indices_are_sorted scatter (update-equal)

plus steps_per_chunk sweeps to split off per-dispatch latency.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_fused.py
Sync via host fetch only (CLAUDE.md).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

SECONDS = float(os.environ.get("W2B_ABLATE_SECONDS", 6.0))


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import bench
    from word2bits_tpu.data.pipeline import build_epoch_arrays
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_fused import (interleave,
                                                 make_fused_train_chunk)
    from word2bits_tpu.models.init import init_params
    from word2bits_tpu.sampling.unigram import build_alias_table

    CFG = bench.CFG
    encoded, counts, train_words = bench._prepare()
    V = len(counts)
    B, W, G = CFG["batch_size"], CFG["window"], CFG["neg_sharing"]
    D = CFG["size"]
    hyper = CBOWHyper(bitlevel=CFG["bitlevel"], size=D, window=W,
                      negative=CFG["negative"], reg=0.0)
    atab = build_alias_table(np.maximum(counts, 1) ** 0.75)
    S_max = 256
    capacity = ((len(encoded) + S_max * B + 8 + 1023) // 1024) * 1024
    ep = build_epoch_arrays(encoded, counts, CFG["sample"], train_words, W,
                            np.random.default_rng(0), capacity=capacity)
    tokens, sents = jnp.asarray(ep.tokens), jnp.asarray(ep.sent_ids)
    n_centers = max(ep.n_tokens, 1)
    words_per_step = B * train_words / n_centers
    denom = 5.0 * train_words + 1.0
    dtype = jnp.dtype(CFG["dtype"])

    variants = [
        # name, steps_per_chunk, kwargs
        ("add_S128", 128, {}),
        ("dense_probe_S128", 128, dict(scatter_impl="dense_probe")),
        ("sortuniq_S128", 128, dict(scatter_impl="sortuniq")),
        ("add_S256", 256, {}),
        ("add_S32", 32, {}),
        ("sweep_S128", 128, dict(scatter_impl="sweep",
                                 col_pad=(-2 * D) % 128)),
        ("sweep_S256", 256, dict(scatter_impl="sweep",
                                 col_pad=(-2 * D) % 128)),
        ("span_S128", 128, dict(scatter_impl="span",
                                col_pad=(-2 * D) % 128)),
        ("span_S256", 256, dict(scatter_impl="span",
                                col_pad=(-2 * D) % 128)),
        # exact per-center semantics (neg_pool=G): the 196k-row scatter is
        # this mode's 9x cost — span is the direct attack (VERDICT r2 #5)
        ("poolG_S32", 32, dict(neg_pool=G)),
        ("span_poolG_S32", 32, dict(scatter_impl="span", neg_pool=G,
                                    col_pad=(-2 * D) % 128)),
        ("span_poolG_w128_S32", 32, dict(scatter_impl="span", neg_pool=G,
                                         col_pad=(-2 * D) % 128,
                                         span_window=128)),
        ("span_poolG_w128_S64", 64, dict(scatter_impl="span", neg_pool=G,
                                         col_pad=(-2 * D) % 128,
                                         span_window=128)),
        ("uniq_probe_S128", 128, dict(scatter_impl="uniq_probe")),
        ("uniqsort_probe_S128", 128, dict(scatter_impl="uniqsort_probe")),
        # round-4 shipped config (pool2): cost split at the headline shape
        ("p2_add_S256", 256, dict(neg_pool=2)),
        ("p2_span_S256", 256, dict(scatter_impl="span", neg_pool=2,
                                   col_pad=(-2 * D) % 128)),
        ("p2_dense_probe_S256", 256, dict(scatter_impl="dense_probe",
                                          neg_pool=2)),
    ]
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    results = {}
    for name, S, kw in variants:
        if wanted and name not in wanted:
            continue
        try:
            chunk_fn = make_fused_train_chunk(
                hyper, V, B, S, neg_sharing=G, banded=256, **kw)
            u, v = init_params(V, D, init="uniform", seed=0, dtype=dtype)
            params = interleave(u, v)
            if kw.get("col_pad"):
                vmult = (512 if kw.get("scatter_impl") in ("sweep", "span")
                         else 16)
                params = jnp.pad(params, ((0, (-V) % vmult),
                                          (0, kw["col_pad"])))
            max_chunks = max(1, n_centers // (S * B))

            def scalars(ci):
                return ChunkScalars(
                    base0=jnp.int32(ep.halo + (ci % max_chunks) * S * B),
                    alpha0=jnp.float32(CFG["alpha"]),
                    wca_start=jnp.float32(0.0),
                    wca_per_step=jnp.float32(words_per_step),
                    denom=jnp.float32(denom))

            key = jax.random.PRNGKey(0)
            key, sub = jax.random.split(key)
            params, loss = chunk_fn(params, tokens, sents, atab.prob,
                                    atab.alias, scalars(0), sub)
            float(loss)  # compile + real sync (host fetch)
            t0 = time.perf_counter()
            chunks = 0
            while True:
                for _ in range(8):
                    key, sub = jax.random.split(key)
                    params, loss = chunk_fn(params, tokens, sents, atab.prob,
                                            atab.alias, scalars(chunks), sub)
                    chunks += 1
                float(loss)
                if time.perf_counter() - t0 > SECONDS:
                    break
            us = (time.perf_counter() - t0) / (chunks * S) * 1e6
            wps = words_per_step / us * 1e6
            results[name] = dict(us_per_step=round(us, 1),
                                 words_per_sec=round(wps))
            print(json.dumps({"variant": name, **results[name]}), flush=True)
            del params
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {e}"[:300], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
