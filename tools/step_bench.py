"""Time training-chunk variants on the real chip in ONE process.

Decides the round's perf questions with measurements:
  * does -dedup-block beat XLA's serialized scatter (fused bench config,
    and the per-center exact mode where duplicate rows are 5x heavier)?
  * does -use-pallas (fused score kernel) win at the bench config?

Variants (select by name on argv; default all):
  fused           bench-config baseline (bf16 fused tables, B=8192/G=64)
  fused-dedup512 / -dedup1024 / -dedup2048
  fused-pallas
  percenter       exact-reference-semantics mode (neg_sharing=0, B=2048)
  percenter-dedup1024 / -dedup2048

Sync via host fetch only (CLAUDE.md: block_until_ready lies on axon).
Prints one JSON line per variant: {"variant":..., "us_per_step":...,
"words_per_sec":...}.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuses _prepare + CFG)

SECONDS = 8.0


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from word2bits_tpu.data.pipeline import build_epoch_arrays
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_fused import (interleave,
                                                 make_fused_train_chunk)
    from word2bits_tpu.models.cbow_slab import make_slab_train_chunk
    from word2bits_tpu.models.init import init_params
    from word2bits_tpu.sampling.unigram import build_alias_table

    CFG = bench.CFG
    encoded, counts, train_words = bench._prepare()
    V = len(counts)
    W = CFG["window"]
    hyper = CBOWHyper(bitlevel=CFG["bitlevel"], size=CFG["size"], window=W,
                      negative=CFG["negative"], reg=0.0)
    dtype = jnp.dtype(CFG["dtype"])
    u0, v0 = init_params(V, CFG["size"], init="uniform", seed=0, dtype=dtype)
    atab = build_alias_table(np.maximum(counts, 1) ** 0.75)

    S = CFG["steps_per_chunk"]
    capacity = ((len(encoded) + S * max(CFG["batch_size"], 2048) + 8 + 1023)
                // 1024) * 1024
    ep = build_epoch_arrays(encoded, counts, CFG["sample"], train_words, W,
                            np.random.default_rng(0), capacity=capacity)
    tokens = jnp.asarray(ep.tokens)
    sents = jnp.asarray(ep.sent_ids)
    n_centers = max(ep.n_tokens, 1)
    denom = 5.0 * train_words + 1.0

    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]

    def variants():
        # items: (name, B, chunk_kwargs, family[, steps_per_chunk])
        B, G = CFG["batch_size"], CFG["neg_sharing"]
        yield "fused", B, dict(neg_sharing=G), "fused"
        # dispatch amortization: the axon tunnel's per-dispatch latency is
        # ~10s of ms (CLAUDE.md); if it is a visible fraction of the chunk,
        # larger S wins directly
        for Sv in (64, 128):
            yield f"fused-S{Sv}", B, dict(neg_sharing=G), "fused", Sv
        for M in (512, 1024, 2048):
            yield (f"fused-dedup{M}", B,
                   dict(neg_sharing=G, dedup_block=M), "fused")
        yield "fused-pallas", B, dict(neg_sharing=G, use_pallas=True), "fused"
        for H in (1024, 4096, 16384):
            yield (f"fused-hot{H}", B,
                   dict(neg_sharing=G, hot_rows=H), "fused")
        for H in (1024, 4096):
            yield (f"fused-strat{H}", B,
                   dict(neg_sharing=G, hot_rows=H, stratify=True), "fused")
        for H in (1024, 4096):
            yield (f"fused-dense{H}", B,
                   dict(neg_sharing=G, hot_rows=H, densehot=True), "fused")
        for H in (4096, 16384):
            yield (f"fused-hotpl{H}", B,
                   dict(neg_sharing=G, hot_rows=H, hot_pallas=True), "fused")
        yield ("fused-dense4096-pl", B,
               dict(neg_sharing=G, hot_rows=4096, densehot=True,
                    hot_pallas=True), "fused")
        # exact per-center NEGATIVE semantics at full tile shapes: P=G pools
        # per tile (cbow_slab.pool_mask; proven == per-center draws) — the
        # throughput answer for "exact semantics costs 10x" (VERDICT r1 #8)
        yield ("fused-poolG", B, dict(neg_sharing=G, neg_pool=G), "fused")
        yield ("fused-poolG-dense4096", B,
               dict(neg_sharing=G, neg_pool=G, hot_rows=4096, densehot=True),
               "fused")
        # exact per-center semantics + the spanning sweep scatter (VERDICT
        # r2 item 5): poolG's (B/G)*P*K = B*K v-update rows are what makes
        # the exact path XLA-scatter-bound (~50 ns/row serialized); span
        # replaces the loop with one sorted MXU placement sweep whose plan
        # hoists out of the scan chunk (kernels/span_scatter.py)
        for Sv in (64, 128):
            yield (f"fused-poolG-span-S{Sv}", B,
                   dict(neg_sharing=G, neg_pool=G, scatter_impl="span"),
                   "fused", Sv)
        # sorted group-RMW scatter at the bench shape (round 5,
        # kernels/group_rmw.py): dup-heavy zipf ids dedup to few 16-row
        # groups, so the visit traffic can undercut span's window sweep
        for Sv in (128, 256):
            yield (f"fused-grmw-S{Sv}", B,
                   dict(neg_sharing=G, scatter_impl="grmw"), "fused", Sv)
        yield ("p2-grmw-banded256-S256", B,
               dict(neg_sharing=G, neg_pool=2, scatter_impl="grmw",
                    banded=256), "fused", 256)
        # score_pallas composed with the round-4/5 winners: the fused
        # negative-phase kernel lost 4% against the S=16 un-banded baseline
        # (r2); with span+banded the phase is a bigger share — re-adjudicate
        yield ("p2-pallas-span-banded256-S256", B,
               dict(neg_sharing=G, neg_pool=2, use_pallas=True,
                    scatter_impl="span", banded=256), "fused", 256)
        yield ("p2-span-banded256-S256", B,
               dict(neg_sharing=G, neg_pool=2, scatter_impl="span",
                    banded=256), "fused", 256)
        # round-5 fused context+positive kernel (kernels/context_pallas.py)
        # composed with the shipped winner
        yield ("p2-ctx-span-banded256-S256", B,
               dict(neg_sharing=G, neg_pool=2, scatter_impl="span",
                    banded=256, context_pallas=True), "fused", 256)
        yield ("p2-ctx-span-banded256-S128", B,
               dict(neg_sharing=G, neg_pool=2, scatter_impl="span",
                    banded=256, context_pallas=True), "fused", 128)
        yield ("p2B16384-ctx-span-banded256-S128", 16384,
               dict(neg_sharing=G, neg_pool=2, scatter_impl="span",
                    banded=256, context_pallas=True), "fused", 128)
        yield ("p1-ctx-span-banded256-S256", B,
               dict(neg_sharing=G, scatter_impl="span",
                    banded=256, context_pallas=True), "fused", 256)
        yield ("p2-ctx-span-banded256-S512", B,
               dict(neg_sharing=G, neg_pool=2, scatter_impl="span",
                    banded=256, context_pallas=True), "fused", 512)
        # same SHARING DEGREE (G/P = 32 centers per negative set — the
        # quality-relevant quantity behind the shipped pool2@G=64 row) at
        # MXU-filling tile sizes: G=128/P=4 and G=256/P=8 double/quadruple
        # the scoring matmuls' M dim (64 rows underfill the 128-row MXU)
        yield ("p4-G128-span-banded256-S256", B,
               dict(neg_sharing=128, neg_pool=4, scatter_impl="span",
                    banded=256), "fused", 256)
        yield ("p8-G256-span-banded256-S256", B,
               dict(neg_sharing=256, neg_pool=8, scatter_impl="span",
                    banded=256), "fused", 256)
        # banded windowed sums: context + u sums as banded MXU matmuls
        # (ops/windowed.py) vs the 2W-shift VPU formulation
        for bt in (128, 256):
            yield (f"fused-banded{bt}", B,
                   dict(neg_sharing=G, banded=bt), "fused")
        yield ("fused-dense4096-banded128", B,
               dict(neg_sharing=G, hot_rows=4096, densehot=True, banded=128),
               "fused")
        Bp = 2048
        yield "percenter", Bp, dict(neg_sharing=0), "slab"
        for M in (1024, 2048):
            yield (f"percenter-dedup{M}", Bp,
                   dict(neg_sharing=0, dedup_block=M), "slab")
        # scan-chunk amortization on the exact path (the fused S-lever)
        for Sv in (64, 128):
            yield f"percenter-S{Sv}", Bp, dict(neg_sharing=0), "slab", Sv
        # exact per-center mode + spanning sweep on BOTH slab scatters
        # (u: B+2W rows, v: B*(K+1) rows — the dominant serialized cost)
        for Sv in (64, 128):
            yield (f"percenter-span-S{Sv}", Bp,
                   dict(neg_sharing=0, scatter_impl="span"), "slab", Sv)
        # round-4 pushes on the exact path (VERDICT r3 item 4: target >=3M):
        # span removed the scatter loop (1.04M -> 1.54M on-chip); the
        # remaining levers are the windowed VPU shifts (banded MXU sums)
        # and batch size (B amortizes the per-step XLA fixed costs and
        # span's per-window DMA over more rows)
        for bt in (128, 256):
            yield (f"percenter-span-S64-banded{bt}", Bp,
                   dict(neg_sharing=0, scatter_impl="span", banded=bt),
                   "slab", 64)
        for Bv in (4096, 8192):
            yield (f"percenter{Bv}-span-S64", Bv,
                   dict(neg_sharing=0, scatter_impl="span"), "slab", 64)
        yield ("percenter8192-span-S64-banded256", 8192,
               dict(neg_sharing=0, scatter_impl="span", banded=256),
               "slab", 64)
        yield ("percenter8192-S64", 8192, dict(neg_sharing=0), "slab", 64)
        # round-5 rank-1 span apply (VERDICT r4 item 2): with reg == 0 the
        # per-center spanning path forms dv_neg rows inside the permute
        # (scatter_add_span_rank1) — the percenter*-span variants above
        # now measure it automatically; these extend the B/S grid
        for Sv in (128, 256):
            yield (f"percenter4096-span-S{Sv}", 4096,
                   dict(neg_sharing=0, scatter_impl="span"), "slab", Sv)
        yield ("percenter4096-span-S128-banded256", 4096,
               dict(neg_sharing=0, scatter_impl="span", banded=256),
               "slab", 128)
        # measured NEGATIVE on the exact path (2026-08-21: 4517 us vs
        # 3776 without — f32 slab tables get no cast savings and the
        # negative phase dominates); stays available for tune per-corpus
        yield ("percenter4096-ctx-span-S128-banded256", 4096,
               dict(neg_sharing=0, scatter_impl="span", banded=256,
                    context_pallas=True), "slab", 128)
        # A/B: the rank-1 span apply (measured NEGATIVE 2026-08-20:
        # 4704 us vs 3428 materialized; span_scatter.scatter_add_span_rank1
        # docstring) — default is now the materialized path
        for Sv in (64, 128):
            yield (f"percenter4096-spanr1-S{Sv}", 4096,
                   dict(neg_sharing=0, scatter_impl="span",
                        span_rank1=True), "slab", Sv)

    results = {}
    for item in variants():
        name, B, kw, fam = item[:4]
        Sv = item[4] if len(item) > 4 else S
        if wanted and name not in wanted:
            continue
        words_per_step = B * train_words / n_centers
        max_chunks = max(1, n_centers // (Sv * B))

        def scalars(ci):
            return ChunkScalars(
                base0=jnp.int32(ep.halo + (ci % max_chunks) * Sv * B),
                alpha0=jnp.float32(CFG["alpha"]),
                wca_start=jnp.float32(0.0),
                wca_per_step=jnp.float32(words_per_step),
                denom=jnp.float32(denom))

        try:
            ap, aa = atab.prob, atab.alias
            stratify = kw.pop("stratify", False)
            densehot = kw.pop("densehot", False)
            if stratify or densehot:
                from word2bits_tpu.sampling.unigram import (
                    build_stratified_tables)
                st = build_stratified_tables(
                    np.maximum(counts, 1) ** 0.75, kw["hot_rows"])
                if stratify:
                    kw["strat_lanes"] = st.lane_split(CFG["negative"])
                    ap = (st.hot.prob, st.cold.prob)
                    aa = (st.hot.alias, st.cold.alias)
                else:
                    kw["dense_hot"] = st.dense_split(CFG["negative"])
                    ap, aa = st.cold.prob, st.cold.alias
            # swept kernels need window-aligned table rows and 128-lane
            # columns (zero padding never matches a window id / rides
            # with zero gradients) — same machinery as bench.run_variant
            simpl = kw.get("scatter_impl", "add")
            swept = simpl in ("sweep", "span", "grmw")
            # row-pad modulus must match the kernel's sweep window (a
            # non-default span_window otherwise pads to the wrong multiple
            # and fails at plan time — advisor r3); grmw pads to the
            # dtype's sublane group instead
            swn = int(kw.get("span_window", 512))
            if simpl == "grmw":
                from word2bits_tpu.kernels.scatter_pallas import group_rows
                swn = group_rows(dtype)
            if fam == "fused":
                if swept:
                    kw["col_pad"] = (-2 * CFG["size"]) % 128
                fn = make_fused_train_chunk(hyper, V, B, Sv, **kw)
                p = interleave(u0, v0)
                if swept:
                    p = jnp.pad(p, ((0, (-V) % swn), (0, kw["col_pad"])))
                params = (p,)
            else:
                fn = make_slab_train_chunk(hyper, V, B, Sv, **kw)
                pu, pv = u0, v0
                if swept:  # slab span infers col pad from the table shape
                    pad = ((0, (-V) % swn), (0, (-CFG["size"]) % 128))
                    pu, pv = jnp.pad(u0, pad), jnp.pad(v0, pad)
                params = (pu, pv)

            extra = ()
            if kw.get("hot_rows"):
                from word2bits_tpu.data.pipeline import cold_positions
                n_rows = len(ep.tokens) // B + Sv + 2
                extra = (jnp.asarray(cold_positions(
                    ep.tokens, B, W, n_rows, kw["hot_rows"])),)

            key = jax.random.PRNGKey(0)
            t0 = time.perf_counter()
            key, sub = jax.random.split(key)
            out = fn(*params, tokens, sents, ap, aa,
                     scalars(0), sub, *extra)
            params, loss = out[:-1], out[-1]
            float(loss)
            compile_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            chunks = 0
            while True:
                for _ in range(8):
                    key, sub = jax.random.split(key)
                    out = fn(*params, tokens, sents, ap, aa,
                             scalars(chunks), sub, *extra)
                    params, loss = out[:-1], out[-1]
                    chunks += 1
                float(loss)
                if time.perf_counter() - t0 > SECONDS:
                    break
            dt = time.perf_counter() - t0
            us_per_step = dt / (chunks * Sv) * 1e6
            wps = chunks * Sv * words_per_step / dt
            results[name] = dict(us_per_step=round(us_per_step, 1),
                                 words_per_sec=round(wps, 1),
                                 compile_s=round(compile_s, 1))
        except Exception as e:  # keep going: one variant OOM != lost session
            results[name] = dict(error=f"{type(e).__name__}: {e}"[:300])
        print(json.dumps({"variant": name, **results[name]}), flush=True)
        # fresh param buffers for the next variant (donation consumed ours)
        u0, v0 = init_params(V, CFG["size"], init="uniform", seed=0,
                             dtype=dtype)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
