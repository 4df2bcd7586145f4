"""Convergence-parity acceptance: train the reference C++ binary AND our TPU
trainer on the same structured-analogy corpus with the same hyperparameters,
evaluate both with the same evaluator, and compare analogy accuracy.

This is the offline equivalent of the README text8 acceptance run
(reference README.md:76-119; SURVEY.md section 4) — the pass criterion is our
accuracy within a few points of the reference's at the same bitlevel.

Usage: python tools/accuracy_parity.py [--fast]
Writes ACCEPTANCE.md at the repo root.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.join(REPO, ".bench_cache")
HYPER = dict(size=100, window=5, negative=10, iters=5, min_count=5,
             sample=1e-3, alpha=0.05)


def ensure_corpus(fast=False, big=False):
    os.makedirs(CACHE, exist_ok=True)
    tag = "big" if big else ("fast" if fast else "full")
    corpus = os.path.join(CACHE, f"structured_{tag}.txt")
    questions = os.path.join(CACHE, f"structured_{tag}_questions.txt")
    if not (os.path.exists(corpus) and os.path.exists(questions)):
        from word2bits_tpu.data.structured import structured_corpus
        structured_corpus(corpus, questions,
                          n_sentences=(1_200_000 if big
                                       else 30_000 if fast else 120_000),
                          n_questions=500 if fast else 1000)
    return corpus, questions


def build_reference():
    exe = "/tmp/word2bits_ref_parity"
    if not os.path.exists(exe):
        subprocess.run(
            ["g++", "/root/reference/src/word2bits.cpp", "-o", exe,
             "-lm", "-pthread", "-O3", "-march=native", "-Wno-unused-result"],
            check=True, capture_output=True)
    return exe


def run_reference(exe, corpus, out, bitlevel, iters):
    cmd = [exe, "-train", corpus, "-output", out, "-binary", "1",
           "-size", str(HYPER["size"]), "-window", str(HYPER["window"]),
           "-negative", str(HYPER["negative"]), "-iter", str(iters),
           "-min-count", str(HYPER["min_count"]),
           "-sample", str(HYPER["sample"]), "-alpha", str(HYPER["alpha"]),
           "-bitlevel", str(bitlevel), "-threads", "4", "-debug", "1"]
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, capture_output=True, timeout=3600)
    return time.perf_counter() - t0


def run_ours(corpus, out, bitlevel, iters, neg_sharing, seed=1,
             model="cbow", neg_pool=1, batch_size=512, **extra):
    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.train import train

    alpha = extra.pop("alpha", HYPER["alpha"])
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, binary=True,
        bitlevel=bitlevel, size=HYPER["size"], window=HYPER["window"],
        negative=HYPER["negative"], iter=iters,
        min_count=HYPER["min_count"], sample=HYPER["sample"],
        alpha=alpha, batch_size=batch_size,
        steps_per_chunk=64,
        neg_sharing=neg_sharing, neg_pool=neg_pool, debug=1, seed=seed,
        model=model, **extra)
    t0 = time.perf_counter()
    train(cfg)
    return time.perf_counter() - t0


def evaluate(vec_path, questions, bitlevel=0):
    from word2bits_tpu.eval.analogy import evaluate_analogies, load_questions
    from word2bits_tpu.io.vectors import read_vectors

    words, vectors = read_vectors(vec_path)
    qs = load_questions(questions)
    res = evaluate_analogies(words, vectors, qs, bitlevel=bitlevel)
    return res.total_accuracy, res.coverage


def _stats(xs):
    import statistics
    m = statistics.mean(xs)
    s = statistics.stdev(xs) if len(xs) > 1 else 0.0
    return m, s


# (mode label, neg_sharing, model[, neg_pool]).  The reference trains only
# CBOW (SURVEY.md section 0); skip-gram is our extension, compared against
# the CBOW reference for context.  pool8 = 8 negative pools per tile of 16
# (sharing degree 2): the quality knob that restores shared-mode parity at
# full MXU tile shapes (word2bits_tpu/models/cbow_slab.py pool_mask).
MODES = [("per-center", 0, "cbow"), ("shared-16", 16, "cbow"),
         ("shared-16-pool8", 16, "cbow", 8),
         ("skipgram", 0, "skipgram"),
         # dense-hot: exact hot-stratum negatives (fused tables required);
         # per-center quality at full shared-tile throughput shapes
         ("shared-16-densehot", 16, "cbow", 1,
          dict(fused_tables=True, hot_rows=256, neg_dense_hot=True))]


def main_big():
    """Bench-config quality at text8 scale (VERDICT-r1 weak #6).

    The throughput question the small-corpus table cannot answer: at the
    bench configuration (B=8192, neg_sharing=64, bf16 fused tables) and the
    SAME 5 epochs, does the shipped trainer (auto_lr handles the batch/LR
    interaction) reach reference accuracy once the corpus is big enough for
    a realistic update count — i.e. the text8 regime (~16M tokens here vs
    text8's 17M, reference README.md:93 quickstart shape)?  The small-
    corpus rows at B=8192 are update-starved by construction (~190 updates/
    epoch); text8-scale gives ~2k steps/epoch, the regime the bench number
    actually claims.
    """
    n_seeds = 3
    if "--seeds" in sys.argv:
        n_seeds = int(sys.argv[sys.argv.index("--seeds") + 1])
    corpus, questions = ensure_corpus(big=True)
    exe = build_reference()
    iters = HYPER["iters"]
    rows_path = os.path.join(CACHE, "parity_rows_v2_big.jsonl")
    rows = []
    if os.path.exists(rows_path) and "--fresh" not in sys.argv:
        rows = [json.loads(l) for l in open(rows_path) if l.strip()]
    done = {(r["bitlevel"], r["mode"]) for r in rows}

    modes = [
        # the bench.py throughput config, shipped defaults otherwise
        ("bench-8192-64", 64, "cbow", 1,
         dict(fused_tables=True, dtype="bfloat16", batch_size=8192)),
        # large-batch LR probes: the 3-seed base row sits 0.3 pt below the
        # tolerance line with sigma ~5 — if raising alpha moves the mean the
        # auto_lr rule gains a large-batch term, else it was seed noise
        ("bench-8192-64-a0.10", 64, "cbow", 1,
         dict(fused_tables=True, dtype="bfloat16", batch_size=8192,
              alpha=0.10)),
        ("bench-8192-64-a0.15", 64, "cbow", 1,
         dict(fused_tables=True, dtype="bfloat16", batch_size=8192,
              alpha=0.15)),
        # the dense-hot candidate bench.py adjudicates (hot head scaled to
        # this corpus's 541-word vocab; the bench corpus uses 2048 of 70k)
        ("bench-8192-64-densehot", 64, "cbow", 1,
         dict(fused_tables=True, dtype="bfloat16", batch_size=8192,
              hot_rows=256, neg_dense_hot=True)),
        # neg_pool candidates (VERDICT r2 item 2): pooling decouples the
        # sharing degree from the MXU tile — pool8 recovered per-center
        # parity at small scale and is untested at this shape; alpha=0.10
        # was the best large-batch LR probe (41.6 vs base 39.9)
        ("bench-8192-64-pool8", 64, "cbow", 8,
         dict(fused_tables=True, dtype="bfloat16", batch_size=8192)),
        ("bench-8192-64-pool8-a0.10", 64, "cbow", 8,
         dict(fused_tables=True, dtype="bfloat16", batch_size=8192,
              alpha=0.10)),
        ("bench-8192-64-pool4-a0.10", 64, "cbow", 4,
         dict(fused_tables=True, dtype="bfloat16", batch_size=8192,
              alpha=0.10)),
        # round 4: pool2 probes the cheap end of the pool class (sharing
        # degree 32) — pool8/pool4 both clear the strong criterion; the
        # shipped config is the FASTEST pool that still clears it
        ("bench-8192-64-pool2-a0.10", 64, "cbow", 2,
         dict(fused_tables=True, dtype="bfloat16", batch_size=8192,
              alpha=0.10)),
    ]
    if "--only" in sys.argv:  # comma-separated mode labels to (re)run
        labels = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        modes = [m for m in modes if m[0] in labels]
    extend = 0
    if "--extend" in sys.argv:  # grow every cached row to N seeds
        extend = int(sys.argv[sys.argv.index("--extend") + 1])
    if extend:
        by_label = {m[0]: m for m in modes}
        for bitlevel in sorted({r["bitlevel"] for r in rows}):
            brows = [r for r in rows if r["bitlevel"] == bitlevel]
            ref_accs = list(brows[0]["ref_accs"])
            for s in range(len(ref_accs), extend):
                ref_out = f"/tmp/parity_big_ref_b{bitlevel}_{s}.bin"
                run_reference(exe, corpus, ref_out, bitlevel, iters)
                acc, _ = evaluate(ref_out, questions)
                ref_accs.append(acc)
                print(f"ref b{bitlevel} seed{s}: {acc:.1f}", flush=True)
            for r in brows:
                if r["mode"] not in by_label:
                    # --only filtered out: leave the row's ref_accs at its
                    # our_accs seed count — extending only the reference
                    # side would make the row compare means over unequal
                    # seed counts (ADVICE r4)
                    continue
                r["ref_accs"] = ref_accs
                label, sharing, model, pool, extra = by_label[r["mode"]]
                extra = dict(extra)
                bsz = extra.pop("batch_size", 512)
                for s in range(len(r["our_accs"]), extend):
                    out = f"/tmp/parity_big_ours_b{bitlevel}_{label}_{s}.bin"
                    run_ours(corpus, out, bitlevel, iters, sharing,
                             seed=s + 1, model=model, neg_pool=pool,
                             batch_size=bsz, **extra)
                    acc, _ = evaluate(out, questions)
                    r["our_accs"].append(acc)
                    print(f"ours b{bitlevel} {label} seed{s}: {acc:.1f}",
                          flush=True)
        with open(rows_path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    if "--ref-only" in sys.argv:
        # run ONLY the reference legs (CPU-bound C++ binary) and cache them
        # as a __ref__ row — lets the reference seeds run concurrently with
        # TPU work; a later --big invocation reuses them via `prior`
        for bitlevel in (1,):
            # prefer an existing __ref__ carrier row (its legs are the
            # freshest/longest); any mode row is only a fallback
            prior = next((r for r in rows if r["bitlevel"] == bitlevel
                          and r["mode"] == "__ref__"), None)
            if prior is None:
                prior = next((r for r in rows if r["bitlevel"] == bitlevel),
                             None)
            ref_accs = list(prior["ref_accs"]) if prior else []
            t_ref = prior["ref_time"] if prior else 0.0
            ref_cov = prior["ref_cov"] if prior else 100.0
            for s in range(len(ref_accs), n_seeds):
                ref_out = f"/tmp/parity_big_ref_b{bitlevel}_{s}.bin"
                if "--reuse-bins" in sys.argv and os.path.exists(ref_out):
                    pass  # reuse a finished leg from an interrupted campaign
                else:
                    t_ref = run_reference(exe, corpus, ref_out, bitlevel,
                                          iters)
                acc, ref_cov = evaluate(ref_out, questions)
                ref_accs.append(acc)
                print(f"ref b{bitlevel} seed{s}: {acc:.1f}", flush=True)
            row = dict(bitlevel=bitlevel, mode="__ref__", ref_accs=ref_accs,
                       our_accs=[], ref_cov=ref_cov, our_cov=0.0,
                       ref_time=t_ref, our_time=0.0)
            # __ref__ rows replace any prior __ref__ for the bitlevel
            rows = [r for r in rows
                    if not (r["mode"] == "__ref__"
                            and r["bitlevel"] == bitlevel)] + [row]
            with open(rows_path, "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")
            print(json.dumps(row), flush=True)
        return

    for bitlevel in (1,):
        ref_accs, t_ref = [], 0.0
        ref_cov = 100.0
        prior = next((r for r in rows if r["bitlevel"] == bitlevel
                      and r["mode"] == "__ref__"),
                     next((r for r in rows if r["bitlevel"] == bitlevel),
                          None))
        if prior is not None:  # reference legs are reusable across modes
            ref_accs = list(prior["ref_accs"])
            ref_cov = prior["ref_cov"]
            t_ref = prior["ref_time"] * n_seeds
        for label, sharing, model, pool, extra in modes:
            extra = dict(extra)  # pops below must not mutate the mode table
            if (bitlevel, label) in done:
                continue
            if not ref_accs:
                for s in range(n_seeds):
                    ref_out = f"/tmp/parity_big_ref_b{bitlevel}_{s}.bin"
                    t_ref += run_reference(exe, corpus, ref_out, bitlevel,
                                           iters)
                    acc, ref_cov = evaluate(ref_out, questions)
                    ref_accs.append(acc)
                    print(f"ref b{bitlevel} seed{s}: {acc:.1f}", flush=True)
            bsz = extra.pop("batch_size", 512)
            our_accs, t_ours = [], 0.0
            for s in range(n_seeds):
                out = f"/tmp/parity_big_ours_b{bitlevel}_{label}_{s}.bin"
                t_ours += run_ours(corpus, out, bitlevel, iters, sharing,
                                   seed=s + 1, model=model, neg_pool=pool,
                                   batch_size=bsz, **extra)
                acc, our_cov = evaluate(out, questions)
                our_accs.append(acc)
                print(f"ours b{bitlevel} {label} seed{s}: {acc:.1f}",
                      flush=True)
            row = dict(bitlevel=bitlevel, mode=label, ref_accs=ref_accs,
                       our_accs=our_accs, ref_cov=ref_cov, our_cov=our_cov,
                       ref_time=t_ref / n_seeds, our_time=t_ours / n_seeds)
            rows.append(row)
            with open(rows_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps(row), flush=True)

    out_md = os.path.join(REPO, "docs", "acceptance_benchcfg.md")
    with open(out_md, "w") as f:
        f.write("# Bench-config quality at text8 scale\n\n")
        f.write("Structured-analogy corpus scaled to ~16M tokens (text8's "
                "size; no network egress), 5 epochs, bitlevel 1 — the "
                "regime bench.py's throughput configuration actually "
                "claims.  Reference = C++ binary, 4 threads; ours = the "
                "shipped trainer at the bench config (B=8192, "
                "neg_sharing=64, bf16 fused tables, auto_lr default).\n\n")
        f.write("| bitlevel | mode | seeds | ref acc % | ours acc % | "
                "ours mean−σ | at/above | strong |\n")
        f.write("|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            if not r["our_accs"]:
                continue  # __ref__ carrier rows hold no ours leg
            rm, rs = _stats(r["ref_accs"])
            om, os_ = _stats(r["our_accs"])
            # north-star criterion (BASELINE.md / VERDICT r2 weak #1):
            # ours_mean >= ref_mean - 1.0, no sigma allowance
            ok = "yes" if om + 1e-9 >= rm - 1.0 else "NO"
            # strong criterion (VERDICT r3 item 6): ours mean−1σ >= ref mean
            strong = "yes" if om - os_ + 1e-9 >= rm else "no"
            f.write(f"| {r['bitlevel']} | {r['mode']} "
                    f"| {len(r['our_accs'])} | {rm:.1f}±{rs:.1f} "
                    f"| {om:.1f}±{os_:.1f} | {om - os_:.1f} | {ok} "
                    f"| {strong} |\n")
        f.write(
            "\nat/above = ours_mean >= ref_mean - 1.0, the BASELINE.md "
            "north star (no sigma allowance).  strong = ours mean−1σ >= "
            "ref mean (VERDICT r3 item 6's bar for the benched config's "
            "quality evidence).\n"
            "\nRound-4 campaign (8 seeds, per-seed rows git-tracked in "
            ".bench_cache/parity_rows_v2_big.jsonl): plain alpha=0.05 at "
            "B=8192 is below the reference; alpha=0.10 clears the north "
            "star comfortably but its mean−1σ lands 0.1 below the "
            "reference mean (not 'strong'); the pool class clears the "
            "strong criterion at every tested degree (pool2 +15.8, pool4 "
            "+12.9, pool8 +17.3 points of mean−1σ margin) — so bench.py's "
            "shipped configuration is the FASTEST strong-clearing pool, "
            "-neg-pool 2 -alpha 0.10 (VERDICT r3 item 6's adopt-the-pool-"
            "class branch; pool2 measured 14.2M words/sec vs pool8's "
            "7.6M), and the headline throughput is measured AT that "
            "config.  auto_lr still adds no automatic large-batch term "
            "(the batch/LR interaction is not monotone across grids — "
            "docs/acceptance_notes.md); the large-batch alpha stays a "
            "measured per-config choice.\n"
            "\nThe densehot row changes the negative-sampling estimator "
            "with a wide spread at this shape, so it remains an opt-in "
            "trade verified per-corpus (cli tune).  bench.py's "
            "adjudication set (span scatter, banded sums, scan-chunk "
            "size) stays strictly update-equal WITHIN the pool2 config, "
            "so the headline inherits this table's pool2 row directly.\n")
        seeds_used = max(len(r["our_accs"]) for r in rows) if rows else 0
        f.write(f"\nGenerated {time.strftime('%Y-%m-%d %H:%M')} by "
                f"tools/accuracy_parity.py --big (seeds={seeds_used}).\n")
    print(f"wrote {out_md}")


def main():
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if "--big" in sys.argv:
        return main_big()
    fast = "--fast" in sys.argv
    n_seeds = 3
    if "--seeds" in sys.argv:
        n_seeds = int(sys.argv[sys.argv.index("--seeds") + 1])
    corpus, questions = ensure_corpus(fast)
    exe = build_reference()
    iters = 3 if fast else HYPER["iters"]

    # incremental rows: a crashed/killed run keeps its finished configs
    rows_path = os.path.join(
        CACHE, f"parity_rows_v2_{'fast' if fast else 'full'}.jsonl")
    rows = []
    if os.path.exists(rows_path) and "--fresh" not in sys.argv:
        rows = [json.loads(l) for l in open(rows_path) if l.strip()]
    done = {(r["bitlevel"], r["mode"]) for r in rows}

    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]  # e.g. "1:shared-16"

    ref_cache = {}  # bitlevel -> (accs, cov, time); reference runs reused

    def reference_accs(bitlevel):
        if bitlevel not in ref_cache:
            accs, t_tot = [], 0.0
            for s in range(n_seeds):  # reruns: thread-race nondeterminism
                ref_out = f"/tmp/parity_ref_b{bitlevel}_{s}.bin"
                t_tot += run_reference(exe, corpus, ref_out, bitlevel, iters)
                acc, cov = evaluate(ref_out, questions)
                accs.append(acc)
            ref_cache[bitlevel] = (accs, cov, t_tot / n_seeds)
        return ref_cache[bitlevel]

    # bitlevels 4 and 8 exercise the reference's >=4 rounding branch (round
    # |x| to nearest 1/2^(bitlevel-1), clip to 1 — reference
    # src/word2bits.cpp:100-105); a reduced mode set bounds runtime
    # (per-center = exact semantics, densehot = the recommended quantized
    # production path; bitlevel 8 runs per-center only — one generalization
    # check of the fine-grid auto-batch rule)
    for bitlevel in (1, 0, 2, 4, 8):
        wanted = [m for m in MODES
                  if (bitlevel, m[0]) not in done
                  and (only is None or only == f"{bitlevel}:{m[0]}")
                  and not (m[2] == "skipgram" and bitlevel != 1)
                  and not (bitlevel == 4 and m[0] == "shared-16")
                  and not (bitlevel == 8 and m[0] != "per-center")]
        if not wanted:
            continue
        ref_accs, ref_cov, ref_t = reference_accs(bitlevel)

        for label, sharing, model, *rest in wanted:
            pool = rest[0] if rest else 1
            extra = rest[1] if len(rest) > 1 else {}
            # default-mode rows (per-center) and all fine-grid rows run at
            # the config's AUTO batch (0 -> 256, the measured quality-first
            # default); explicit throughput-shape modes keep the table's
            # historical B=512
            bsz = 0 if (label == "per-center" or bitlevel >= 4) else 512
            our_accs, t_tot = [], 0.0
            for s in range(n_seeds):
                our_out = (f"/tmp/parity_ours_b{bitlevel}_{sharing}_{model}"
                           f"_p{pool}_{len(extra)}_{s}.bin")
                t_tot += run_ours(corpus, our_out, bitlevel, iters, sharing,
                                  seed=s + 1, model=model, neg_pool=pool,
                                  batch_size=bsz, **extra)
                acc, our_cov = evaluate(our_out, questions)
                our_accs.append(acc)
            rows.append(dict(bitlevel=bitlevel, mode=label,
                             ref_accs=ref_accs, our_accs=our_accs,
                             ref_cov=ref_cov, our_cov=our_cov,
                             ref_time=ref_t, our_time=t_tot / n_seeds))
            with open(rows_path, "a") as f:
                f.write(json.dumps(rows[-1]) + "\n")
            print(json.dumps(rows[-1]), flush=True)

    import jax
    backend = jax.default_backend()
    # fast mode is a harness smoke — don't clobber the real acceptance table
    out_md = os.path.join(REPO, "ACCEPTANCE.md") if not fast else "/tmp/acceptance_fast.md"
    with open(out_md, "w") as f:
        f.write("# Convergence-parity acceptance (structured-analogy corpus)\n\n")
        f.write("Offline equivalent of the README text8 acceptance run "
                "(no network egress; see word2bits_tpu/data/structured.py).\n"
                "Reference = original C++ binary, 4 threads, this container's "
                f"CPU ({len(rows) and len(rows[0]['ref_accs'])} reruns; its "
                "Hogwild thread races are the seed). "
                f"Ours = `{backend}` backend, seeds 1..N, reference-default "
                "flags (`auto_lr` on — the measured batch/LR rule, "
                "word2bits_tpu/config.py).\n\n")
        f.write("| bitlevel | mode | ref acc % | ours acc % | at/above | "
                "ref s | ours s |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        # Pool reference samples per bitlevel ACROSS invocations: Hogwild
        # rerun batches drift by several points (e.g. bitlevel-2 batches at
        # 50.9±0.5 and 46.6±1.3 hours apart), so invocation-local bars
        # overstate confidence in the comparison.
        ref_pool = {}
        for r in rows:
            ref_pool.setdefault(r["bitlevel"], []).extend(r["ref_accs"])
        for r in rows:
            rm, rs = _stats(ref_pool[r["bitlevel"]])
            om, os_ = _stats(r["our_accs"])
            ok = "yes" if om + 1e-9 >= rm - max(rs, 1.0) else "NO"
            f.write(f"| {r['bitlevel']} | {r['mode']} | {rm:.1f}±{rs:.1f} "
                    f"| {om:.1f}±{os_:.1f} | {ok} | {r['ref_time']:.1f} "
                    f"| {r['our_time']:.1f} |\n")
        f.write("\n`skipgram` is our extension (the reference trains only "
                "CBOW, SURVEY.md section 0); its reference column is the CBOW "
                "binary at the same bitlevel, shown for context.\n")
        f.write("\nThe bench.py throughput configuration (B=8192, "
                "neg_sharing=64, bf16 fused) is validated separately at "
                "text8 scale (~16M tokens, where its update count is "
                "realistic): docs/acceptance_benchcfg.md "
                "(tools/accuracy_parity.py --big).\n")
        # derive the default-mode summary from the rows themselves (the
        # DEFAULT is per-center, neg_sharing=0); never hardcode a conclusion
        pc = [r for r in rows if r["mode"] == "per-center"]
        above = [r for r in pc
                 if _stats(r["our_accs"])[0] + 1e-9
                 >= _stats(ref_pool[r["bitlevel"]])[0]]
        within = [r for r in pc
                  if _stats(r["our_accs"])[0] + 1e-9
                  >= _stats(ref_pool[r["bitlevel"]])[0]
                  - max(_stats(ref_pool[r["bitlevel"]])[1], 1.0)]
        if len(within) == len(pc):
            strictly = sorted(r["bitlevel"] for r in above)
            rest = sorted(r["bitlevel"] for r in pc if r not in above)
            msg = (f"strictly above the pooled reference mean at "
                   f"bitlevel(s) {strictly} and within its rerun spread at "
                   f"{rest}" if rest else "at-or-above the pooled reference "
                   "mean at every bitlevel")
            f.write(f"\nThe trainer's DEFAULT mode (per-center, "
                    f"`neg_sharing=0`) is {msg}; `shared`/`densehot` rows "
                    "are explicit throughput/variance trade-offs whose "
                    "per-bitlevel recommendations are in the notes below.\n")
        else:
            bad = sorted(r["bitlevel"] for r in pc if r not in within)
            f.write(f"\nWARNING: the DEFAULT per-center mode is BELOW the "
                    f"pooled-reference tolerance at bitlevel(s) {bad} — "
                    "parity regression; investigate before shipping.\n")
        f.write(f"\nGenerated {time.strftime('%Y-%m-%d %H:%M')} by "
                "tools/accuracy_parity.py" + (" --fast" if fast else "")
                + f" (seeds={n_seeds}).\n")
        notes = os.path.join(REPO, "docs", "acceptance_notes.md")
        if os.path.exists(notes):
            f.write("\n" + open(notes).read())
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
