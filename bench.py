"""Benchmark: training words/sec on one TPU chip, flagship text8-like config
(bitlevel 1, size 200, window 8, negative 24 — the reference README quickstart,
README.md:93).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "words/sec", "vs_baseline": N}

"words/sec" counts corpus words *consumed* (kept + subsample-discarded +
sentence tokens), the same accounting as the reference's word_count_actual
(reference src/word2bits.cpp:379-393), so it is directly comparable to the
reference binary's throughput on the same corpus.

Baseline: the reference C++ binary's measured words/sec on this container's
CPU (4 threads), stored in bench_baseline.json by tools/measure_baseline.py.

Tunnel resilience: the axon TPU backend occasionally wedges
(FAILED_PRECONDITION / UNAVAILABLE, sometimes a silent hang) and recovers
after minutes of quiet.  The measurement therefore runs in a CHILD process
(env W2B_BENCH_CHILD=1) supervised by this script: a hung or failed child is
killed by exact PID and retried with backoff, so one flake cannot cost the
round its perf evidence (round-1 BENCH rc=1 postmortem).  The whole run is
bounded below the driver's budget (TOTAL_BUDGET; round-3 rc=124
postmortem), and every successful measurement is appended to the tracked
bench_results.jsonl — if a wedged tunnel defeats every live attempt, the
best recorded result is published marked "stale" instead of emitting
nothing.

Variant adjudication: children measure small sets of quality-safe step
variants (span scatter, banded windowed sums, scan-chunk size — each
proven update-equal to the base step; ARCHITECTURE.md), the FIRST set
being the single expected winner so one healthy tunnel window lands the
headline, publishing strictly improving results as they go (stdout +
PARTIAL_FILE sidecar).  The reported number is the best configuration the
chip actually served this run.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")
BASELINE_FILE = os.path.join(REPO, "bench_baseline.json")

# Bench scale: large enough to saturate the chip, small enough to build fast.
N_TOKENS = 4_000_000
VOCAB = 70_000
# Quality-verified configuration: measured DIRECTLY at text8 scale (~16M
# tokens, 8 seeds each, docs/acceptance_benchcfg.md, round 4), criterion =
# STRONG (ours mean−1σ >= reference mean; VERDICT r3 item 6):
#   alpha=0.05 (old default)    42.5±5.8   below the reference mean
#   alpha=0.10                  56.0±8.0   north-star pass; strong by −0.1
#   alpha=0.10 + pool2          68.3±4.4   STRONG +15.8   <- SHIPPED
#   alpha=0.10 + pool4 / pool8  70.7±9.7 / 70.1±4.7   strong, but slower
#     (pool8 measured 7.6M words/sec vs pool2's 14.2M at this shape)
# So the bench config carries BOTH measured quality knobs: the large-batch
# LR (scalar, zero throughput effect) and -neg-pool 2 (each negative set
# shared by G/P=32 centers instead of 64 — a real ~15% throughput cost the
# headline pays for its strong quality evidence).  bf16 fused tables
# validated at/above f32 convergence (ACCEPTANCE.md).
CFG = dict(bitlevel=1, size=200, window=8, negative=24, min_count=5,
           sample=1e-3, alpha=0.10, batch_size=8192, steps_per_chunk=16,
           neg_sharing=64, neg_pool=2, dtype="bfloat16",
           # hot/cold scatter + negative-sampling + windowed-sum variants
           # (0/None = off); adjudicated IN-PROCESS by the child (VARIANTS)
           hot_rows=0, neg_mode="sample",  # "sample" | "dense_hot"
           banded=0)
# Results recorded to RESULTS_LOG carry this tag; the stale fallback only
# publishes entries measured at the SAME quality configuration (a number
# measured under an older config must not back a different config's claim).
# Derived from the quality-relevant CFG keys so a CFG edit can never leave
# a stale tag behind (ADVICE r4).
CFG_TAG = (f"pool{CFG['neg_pool']}-a{CFG['alpha']:.2f}-b{CFG['batch_size']}"
           f"-bl{CFG['bitlevel']}-d{CFG['size']}-neg{CFG['negative']}"
           f"-{CFG['neg_mode']}")
# Quality-safe step variants adjudicated by the child at bench time (the
# round-2 scatter/windowed redesigns).  STRICTLY update-equal only: hot
# restructures the scatter (same updates), banded changes float summation
# order — so the headline needs no quality argument beyond the base
# config's own (docs/acceptance_benchcfg.md).  dense-hot is deliberately
# NOT in this set: it changes the estimator — the round-3 text8-scale row
# (54.9±12.5) carries the largest variance in the table and its round-2
# measurement at the same shape came in below base, so it remains a
# per-config quality/throughput trade the user verifies on their corpus
# (-neg-dense-hot, cli tune).  Base runs first and its result is published
# immediately; each later variant only replaces it if faster, so a tunnel
# re-wedge mid-adjudication can only cost upside, never the round's
# number.
VARIANTS = [
    dict(name="base"),
    # ctx: the fused context+positive forward kernel
    # (kernels/context_pallas.py) composed with the span winner —
    # update-equal modulo float summation order; measured 722 vs 737 us
    # same-session (step_bench, 2026-08-20)
    dict(name="ctx_span_banded256_S256", banded=256, steps_per_chunk=256,
         scatter_impl="span", context_pallas=True),
    # span: the spanning sweep scatter (kernels/span_scatter.py) with the
    # sort/plan pre-pass hoisted out of the scan — update-equal modulo
    # float summation order, measured 16.8M words/sec vs add's 11.8M at
    # this shape (tools/ablate_fused.py, v5e 2026-08-19); right after base
    # so the expected winner lands early if a later variant wedges the
    # tunnel (progressive publication)
    dict(name="span_banded256_S128", banded=256, steps_per_chunk=128,
         scatter_impl="span"),
    # S-lever on the span winner (S256 beat S128 on the plain-scatter
    # winner in r2) and window tuning: smaller sweep windows cut the
    # kernel's per-visited-window DMA traffic where the zipf tail leaves
    # windows nearly empty, at the cost of more window visits
    dict(name="span_banded256_S256", banded=256, steps_per_chunk=256,
         scatter_impl="span"),
    dict(name="span_banded256_S128_w256", banded=256, steps_per_chunk=128,
         scatter_impl="span", span_window=256),
    dict(name="span_banded256_S128_w128", banded=256, steps_per_chunk=128,
         scatter_impl="span", span_window=128),
    # measured negatives at the pool2 shape (one-off children, 2026-08-20):
    # w1024 13.4M and S512 14.13M, both at-or-below the S256/w512 winner
    # (14.16M) — dropped from the set rather than left as dead config
    # (they also inflated S_max and thus every child's epoch capacity)
    dict(name="span_S128", steps_per_chunk=128, scatter_impl="span"),
    # grmw: the round-5 sorted group-RMW kernel (kernels/group_rmw.py) —
    # update-equal like span, and the 3.7M x 800d capacity winner (2.66M
    # words/sec, docs/large_vocab.md) — but at THIS dense 70k-vocab shape
    # it measured 1456 us/step vs span's 778 (step_bench, 2026-08-20: the
    # group visits move 16 rows per touched group where span's open-window
    # accumulation amortizes), so it stays out of the scheduled sets
    dict(name="grmw_banded256_S256", banded=256, steps_per_chunk=256,
         scatter_impl="grmw"),
    # previous round's winner as the fallback; the set is kept SMALL —
    # r3 bench-child runs showed the remote backend can wedge
    # (InvalidArgument on every later variant) after many big compiled
    # variants accumulate in one process, and a trimmed set keeps the
    # winner early and the process light
    dict(name="banded256_S256", banded=256, steps_per_chunk=256),
    dict(name="banded256_S128", banded=256, steps_per_chunk=128),
]
BENCH_SECONDS = 8.0       # per-variant timed window
CHILD_BUDGET = 330.0      # stop starting variants before the supervisor
                          # kill window (CHILD_TIMEOUT) closes
PARTIAL_FILE = os.path.join(CACHE, "bench_partial.json")


def _prepare():
    """Corpus -> vocab -> encoded ids, all cached."""
    os.makedirs(CACHE, exist_ok=True)
    corpus = os.path.join(CACHE, f"zipf_{N_TOKENS}_{VOCAB}.txt")
    npz = os.path.join(CACHE, f"enc_{N_TOKENS}_{VOCAB}_mc{CFG['min_count']}.npz")
    if os.path.exists(npz):
        z = np.load(npz, allow_pickle=True)
        return z["encoded"], z["counts"], int(z["train_words"])
    from word2bits_tpu.data.synthetic import zipf_corpus
    from word2bits_tpu.data.corpus import build_vocab, encode_corpus
    if not os.path.exists(corpus):
        zipf_corpus(corpus, n_tokens=N_TOKENS, vocab=VOCAB)
    vocab = build_vocab(corpus, min_count=CFG["min_count"])
    encoded = encode_corpus(corpus, vocab)
    np.savez(npz, encoded=encoded, counts=vocab.counts,
             train_words=vocab.train_words)
    return encoded, vocab.counts, vocab.train_words


# Child-process measurement budget and retry schedule.  The r3 postmortem
# (BENCH_r03.json rc=124): the old worst case (~74 min of retries) blew the
# driver's own budget and the supervisor was killed mid-schedule, emitting
# NOTHING.  The whole adjudication is now bounded by TOTAL_BUDGET wall
# seconds — no child is launched unless it can finish inside it — and when
# every live attempt fails the supervisor falls back to the best previously
# recorded result (RESULTS_LOG) marked "stale" instead of exiting 1.
CHILD_TIMEOUT = 420.0
RETRY_DELAYS = [45.0, 90.0]
TOTAL_BUDGET = 1100.0        # supervisor wall-clock ceiling (~18 min)
RESULTS_LOG = os.path.join(REPO, "bench_results.jsonl")


def _record_result(obj: dict):
    """Append a successful measurement to the tracked results log — the
    stale-fallback source when a wedged tunnel defeats every live attempt
    (VERDICT r3 item 1c).  Tracked in git (unlike .bench_cache/) so it
    survives session/round boundaries."""
    rec = dict(obj, measured_at=time.strftime("%Y-%m-%dT%H:%M:%S"),
               cfg_tag=CFG_TAG)
    try:
        with open(RESULTS_LOG, "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError as e:
        print(f"bench: could not record result: {e}", file=sys.stderr,
              flush=True)


def _stale_best() -> dict | None:
    """Best previously recorded live result, marked stale."""
    best = None
    try:
        for line in open(RESULTS_LOG):
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if "metric" not in obj or obj.get("stale"):
                continue
            if obj.get("cfg_tag") != CFG_TAG:
                continue  # measured under a different quality config
            if best is None or obj.get("value", 0) > best.get("value", 0):
                best = obj
    except OSError:
        return None
    if best is not None:
        best = dict(best, stale=True)
    return best


def _read_partial():
    """Best result the child managed to record before dying, if any."""
    try:
        obj = json.load(open(PARTIAL_FILE))
        return obj if "metric" in obj else None
    except Exception:
        return None


# Variant sets, one CHILD PROCESS each: the remote backend reproducibly
# wedges (InvalidArgument on everything after) once ~3 heavy variants have
# compiled in one process (r3 logs; jax.clear_caches does not help), so the
# adjudication is split — the first set is the SINGLE expected winner
# (VERDICT r3 item 1b: one healthy tunnel window lands the headline) and
# gets the retry schedule; later sets are pure upside, one attempt each,
# all bounded by TOTAL_BUDGET.
VARIANT_SETS = [
    "ctx_span_banded256_S256,span_banded256_S256",
    "base,span_banded256_S128",
    "span_banded256_S128_w256,span_S128",
    "banded256_S256",
]


def _run_child(env) -> dict | None:
    """One child process; returns its best-result object, if any."""
    try:
        if os.path.exists(PARTIAL_FILE):
            os.remove(PARTIAL_FILE)  # stale results must not leak in
    except OSError:
        pass
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, timeout=CHILD_TIMEOUT,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        partial = _read_partial()
        if partial is not None:
            print("bench: child hung mid-adjudication; using its last "
                  "recorded result", file=sys.stderr, flush=True)
            return partial
        print(f"bench: child hung >{CHILD_TIMEOUT:.0f}s before any result; "
              "killed", file=sys.stderr, flush=True)
        return None
    # last JSON line wins: the child prints strictly improving results
    for line in reversed(r.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if "metric" in obj:
                return obj
    partial = _read_partial()
    if partial is not None:
        print(f"bench: child died rc={r.returncode} mid-adjudication; "
              "using its last recorded result", file=sys.stderr, flush=True)
        return partial
    print(f"bench: child exited rc={r.returncode} without a result. "
          "stderr tail:\n" + "\n".join(r.stderr.splitlines()[-8:]),
          file=sys.stderr, flush=True)
    return None


def _supervise() -> int:
    """Run the measurement in children; retry on failure/hang with backoff.

    Each child records every improving result to PARTIAL_FILE before trying
    its next variant, so even a child killed mid-adjudication leaves a
    salvageable number (on POSIX, TimeoutExpired carries no partial stdout —
    the sidecar file is the only channel that survives a kill).

    Whole-run wall clock is bounded by TOTAL_BUDGET (no child launches
    unless it can finish inside it), and a run where every live attempt
    fails falls back to the best previously recorded result from
    RESULTS_LOG, marked "stale" — BENCH_r{N}.json must always parse."""
    try:
        os.makedirs(CACHE, exist_ok=True)
    except OSError:
        pass
    t0 = time.perf_counter()

    def budget_left():
        return TOTAL_BUDGET - (time.perf_counter() - t0)

    best = None
    out_of_budget = False
    for si, vset in enumerate(VARIANT_SETS):
        env = dict(os.environ, W2B_BENCH_CHILD="1", W2B_BENCH_VARIANTS=vset)
        attempts = (len(RETRY_DELAYS) + 1) if si == 0 else 1
        for i in range(attempts):
            if i:
                # check BEFORE sleeping: a backoff that cannot be followed
                # by a full child is budget burned doing nothing — move on
                # to the later (no-sleep) sets instead
                if budget_left() < CHILD_TIMEOUT + RETRY_DELAYS[i - 1]:
                    break
                print(f"bench: attempt {i} failed; sleeping "
                      f"{RETRY_DELAYS[i-1]:.0f}s to let the tunnel "
                      "recover...", file=sys.stderr, flush=True)
                time.sleep(RETRY_DELAYS[i - 1])
            if budget_left() < CHILD_TIMEOUT:
                out_of_budget = True
                break
            print(f"bench: set {si + 1}/{len(VARIANT_SETS)} [{vset}] "
                  f"attempt {i + 1}/{attempts} "
                  f"(budget {budget_left():.0f}s)",
                  file=sys.stderr, flush=True)
            obj = _run_child(env)
            if obj is not None:
                _record_result(obj)
                if best is None or obj.get("value", 0) > best.get("value", 0):
                    best = obj
                break
        if out_of_budget:
            print("bench: TOTAL_BUDGET reached; stopping adjudication",
                  file=sys.stderr, flush=True)
            break
    if best is not None:
        print(json.dumps(best), flush=True)
        return 0
    stale = _stale_best()
    if stale is not None:
        print("bench: all live attempts failed; publishing the best "
              f"previously recorded result (measured_at="
              f"{stale.get('measured_at')}) marked stale",
              file=sys.stderr, flush=True)
        print(json.dumps(stale), flush=True)
        return 0
    print("bench: all attempts failed and no recorded result exists",
          file=sys.stderr, flush=True)
    return 1


def main():
    # progress markers so a supervisor-killed child's stderr shows WHERE it
    # hung: nothing => interpreter/axon-register init (sitecustomize dials
    # the relay at startup); "imported" => backend init / first dispatch
    print("bench: child starting imports", file=sys.stderr, flush=True)
    import jax
    print("bench: jax imported", file=sys.stderr, flush=True)
    forced_cpu = bool(os.environ.get("W2B_FORCE_CPU"))
    if forced_cpu:  # testing only — the metric is TPU
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    from word2bits_tpu.data.pipeline import build_epoch_arrays, cold_positions
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_fused import interleave, make_fused_train_chunk
    from word2bits_tpu.models.init import init_params
    from word2bits_tpu.sampling.unigram import (build_alias_table,
                                                build_stratified_tables)

    t_start = time.perf_counter()
    bench_seconds = float(os.environ.get("W2B_BENCH_SECONDS", BENCH_SECONDS))
    encoded, counts, train_words = _prepare()
    V = len(counts)
    B, S, W = CFG["batch_size"], CFG["steps_per_chunk"], CFG["window"]
    hyper = CBOWHyper(bitlevel=CFG["bitlevel"], size=CFG["size"], window=W,
                      negative=CFG["negative"], reg=0.0)
    weights = np.maximum(counts, 1) ** 0.75

    # epoch arrays sized for the LARGEST steps_per_chunk any variant uses
    S_max = max([S] + [int(v.get("steps_per_chunk", S)) for v in VARIANTS])
    capacity = ((len(encoded) + S_max * B + 8 + 1023) // 1024) * 1024
    ep = build_epoch_arrays(encoded, counts, CFG["sample"], train_words, W,
                            np.random.default_rng(0), capacity=capacity)
    tokens = jnp.asarray(ep.tokens)
    sents = jnp.asarray(ep.sent_ids)
    n_centers = max(ep.n_tokens, 1)
    words_per_step = B * train_words / n_centers
    denom = 5.0 * train_words + 1.0

    baseline = None
    if os.path.exists(BASELINE_FILE):
        try:
            baseline = json.load(open(BASELINE_FILE))["words_per_sec"]
        except Exception:
            baseline = None

    HBM_GBPS = 819e9  # TPU v5e HBM bandwidth (16 GB HBM2 @ 819 GB/s)

    def step_bytes(cfg):
        """HBM traffic model for one step of the fused-table formulation —
        the chip-roofline denominator (VERDICT r2 #4: judge rounds against
        the chip, not the CPU-binary floor in bench_baseline.json).

        Rows are (V, 2D) in cfg['dtype']; per step the model counts
          gather  slab: (B+2W) rows read (u + center-v ride one gather)
          gather  negs: T*K rows read (v-half only; XLA fuses the slice)
          scatter slab: (B+2W) rows read+written (RMW full width)
          scatter negs: T*K rows read+written (u-half zeros still move)
        Elementwise temps ([B,D] masks/averages/scores) are VMEM-resident
        after XLA fusion and excluded; the model UNDERSTATES true traffic,
        so pct_hbm_roofline is a lower bound on achieved efficiency.
        """
        B, W = cfg["batch_size"], cfg["window"]
        D2 = 2 * cfg["size"]
        nbytes = np.dtype(cfg["dtype"]).itemsize
        slab = B + 2 * W
        tk = (B // cfg["neg_sharing"]) * cfg["negative"] \
            * int(cfg.get("neg_pool", 1))
        row = D2 * nbytes
        gathers = (slab + tk // 2) * row          # neg gather = half row
        if cfg.get("scatter_impl") in ("sweep", "span"):
            # swept kernel: every touched window moves once each way; at
            # this shape all windows are touched, so the scatter side is a
            # full-table sweep plus the sorted-row stream (gather + kernel)
            swn = int(cfg.get("span_window", 512))
            Vp = -(-V // swn) * swn
            scatters = 2 * Vp * row + 3 * (slab + tk) * row
        elif cfg.get("scatter_impl") == "grmw":
            # sorted group-RMW: visits <= update rows and each moves a
            # sublane group each way, but sorted dedup collapses the zipf
            # head — per-row accounting (like "add") plus the sorted-row
            # stream keeps the model an UNDERestimate as documented
            scatters = 2 * (slab + tk) * row + 3 * (slab + tk) * row
        else:
            scatters = 2 * (slab + tk) * row      # RMW: read + write
        if cfg.get("hot_rows"):
            # hot head: dense slice RMW of H rows + one-hot MXU operand
            H = cfg["hot_rows"]
            scatters += 2 * H * row
        return gathers + scatters

    def roofline_fields(cfg, wps):
        spd = words_per_step / wps                # seconds per step
        bts = step_bytes(cfg)
        return {
            "us_per_step": round(spd * 1e6, 1),
            "bytes_per_step": int(bts),
            "pct_hbm_roofline": round(100.0 * (bts / HBM_GBPS) / spd, 2),
        }

    def run_variant(var):
        """Build one variant's chunk fn, warm up, and time it."""
        cfg = dict(CFG)
        cfg.update(var)
        # dispatch-amortization lever: larger scan chunks cut per-dispatch
        # latency (step_bench fused-S64/S128 measured +17%/+22% over S=16
        # on the v5e, 2026-08-19); per-variant so the adjudication decides
        Sv = int(cfg.get("steps_per_chunk", S))
        max_chunks = max(1, n_centers // (Sv * B))

        def scalars(ci, words_done):
            return ChunkScalars(
                base0=jnp.int32(ep.halo + (ci % max_chunks) * Sv * B),
                alpha0=jnp.float32(CFG["alpha"]),
                wca_start=jnp.float32(words_done),
                wca_per_step=jnp.float32(words_per_step),
                denom=jnp.float32(denom))

        hot = int(cfg.get("hot_rows") or 0)
        dense = None
        if cfg.get("neg_mode") == "dense_hot":
            st = build_stratified_tables(weights, hot)
            dense = st.dense_split(cfg["negative"])
            table = st.cold
        else:
            table = build_alias_table(weights)
        simpl = cfg.get("scatter_impl", "add")
        col_pad = ((-2 * cfg["size"]) % 128
                   if simpl in ("sweep", "span", "grmw") else 0)
        sw = int(cfg.get("span_window", 512))
        if simpl == "grmw":  # row pad to the dtype's sublane group instead
            from word2bits_tpu.kernels.scatter_pallas import group_rows
            sw = group_rows(jnp.dtype(cfg["dtype"]))
        chunk_fn = make_fused_train_chunk(hyper, V, B, Sv,
                                          neg_sharing=cfg["neg_sharing"],
                                          neg_pool=int(
                                              cfg.get("neg_pool", 1)),
                                          hot_rows=hot, dense_hot=dense,
                                          banded=int(cfg.get("banded") or 0),
                                          scatter_impl=simpl,
                                          col_pad=col_pad,
                                          span_window=sw,
                                          span_chunk=int(
                                              cfg.get("span_chunk", 128)),
                                          context_pallas=bool(
                                              cfg.get("context_pallas")))
        extra = ()
        if hot:
            n_rows = len(ep.tokens) // B + Sv + 2
            extra = (jnp.asarray(cold_positions(ep.tokens, B, W, n_rows, hot)),)
        u, v = init_params(V, cfg["size"], init="uniform", seed=0,
                           dtype=jnp.dtype(cfg["dtype"]))
        params = interleave(u, v)  # fused (V, 2D): one scatter for u+v_center
        if simpl in ("sweep", "span", "grmw"):
            # swept kernels need window-aligned rows and 128-lane columns;
            # padding stays zero (zero rows never match a window id, zero
            # columns ride with zero gradients) and is excluded from timing
            params = jnp.pad(params, ((0, (-V) % sw), (0, col_pad)))
        key = jax.random.PRNGKey(0)
        # warmup / compile.  NOTE: on the axon TPU backend block_until_ready
        # is unreliable (returns before execution); a host scalar fetch is
        # the only trustworthy synchronization — all timing syncs via
        # float(loss).
        print(f"bench: [{var['name']}] compiling + warmup...",
              file=sys.stderr, flush=True)
        key, sub = jax.random.split(key)
        params, loss = chunk_fn(params, tokens, sents, table.prob, table.alias,
                                scalars(0, 0.0), sub, *extra)
        float(loss)
        print(f"bench: [{var['name']}] timing...", file=sys.stderr, flush=True)
        # timed region: pipeline 16 chunks per sync to amortize dispatch
        t0 = time.perf_counter()
        chunks = 0
        words_done = 0.0
        while True:
            for _ in range(16):
                key, sub = jax.random.split(key)
                params, loss = chunk_fn(params, tokens, sents, table.prob,
                                        table.alias,
                                        scalars(chunks, words_done),
                                        sub, *extra)
                chunks += 1
                words_done += Sv * words_per_step
            float(loss)  # host fetch forces the dependency chain
            if time.perf_counter() - t0 > bench_seconds:
                break
        wps = words_done / (time.perf_counter() - t0)
        # release this variant's table buffer and compiled executables
        # before the next variant compiles: accumulated per-variant state
        # reproducibly wedges the remote backend (InvalidArgument on every
        # later variant) after ~3 heavy variants in one process
        del params, chunk_fn
        import gc
        gc.collect()
        jax.clear_caches()
        return wps

    # CPU smoke mode measures only the base config (minutes-per-variant there)
    variants = VARIANTS[:1] if forced_cpu else VARIANTS
    only = os.environ.get("W2B_BENCH_VARIANTS")
    if only and not forced_cpu:
        names = only.split(",")
        variants = [v for v in VARIANTS if v["name"] in names]
    best = None
    for vi, var in enumerate(variants):
        if vi and time.perf_counter() - t_start > CHILD_BUDGET:
            print("bench: child budget reached; skipping remaining variants",
                  file=sys.stderr, flush=True)
            break
        try:
            wps = run_variant(var)
        except Exception as e:
            # base MUST succeed (no result otherwise); a later variant's
            # failure only costs its upside
            if best is None:
                raise
            print(f"bench: [{var['name']}] failed: {e!r}",
                  file=sys.stderr, flush=True)
            continue
        print(f"bench: [{var['name']}] {wps:,.0f} words/sec",
              file=sys.stderr, flush=True)
        if best is None or wps > best["value"]:
            cfg_v = dict(CFG)
            cfg_v.update(var)
            best = {
                "metric": "train_words_per_sec_per_chip",
                "value": round(wps, 1),
                "unit": "words/sec",
                "vs_baseline": round(wps / baseline, 3) if baseline else None,
                "variant": var["name"],
                **roofline_fields(cfg_v, wps),
            }
            # record progressively: a kill mid-adjudication must not lose
            # the round's number (supervisor salvages PARTIAL_FILE)
            with open(PARTIAL_FILE + ".tmp", "w") as f:
                json.dump(best, f)
            os.replace(PARTIAL_FILE + ".tmp", PARTIAL_FILE)
            print(json.dumps(best), flush=True)


if __name__ == "__main__":
    if os.environ.get("W2B_BENCH_CHILD"):
        main()
    else:
        sys.exit(_supervise())
