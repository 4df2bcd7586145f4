"""End-to-end FLAGSHIP run: 3.7M-vocab x 800d 1-bit training on one v5e.

The reference's headline artifact is the full-Wikipedia 3.7M-vocab 1-bit
800d vector set (reference README.md:39, 812 MB packed).  This tool
executes the whole production path end-to-end (VERDICT r2 item 3 /
ROADMAP 4d; round-5: multi-segment epochs + the fast capacity config +
the reference-evaluator cross-check, VERDICT r4 items 1/4/5): corpus ->
C++ vocab build -> bit-exact LCG init -> multi-epoch MULTI-SEGMENT
streamed training (bf16 fused tables, sorted group-RMW scatter in
in-place fori chunks + the fused context kernel — 3.45M words/sec at the flagship shape,
tools/capacity_ablate.py; --rmw selects the round-4 no-scan path) ->
full-state checkpoint -> resume for one more epoch -> reference-format
binary + packed export -> analogy evaluation at 3.7M rows -> truncated
cross-check against the compiled reference compute-accuracy binary.

Corpus: the structured-analogy generator (data/structured.py) supplies a
learnable core whose analogy accuracy is measurable by construction, and a
zipf tail of synthetic words pads the vocabulary to 3.7M distinct types
(every tail word appears at least once; zipf-weighted filler supplies
realistic frequency mass).  No network egress exists here, so this is the
provable stand-in for the 2B-word Wikipedia stream.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/flagship_run.py \
      [--host-epoch] [--tokens 60000000] [--vocab 3700000] [--skip-eval]

Writes the transcript to docs/flagship_r4_transcript.md when run at the
real flagship scale (>=3M vocab, >=50M tokens); reduced-scale runs are
titled and filed as SMOKE runs (docs/flagship_smoke_*.md) so a smoke can
never publish under the flagship label (VERDICT r3 weak #2).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

CACHE = os.path.join(REPO, ".bench_cache")
RUN = os.path.join(CACHE, "flagship")


def _arg(name, default, cast):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def make_corpus(path, questions, n_tokens, n_vocab, seed=0):
    """Structured core + zipf tail to n_vocab distinct words (chunked IO)."""
    from word2bits_tpu.data.structured import structured_corpus
    t0 = time.perf_counter()
    core = path + ".core"
    if not os.path.exists(core):
        # analogy-structured core scaled to ~27% of the corpus (~16M tokens
        # of signal at the 60M-token flagship scale — the text8 regime)
        n_core = min(1_200_000, max(1_000, n_tokens // 50))
        structured_corpus(core, questions, n_sentences=n_core, seed=seed)
    core_tokens = sum(len(l.split()) for l in open(core))
    n_tail_vocab = n_vocab - 600       # leave room for the core's ~541 types
    n_fill = max(n_tokens - core_tokens - n_tail_vocab, 0)
    rng = np.random.default_rng(seed + 1)
    with open(path, "w") as out:
        core_lines = open(core).readlines()
        ci = 0
        # enumerate every tail word once (min_count=1 keeps all of them),
        # zipf filler interleaved in blocks with core sentences
        enum = np.arange(n_tail_vocab, dtype=np.int64)
        rng.shuffle(enum)
        written = 0
        block = 200_000
        while written < n_tail_vocab or n_fill > 0 or ci < len(core_lines):
            if ci < len(core_lines):
                take = core_lines[ci:ci + 2000]
                out.writelines(take)
                ci += len(take)
            if written < n_tail_vocab:
                ids = enum[written:written + block]
                written += len(ids)
            elif n_fill > 0:
                take_n = min(block, n_fill)
                ids = np.minimum(rng.zipf(1.3, size=take_n) - 1,
                                 n_tail_vocab - 1)
                n_fill -= take_n
            else:
                ids = None
            if ids is not None and len(ids):
                words = np.char.add("t", ids.astype(str))
                for lo in range(0, len(words), 12):
                    out.write(" ".join(words[lo:lo + 12]) + "\n")
    print(f"corpus: {path} built in {time.perf_counter() - t0:.0f}s",
          flush=True)


def main():
    os.makedirs(RUN, exist_ok=True)
    n_tokens = _arg("--tokens", 60_000_000, int)
    n_vocab = _arg("--vocab", 3_700_000, int)
    corpus = os.path.join(RUN, f"corpus_{n_tokens}_{n_vocab}.txt")
    questions = os.path.join(RUN, "questions.txt")
    transcript = {"config": dict(tokens=n_tokens, vocab=n_vocab)}

    if not os.path.exists(corpus):
        make_corpus(corpus, questions, n_tokens, n_vocab)

    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.train import train

    out = os.path.join(RUN, "vectors.bin")
    ckpt = os.path.join(RUN, "ckpt")
    # round-5 capacity config: sorted group-RMW scatter in in-place fori
    # chunks + banded windowed sums — 6.16 ms/step / 2.66M words/sec at
    # this shape (tools/capacity_ablate.py grmw_fori32_banded, v5e
    # 2026-08-20) vs the round-4 rmw/no-scan path's 28.2 ms.  --rmw runs
    # the old path for comparison.
    seg_tokens = _arg("--segment", 1 << 24, int)  # 16M => 4 segments at 60M
    if "--rmw" in sys.argv:
        speed = dict(rmw_scatter=True, steps_per_chunk=1)
    else:
        speed = dict(scatter_impl="grmw", loop_mode="fori",
                     steps_per_chunk=32, banded_tile=256,
                     context_pallas=True)
    common = dict(
        train_file=corpus, output_file=out, binary=True, packed=True,
        bitlevel=1, size=_arg("--size", 800, int), window=5, negative=10,
        min_count=1, sample=1e-4, alpha=0.05,
        batch_size=_arg("--batch", 16384, int), neg_sharing=64,
        fused_tables=True, dtype="bfloat16", **speed,
        segment_tokens=seg_tokens,
        checkpoint_dir=ckpt, debug=2, seed=1,
        # every checkpoint at this scale is a ~12 GB blocked tunnel fetch;
        # one per leg (after the leg's final epoch) is the resume evidence
        checkpoint_every_epoch=False,
        device_epoch=(False if "--host-epoch" in sys.argv else None),
    )
    transcript["config"]["segments_per_epoch"] = -(-n_tokens // seg_tokens)
    transcript["config"]["speed_flags"] = speed

    t0 = time.perf_counter()
    # leg 1 trains + checkpoints but skips the vector export (the resume
    # leg overwrites it anyway; at flagship scale the export is another
    # full-table fetch + an 11.8 GB file write)
    cfg = Word2BitsConfig(iter=2, **dict(common, output_file=None))
    res = train(cfg)
    t_train = time.perf_counter() - t0
    transcript["train"] = dict(
        epochs=2, wall_s=round(t_train, 1),
        words_per_sec=round(res.words_per_sec),
        table_fetch_s=res.fetch_s,
        epoch_losses=[round(l, 1) for l in res.epoch_losses],
        steps=res.steps, vocab_size=res.vocab.size)
    print(json.dumps(transcript["train"]), flush=True)

    # resume from the epoch-2 checkpoint and train one more epoch — the
    # full-state resume path at flagship scale (resume=True: without it a
    # second leg silently retrains from scratch)
    t0 = time.perf_counter()
    cfg3 = Word2BitsConfig(iter=3, resume=True, **common)
    res3 = train(cfg3)
    transcript["resume"] = dict(
        extra_epochs=1, wall_s=round(time.perf_counter() - t0, 1),
        words_per_sec=round(res3.words_per_sec),
        table_fetch_s=res3.fetch_s,
        epoch_losses=[round(l, 1) for l in res3.epoch_losses])
    print(json.dumps(transcript["resume"]), flush=True)

    sizes = {}
    for p in (out, out + ".pack"):
        if os.path.exists(p):
            sizes[os.path.basename(p)] = os.path.getsize(p)
    transcript["artifacts"] = sizes

    if "--skip-eval" not in sys.argv:
        t0 = time.perf_counter()
        from word2bits_tpu.eval.analogy import (evaluate_analogies,
                                                load_questions)
        from word2bits_tpu.io.vectors import read_vectors
        words, vectors = read_vectors(out)
        res_e = evaluate_analogies(words, vectors, load_questions(questions),
                                   bitlevel=0)
        transcript["eval"] = dict(
            rows=len(words), wall_s=round(time.perf_counter() - t0, 1),
            total_accuracy=round(res_e.total_accuracy, 2),
            coverage=round(res_e.coverage, 2))
        print(json.dumps(transcript["eval"]), flush=True)
        del words, vectors

    if "--skip-crosscheck" not in sys.argv and "--skip-eval" not in sys.argv:
        # cross-check the ACTUAL flagship artifact against the compiled
        # reference evaluator at a vocab truncation it can afford
        # (reference src/compute-accuracy.c:86 `threshold` — VERDICT r4
        # item 5): both evaluators read the same vectors.bin truncated to
        # the top `threshold` count-sorted rows; accuracies must agree.
        import subprocess
        threshold = _arg("--threshold", 50_000, int)
        exe = os.path.join(RUN, "ref-accuracy")
        if not os.path.exists(exe):
            subprocess.run(["gcc", "/root/reference/src/compute-accuracy.c",
                            "-o", exe, "-lm", "-O2"], check=True)
        t0 = time.perf_counter()
        ref_out = subprocess.run(
            [exe, out, "0", str(threshold)], stdin=open(questions),
            capture_output=True, text=True, timeout=7200).stdout
        ref_line = [ln for ln in ref_out.splitlines()
                    if ln.startswith("Questions seen")][-1]
        ref_total = [ln for ln in ref_out.splitlines()
                     if "Total accuracy" in ln][-1]
        from word2bits_tpu.io.vectors import read_vectors as _rv
        words_t, vecs_t = _rv(out, max_words=threshold)
        res_t = evaluate_analogies(words_t, vecs_t,
                                   load_questions(questions), bitlevel=0)
        ref_pct = float(ref_total.split("Total accuracy:")[1]
                        .split("%")[0])
        transcript["crosscheck"] = dict(
            threshold=threshold,
            ref_total_line=ref_total.strip(),
            ref_seen_line=ref_line.strip(),
            ours_total_accuracy=round(res_t.total_accuracy, 2),
            ours_coverage=round(res_t.coverage, 2),
            agree_within_pt=round(abs(ref_pct - res_t.total_accuracy), 2),
            wall_s=round(time.perf_counter() - t0, 1))
        print(json.dumps(transcript["crosscheck"]), flush=True)

    from flagship_transcript import write_transcript
    md = write_transcript(transcript, n_tokens, n_vocab,
                          _arg("--size", 800, int), "tools/flagship_run.py")
    print(f"wrote {md}", flush=True)


if __name__ == "__main__":
    main()
