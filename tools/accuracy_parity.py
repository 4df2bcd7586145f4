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


def ensure_corpus(fast=False):
    os.makedirs(CACHE, exist_ok=True)
    tag = "fast" if fast else "full"
    corpus = os.path.join(CACHE, f"structured_{tag}.txt")
    questions = os.path.join(CACHE, f"structured_{tag}_questions.txt")
    if not (os.path.exists(corpus) and os.path.exists(questions)):
        from word2bits_tpu.data.structured import structured_corpus
        structured_corpus(corpus, questions,
                          n_sentences=30_000 if fast else 120_000,
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


def run_ours(corpus, out, bitlevel, iters, neg_sharing):
    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.train import train

    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, binary=True,
        bitlevel=bitlevel, size=HYPER["size"], window=HYPER["window"],
        negative=HYPER["negative"], iter=iters,
        min_count=HYPER["min_count"], sample=HYPER["sample"],
        alpha=HYPER["alpha"], batch_size=512, steps_per_chunk=64,
        neg_sharing=neg_sharing, debug=1)
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


def main():
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    fast = "--fast" in sys.argv
    corpus, questions = ensure_corpus(fast)
    exe = build_reference()
    iters = 3 if fast else HYPER["iters"]

    # incremental rows: a crashed/killed run keeps its finished configs
    rows_path = os.path.join(CACHE, f"parity_rows_{'fast' if fast else 'full'}.jsonl")
    rows = []
    if os.path.exists(rows_path) and "--fresh" not in sys.argv:
        rows = [json.loads(l) for l in open(rows_path) if l.strip()]
    done = {(r["bitlevel"], r["mode"]) for r in rows}

    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]  # e.g. "1:shared-16"

    for bitlevel in (1, 0, 2):
        wanted = [(s, l) for s, l in ((0, "per-center"), (16, "shared-16"))
                  if (bitlevel, l) not in done
                  and (only is None or only == f"{bitlevel}:{l}")]
        if not wanted:
            continue
        ref_out = f"/tmp/parity_ref_b{bitlevel}.bin"
        ref_t = run_reference(exe, corpus, ref_out, bitlevel, iters)
        ref_acc, ref_cov = evaluate(ref_out, questions)

        for sharing, label in wanted:
            our_out = f"/tmp/parity_ours_b{bitlevel}_{sharing}.bin"
            our_t = run_ours(corpus, our_out, bitlevel, iters, sharing)
            our_acc, our_cov = evaluate(our_out, questions)
            rows.append(dict(bitlevel=bitlevel, mode=label,
                             ref_acc=ref_acc, our_acc=our_acc,
                             ref_cov=ref_cov, our_cov=our_cov,
                             ref_time=ref_t, our_time=our_t))
            with open(rows_path, "a") as f:
                f.write(json.dumps(rows[-1]) + "\n")
            print(json.dumps(rows[-1]), flush=True)

    with open(os.path.join(REPO, "ACCEPTANCE.md"), "w") as f:
        f.write("# Convergence-parity acceptance (structured-analogy corpus)\n\n")
        f.write("Offline equivalent of the README text8 acceptance run "
                "(no network egress; see word2bits_tpu/data/structured.py).\n"
                "Reference = original C++ binary, 4 threads, this container's "
                "CPU. Ours = TPU v5e single chip.\n\n")
        f.write("| bitlevel | mode | ref acc % | ours acc % | ref s | ours s |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['bitlevel']} | {r['mode']} | {r['ref_acc']:.2f} "
                    f"| {r['our_acc']:.2f} | {r['ref_time']:.1f} "
                    f"| {r['our_time']:.1f} |\n")
        f.write(f"\nGenerated {time.strftime('%Y-%m-%d %H:%M')} by "
                "tools/accuracy_parity.py" + (" --fast" if fast else "") + ".\n")
        notes = os.path.join(REPO, "docs", "acceptance_notes.md")
        if os.path.exists(notes):
            f.write("\n" + open(notes).read())
    print("wrote ACCEPTANCE.md")


if __name__ == "__main__":
    main()
