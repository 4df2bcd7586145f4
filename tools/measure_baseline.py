"""Measure the reference C++ binary's training throughput on this container,
on the SAME synthetic corpus and hyperparameters bench.py uses, and store it
in bench_baseline.json as the vs_baseline denominator.

The reference publishes no throughput numbers (SURVEY.md section 6), so the
honest baseline is: compile /root/reference/src/word2bits.cpp as-is (in /tmp,
never into this repo) and time a full epoch with 4 threads on this machine.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.join(REPO, ".bench_cache")
OUT = os.path.join(REPO, "bench_baseline.json")

# must mirror bench.py
N_TOKENS = 4_000_000
VOCAB = 70_000
THREADS = 4


def main():
    os.makedirs(CACHE, exist_ok=True)
    corpus = os.path.join(CACHE, f"zipf_{N_TOKENS}_{VOCAB}.txt")
    if not os.path.exists(corpus):
        from word2bits_tpu.data.synthetic import zipf_corpus
        zipf_corpus(corpus, n_tokens=N_TOKENS, vocab=VOCAB)

    exe = "/tmp/word2bits_ref_bench"
    subprocess.run(
        ["g++", "/root/reference/src/word2bits.cpp", "-o", exe,
         "-lm", "-pthread", "-O3", "-march=native", "-funroll-loops",
         "-Wno-unused-result"],
        check=True, capture_output=True)

    out_vec = "/tmp/ref_bench_vectors.bin"
    cmd = [exe, "-train", corpus, "-output", out_vec,
           "-size", "200", "-window", "8", "-negative", "24",
           "-bitlevel", "1", "-min-count", "5", "-sample", "1e-3",
           "-threads", str(THREADS), "-iter", "1", "-binary", "1",
           "-debug", "1"]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, capture_output=True, timeout=3600)
    wall = time.perf_counter() - t0
    stdout = proc.stdout.decode()

    m = re.search(r"Words in train file: (\d+)", stdout)
    train_words = int(m.group(1))
    # subtract vocab-scan + output-write time? The reference's own telemetry
    # counts only training; approximate by re-timing the vocab pass alone.
    t1 = time.perf_counter()
    subprocess.run([exe, "-train", corpus, "-output", "", "-min-count", "5",
                    "-debug", "0"], capture_output=True, timeout=3600)
    prep_wall = time.perf_counter() - t1
    train_wall = max(wall - prep_wall, 1e-6)
    wps = train_words / train_wall

    result = {
        "words_per_sec": wps,
        "train_words": train_words,
        "train_wall_sec": train_wall,
        "total_wall_sec": wall,
        "threads": THREADS,
        "config": "size 200 window 8 negative 24 bitlevel 1 iter 1",
        "corpus": f"synthetic zipf {N_TOKENS} tokens, {VOCAB} types",
        "provenance": "reference word2bits.cpp compiled -O3 -march=native, "
                      "timed on this container's CPU",
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
