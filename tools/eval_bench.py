"""Evaluator throughput: our batched-matmul analogy evaluator vs the
reference compute-accuracy scalar scan, on the same vector file and the full
19,544-question Google analogies set.

Constructs a 71k-word x 200d vector file whose vocabulary includes every
question word (so both evaluators resolve every question and scan the full
vocabulary per question, like a real text8 run).  Writes docs/eval_bench.md.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

QUESTIONS = "/root/reference/data/google_analogies_test_set/questions-words.txt"
V, D = 71_000, 200


def main():
    from word2bits_tpu.eval.analogy import evaluate_analogies, load_questions
    from word2bits_tpu.io.vectors import read_vectors, write_vectors

    questions = load_questions(QUESTIONS)
    qwords = []
    seen = set()
    for _, a, b, c, d in questions.questions:
        for w in (a, b, c, d):
            lw = w.lower()
            if lw not in seen:
                seen.add(lw)
                qwords.append(lw)
    fillers = [f"filler{i}" for i in range(V - len(qwords))]
    words = qwords + fillers
    rng = np.random.default_rng(0)
    vecs = rng.uniform(-0.5, 0.5, (V, D)).astype(np.float32)

    vec_path = "/tmp/evalbench_vectors.bin"
    write_vectors(vec_path, words, vecs, binary=True)

    # ours (includes load + device transfer + compile)
    t0 = time.perf_counter()
    w2, m2 = read_vectors(vec_path)
    res = evaluate_analogies(w2, m2, questions, bitlevel=0)
    ours_total = time.perf_counter() - t0
    # warm second pass (compile cached)
    t0 = time.perf_counter()
    res2 = evaluate_analogies(w2, m2, questions, bitlevel=0)
    ours_warm = time.perf_counter() - t0
    assert res.seen_questions == len(questions.questions), res.seen_questions

    # reference binary
    exe = "/tmp/ref_compute_accuracy_bench"
    if not os.path.exists(exe):
        subprocess.run(["gcc", "/root/reference/src/compute-accuracy.c",
                        "-o", exe, "-lm", "-O2"], check=True,
                       capture_output=True)
    t0 = time.perf_counter()
    proc = subprocess.run([exe, vec_path, "0", "0"],
                          stdin=open(QUESTIONS), capture_output=True,
                          timeout=36000)
    ref_total = time.perf_counter() - t0
    ref_out = proc.stdout.decode()

    # cross-check the total-accuracy line
    import re
    m = re.findall(r"Total accuracy: ([\d.]+) %", ref_out)
    ref_acc = float(m[-1]) if m else float("nan")

    lines = [
        "# Analogy-evaluator throughput (19,544 questions, 71k x 200 vocab)",
        "",
        f"| evaluator | wall | accuracy |",
        f"|---|---|---|",
        f"| reference compute-accuracy (C, 1 core) | {ref_total:.1f} s "
        f"| {ref_acc:.2f} % |",
        f"| ours, cold (load+compile+eval, TPU) | {ours_total:.1f} s "
        f"| {res.total_accuracy:.2f} % |",
        f"| ours, warm | {ours_warm:.1f} s | {res2.total_accuracy:.2f} % |",
        "",
        f"Speedup: {ref_total / ours_warm:.0f}x warm, "
        f"{ref_total / ours_total:.0f}x cold.",
        f"Accuracy agreement: {'YES' if abs(ref_acc - res.total_accuracy) < 0.05 else 'CHECK'}",
    ]
    out = "\n".join(lines)
    print(out)
    with open(os.path.join(REPO, "docs", "eval_bench.md"), "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
