"""Command-line entry points mirroring the two reference binaries.

`word2bits` trainer: same flag spellings/defaults as the reference argv scan
(reference src/word2bits.cpp:591-621) — e.g.

    python -m word2bits_tpu.cli train -train text8 -output vec.bin \
        -size 200 -window 8 -negative 24 -iter 5 -min-count 5 -bitlevel 1 -binary 1

`compute_accuracy` evaluator: same positional interface as the reference
(reference src/compute-accuracy.c:73-79): FILE [bitlevel] [threshold], with
questions on stdin (or -questions FILE).
"""

from __future__ import annotations

import os
import sys

from word2bits_tpu.config import config_from_argv


def _maybe_force_cpu():
    """W2B_FORCE_CPU=1 pins the CPU backend (works even though sitecustomize
    pre-imports jax: the config update lands before first backend use)."""
    if os.environ.get("W2B_FORCE_CPU"):
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def train_main(argv=None) -> int:
    _maybe_force_cpu()
    argv = sys.argv[1:] if argv is None else argv
    cfg = config_from_argv(argv)
    if cfg.train_file is None:
        print("word2bits_tpu trainer\n"
              "Required: -train <file>. Optional flags (reference-compatible):\n"
              "  -output -bitlevel -size -window -negative -alpha -sample\n"
              "  -min-count -iter -reg -binary -debug -save-every-epoch\n"
              "  -save-vocab -read-vocab -classes -threads\n"
              "Extensions: -batch-size -seed\n"
              "Subcommands: train (default) | accuracy FILE [bitlevel "
              "threshold] | convert IN OUT | nearest FILE [words...] | "
              "tune -train FILE")
        return 0
    from word2bits_tpu.train import prepare, train

    print(f"Starting training using file {cfg.train_file}")
    if not cfg.output_file:
        # reference: vocab build (and optional -save-vocab) only, no training
        # (reference src/word2bits.cpp:527 returns before InitNet)
        prepare(cfg)
        return 0
    train(cfg)
    return 0


def accuracy_main(argv=None) -> int:
    _maybe_force_cpu()
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("Usage: compute-accuracy <FILE> <bitlevel> <threshold> "
              "[-questions FILE]\nwhere FILE contains word projections "
              "(questions on stdin unless -questions is given)")
        return 0
    questions_path = None
    if "-questions" in argv:
        i = argv.index("-questions")
        questions_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]

    path = argv[0]
    bitlevel = int(argv[1]) if len(argv) > 1 else 0
    threshold = int(argv[2]) if len(argv) > 2 else 0

    from word2bits_tpu.eval.analogy import (
        evaluate_analogies, format_report, load_questions)
    from word2bits_tpu.io.packed import MAGIC, read_packed
    from word2bits_tpu.io.vectors import read_vectors

    with open(path, "rb") as f:
        is_packed = f.read(len(MAGIC)) == MAGIC
    if is_packed:
        # -packed 1 output (extension): bit-packed 1/2-bit vectors
        words, vectors, _ = read_packed(path)
        if threshold:
            words, vectors = words[:threshold], vectors[:threshold]
    else:
        words, vectors = read_vectors(path, max_words=threshold)
    print("Starting eval...", flush=True)
    if questions_path is None and sys.stdin.isatty():
        # interactive invocation with no -questions: default to the Google
        # analogies set shipped with the reference checkout (public data)
        default_q = ("/root/reference/data/google_analogies_test_set/"
                     "questions-words.txt")
        if os.path.exists(default_q):
            questions_path = default_q
    if questions_path:
        questions = load_questions(questions_path)
    else:
        import tempfile
        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as tf:
            tf.write(sys.stdin.read())
            tmp = tf.name
        try:
            questions = load_questions(tmp)
        finally:
            os.unlink(tmp)
    result = evaluate_analogies(words, vectors, questions,
                                bitlevel=bitlevel, threshold=threshold)
    print(format_report(result))
    return 0


def convert_main(argv=None) -> int:
    """Post-training vector-file converter (extension).

    Usage: convert IN OUT [-bitlevel B] [-binary 0|1] [-packed 1]
                          [-threshold N]

    Reads any format this stack produces or the reference catalog ships
    (text / binary / gzip'd text, sniffed like read_vectors; our bit-packed
    .pack via magic), optionally RE-quantizes rows at -bitlevel exactly as
    the reference evaluator does at load (reference
    src/compute-accuracy.c:106), and writes text (-binary 0, default),
    binary (-binary 1), or actually-bit-packed (-packed 1, grids of
    bitlevel 1/2 only) — materializing the reference README's 8-16x
    storage-compression claim (reference README.md:3-5) as files instead of
    gzip.  -threshold truncates to the top-N (count-sorted) rows like the
    evaluator's threshold argument (src/compute-accuracy.c:86).
    Host-only: never touches a device backend.
    """
    argv = sys.argv[1:] if argv is None else argv
    pos, flags = [], {}
    i = 0
    while i < len(argv):
        if argv[i].startswith("-") and not argv[i][1:].isdigit():
            if i + 1 >= len(argv):
                print(f"missing value for {argv[i]}", file=sys.stderr)
                return 1
            flags[argv[i]] = argv[i + 1]
            i += 2
        else:
            pos.append(argv[i])
            i += 1
    if len(pos) != 2:
        print("Usage: convert IN OUT [-bitlevel B] [-binary 0|1] "
              "[-packed 1] [-threshold N]")
        return 0 if not pos else 1
    src, dst = pos
    bitlevel = int(flags.get("-bitlevel", 0))
    binary = bool(int(flags.get("-binary", 0)))
    packed = bool(int(flags.get("-packed", 0)))
    threshold = int(flags.get("-threshold", 0))

    from word2bits_tpu.io.packed import MAGIC, read_packed, write_packed
    from word2bits_tpu.io.vectors import read_vectors, write_vectors
    from word2bits_tpu.ops.quantize import quantize_np

    with open(src, "rb") as f:
        is_packed = f.read(len(MAGIC)) == MAGIC
    if is_packed:
        words, vectors, src_bitlevel = read_packed(src)
    else:
        words, vectors = read_vectors(src)
        src_bitlevel = 0
    if threshold:
        words, vectors = words[:threshold], vectors[:threshold]
    if bitlevel:
        vectors = quantize_np(vectors, bitlevel)
    out_bitlevel = bitlevel or src_bitlevel
    if packed:
        if out_bitlevel not in (1, 2):
            print(f"-packed needs vectors on a 1- or 2-bit grid; pass "
                  f"-bitlevel 1|2 (got bitlevel {out_bitlevel})",
                  file=sys.stderr)
            return 1
        write_packed(dst, words, vectors, out_bitlevel)
    else:
        write_vectors(dst, words, vectors, binary=binary)
    import os as _os
    print(f"{len(words)} x {vectors.shape[1]} -> {dst} "
          f"({_os.path.getsize(dst)} bytes)")
    return 0


def nearest_main(argv=None) -> int:
    """Nearest-neighbor queries (extension; the original word2vec ships an
    equivalent `distance` tool — the Word2Bits reference dropped it, keeping
    only the analogy evaluator).

    Usage: nearest FILE [words...] [-topk N] [-bitlevel B]

    Prints the top-N cosine neighbors per query word; with no words, reads
    queries from stdin (one per line, EXIT quits).  -bitlevel requantizes at
    load exactly like the evaluator (reference src/compute-accuracy.c:106).
    Host-only numpy (one V-dot matvec per query).
    """
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("Usage: nearest FILE [words...] [-topk N] [-bitlevel B]")
        return 0
    topk, bitlevel = 10, 0
    if "-topk" in argv:
        i = argv.index("-topk")
        topk = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "-bitlevel" in argv:
        i = argv.index("-bitlevel")
        bitlevel = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    path, queries = argv[0], argv[1:]

    import numpy as np

    from word2bits_tpu.io.packed import MAGIC, read_packed
    from word2bits_tpu.io.vectors import read_vectors
    from word2bits_tpu.ops.quantize import quantize_np

    with open(path, "rb") as f:
        is_packed = f.read(len(MAGIC)) == MAGIC
    if is_packed:
        words, vectors, _ = read_packed(path)
    else:
        words, vectors = read_vectors(path)
    if bitlevel:
        vectors = quantize_np(vectors, bitlevel)
    norms = np.linalg.norm(vectors, axis=1)
    m = vectors / np.maximum(norms, 1e-12)[:, None]
    # evaluator-style uppercase lookup (reference src/compute-accuracy.c:104)
    index = {}
    for i, w in enumerate(words):
        index.setdefault(w.upper(), i)

    def show(q: str) -> None:
        i = index.get(q.upper())
        if i is None:
            print(f"{q}: not in vocabulary")
            return
        sims = m @ m[i]
        sims[i] = -np.inf
        top = np.argsort(-sims)[:topk]
        print(f"{q}:")
        for j in top:
            print(f"  {words[j]:<24s} {sims[j]:.6f}")

    if queries:
        for q in queries:
            show(q)
        return 0
    for line in sys.stdin:
        q = line.strip()
        if not q or q == "EXIT":
            break
        show(q)
    return 0


def tune_main(argv=None) -> int:
    """Throughput auto-tuner (extension; see word2bits_tpu/tune.py).

    Usage: tune -train FILE [reference/extension flags...]
                [-tune-seconds S] [-json 1]

    Measures the quality-safe step variants (fused/pooled negatives,
    hot/cold scatter split, dense-hot negatives, banded windowed sums,
    bf16) on YOUR corpus and backend for a few seconds each and prints the
    flags worth adding to the train command.
    """
    _maybe_force_cpu()
    argv = list(sys.argv[1:] if argv is None else argv)

    def take(flag, parse, default):
        if flag not in argv:
            return default
        i = argv.index(flag)
        if i + 1 >= len(argv):
            sys.exit(f"Argument missing for {flag}")
        try:
            val = parse(argv[i + 1])
        except ValueError:
            sys.exit(f"Bad value for {flag}: {argv[i + 1]!r}")
        del argv[i:i + 2]
        return val

    seconds = take("-tune-seconds", float, 4.0)
    as_json = bool(take("-json", int, 0))
    max_variants = take("-tune-max-variants", int, 0) or None
    cfg = config_from_argv(argv)
    if cfg.train_file is None:
        print("Usage: tune -train FILE [flags...] [-tune-seconds S] "
              "[-tune-max-variants N] [-json 1]")
        return 0
    from word2bits_tpu.tune import run_tune
    return run_tune(cfg, seconds=seconds, as_json=as_json,
                    max_variants=max_variants)


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "train":
        return train_main(args[1:])
    if args and args[0] in ("accuracy", "compute-accuracy"):
        return accuracy_main(args[1:])
    if args and args[0] == "convert":
        return convert_main(args[1:])
    if args and args[0] in ("nearest", "distance"):
        return nearest_main(args[1:])
    if args and args[0] == "tune":
        return tune_main(args[1:])
    # bare invocation with reference flags -> trainer
    return train_main(args)


if __name__ == "__main__":
    sys.exit(main())
