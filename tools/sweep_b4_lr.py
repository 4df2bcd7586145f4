"""LR sweep at bitlevel 4 (structured corpus, per-center mode).

The auto-LR rule (config.py lr_scale) was measured at bitlevels 0-2; the
round-2 parity table shows bitlevel 4 landing just below the reference at
factor 1.0 (53.9 vs 55.2).  This sweep measures factors 1.5/2/3 so the rule
can be extended with data rather than guessed.  Reference quantization branch
under test: round |x| to nearest 1/2^(bitlevel-1), clip to 1
(/root/reference/src/word2bits.cpp:100-105).

Usage: python tools/sweep_b4_lr.py [--bitlevel N] [--seeds N]
                                   [factor[:batch] ...]
(bitlevel defaults to 4; batch defaults to the parity harness's 512.
Round 5: the bitlevel-8 B/LR sweep at 5 seeds — VERDICT r4 item 7.)
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.accuracy_parity import HYPER, ensure_corpus, evaluate  # noqa: E402


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from word2bits_tpu.config import Word2BitsConfig
    from word2bits_tpu.train import train

    args = sys.argv[1:]
    bitlevel = 4
    if "--bitlevel" in args:
        i = args.index("--bitlevel")
        bitlevel = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    seeds = 3
    if "--seeds" in args:
        i = args.index("--seeds")
        seeds = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    specs = []
    for a in args or ["1.5", "2.0", "3.0"]:
        fac, _, batch = a.partition(":")
        specs.append((float(fac), int(batch) if batch else 512))
    corpus, questions = ensure_corpus(fast=False)
    for fac, batch in specs:
        accs = []
        for s in range(seeds):
            out = f"/tmp/sweep_b{bitlevel}_{fac}_{batch}_{s}.bin"
            cfg = Word2BitsConfig(
                train_file=corpus, output_file=out, binary=True,
                bitlevel=bitlevel, size=HYPER["size"], window=HYPER["window"],
                negative=HYPER["negative"], iter=HYPER["iters"],
                min_count=HYPER["min_count"], sample=HYPER["sample"],
                alpha=HYPER["alpha"] * fac, auto_lr=False,
                batch_size=batch, steps_per_chunk=64,
                neg_sharing=0, debug=1, seed=s + 1)
            train(cfg)
            acc, _ = evaluate(out, questions)
            accs.append(acc)
        import statistics
        print(json.dumps(dict(bitlevel=bitlevel, factor=fac, batch=batch,
                              accs=accs, mean=round(sum(accs) / len(accs), 2),
                              std=round(statistics.stdev(accs), 2)
                              if len(accs) > 1 else 0.0)), flush=True)


if __name__ == "__main__":
    main()
