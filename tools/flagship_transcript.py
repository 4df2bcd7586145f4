"""Shared transcript writer for the flagship tools.

One writer for tools/flagship_run.py and tools/flagship_complete.py so the
title/filename policy lives in exactly one place: the label derives from
the ACTUAL scale run (VERDICT r3 weak #2 — a smoke run must never publish
under the flagship label).
"""

import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGSHIP_VOCAB = 3_000_000
FLAGSHIP_TOKENS = 50_000_000

_BODY = ("streamed multi-segment multi-epoch training with bf16 fused "
         "tables + the sorted group-RMW scatter in in-place fori chunks "
         "(-scatter-impl grmw -loop-mode fori), full-state checkpoint "
         "+ resume, reference-format binary + packed export, full-vocab "
         "analogy evaluation, and a truncated-vocab cross-check against "
         "the compiled reference compute-accuracy binary.")


def write_transcript(transcript: dict, n_tokens: int, n_vocab: int,
                     size: int, producer: str, provenance: str = "") -> str:
    """Write the run transcript; returns the markdown path.

    Flagship-scale runs (>= 3M vocab AND >= 50M tokens) get the flagship
    title and docs/flagship_r4_transcript.md; anything smaller is filed and
    titled as a SMOKE run.  `provenance` is an optional extra paragraph
    (e.g. crash/completion history)."""
    at_flagship = n_vocab >= FLAGSHIP_VOCAB and n_tokens >= FLAGSHIP_TOKENS
    if at_flagship:
        md = os.path.join(REPO, "docs", "flagship_r5_transcript.md")
        title = (f"# Flagship end-to-end run ({n_vocab / 1e6:.1f}M x {size}d,"
                 " 1-bit, one v5e)\n\n"
                 "The full production path at the reference's headline scale "
                 "(reference README.md:39): ")
    else:
        md = os.path.join(REPO, "docs",
                          f"flagship_smoke_{n_tokens}_{n_vocab}.md")
        title = (f"# flagship SMOKE run ({n_vocab:,} vocab x {size}d "
                 f"on {n_tokens:,} tokens — NOT the flagship scale)\n\n"
                 "A reduced-scale exercise of the flagship path: ")
    prov = ("\n" + provenance.strip() + "\n") if provenance else ""
    with open(md, "w") as f:
        f.write(title + _BODY + f"  Produced by {producer}.\n" + prov +
                "\n```json\n" + json.dumps(transcript, indent=2) +
                "\n```\n\n"
                f"Generated {time.strftime('%Y-%m-%d %H:%M')}.\n")
    return md
