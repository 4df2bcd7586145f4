"""Throughput auto-tuner (extension): measure the quality-safe step
variants on the USER'S corpus, flags, and backend, and print the flags
worth adding.

The reference exposes exactly one performance knob (-threads,
src/word2bits.cpp:609); this stack has several (fused tables, shared/pooled
negatives, hot/cold scatter split, dense-hot negatives, banded windowed
sums) whose win depends on corpus shape and chip.  `cli tune` runs each
candidate through build_engine — the SAME construction train() uses — for a
few seconds and reports measured words/sec, so users do not have to reason
about scatter floors to get the fast configuration.  bench.py performs the
same adjudication for the fixed benchmark corpus.

Quality notes printed per variant (details: ARCHITECTURE.md, ACCEPTANCE.md):
  - hot-rows / banded produce the SAME updates as the base step
    (restructured scatter / float-order-only);
  - fused+shared pools negatives across tile centers (-neg-pool P lowers
    the sharing degree to G/P; pool2 is the measured quality/throughput
    sweet spot at text8 scale — docs/acceptance_benchcfg.md);
  - dense-hot replaces sampled hot negatives with their exact expectation
    (measured at-or-above sampled quality at reference defaults);
  - bf16 halves table HBM; validated at/above f32 convergence.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from word2bits_tpu.config import Word2BitsConfig

# overlay-field -> CLI flag spelling (for the printed recommendation)
_FLAG = {
    "fused_tables": ("-fused-tables", lambda v: "1"),
    "neg_sharing": ("-neg-sharing", str),
    "neg_pool": ("-neg-pool", str),
    "hot_rows": ("-hot-rows", str),
    "neg_dense_hot": ("-neg-dense-hot", lambda v: "1"),
    "banded_tile": ("-banded-tile", str),
    "scatter_impl": ("-scatter-impl", str),
    "context_pallas": ("-context-pallas", lambda v: "1"),
    "dtype": ("-dtype", str),
    "steps_per_chunk": ("-steps-per-chunk", str),
}


def _flags(overlay: Dict) -> str:
    parts = []
    for k, v in overlay.items():
        flag, render = _FLAG[k]
        parts.append(f"{flag} {render(v)}")
    return " ".join(parts)


def variants(cfg: Word2BitsConfig, V: int) -> List[Tuple[str, Dict, str]]:
    """(name, overlay, quality-note) candidates valid for cfg and V."""
    out = [("as-given", {}, "your flags unchanged")]
    if cfg.mesh_shape:
        return out  # mesh overlays not offered; measure the config as-is
    hot_sg = max(64, min(2048, V // 8))
    hot_sg = min(hot_sg, V - 1)
    if cfg.model == "skipgram":
        if hot_sg > 0 and not cfg.neg_dense_hot:
            out.append(("dense-hot", dict(hot_rows=hot_sg,
                                          neg_dense_hot=True),
                        "estimator change: verify quality on your corpus "
                        "(shape-dependent; see ACCEPTANCE.md)"))
        if cfg.dtype == "float32":
            out.append(("bf16", dict(dtype="bfloat16"),
                        "bf16 backing store (validated at/above f32 "
                        "convergence)"))
        return out
    B = cfg.batch_size
    G = cfg.neg_sharing or max(
        (g for g in (64, 32, 16, 8, 4, 2, 1) if B % g == 0))
    hot = max(256, min(2048, V // 8))
    hot = min(hot, V - 1)
    fused = dict(fused_tables=True, neg_sharing=G)
    if not (cfg.fused_tables and cfg.neg_sharing):
        # pool2 is the measured quality/throughput sweet spot at text8
        # scale (8-seed strong-criterion rows, docs/acceptance_benchcfg.md:
        # pool2 68.3±4.4 at 14.2M words/sec vs pool8 70.1±4.7 at 7.6M)
        pool = 2 if G % 2 == 0 else 1
        out.append(("fused-pool", dict(fused, neg_pool=pool),
                    "pooled negatives (sharing degree G/P; see -neg-pool)"))
    if hot > 0:
        out.append(("hot-rows", dict(fused, hot_rows=hot),
                    "same updates, scatter restructured"))
        if cfg.bitlevel >= 4:
            # measured quality cliff at fine grids: dense-hot at bitlevel 4
            # sits 7+ points below per-center (48.5±0.9 vs 56.0±1.4,
            # ACCEPTANCE.md) — don't offer it as a tuning candidate there
            # (VERDICT r4 item 7); users can still pass -neg-dense-hot
            # explicitly, and config warns
            pass
        else:
            out.append(("dense-hot", dict(fused, hot_rows=hot,
                                          neg_dense_hot=True),
                        "estimator change: quality is shape-dependent "
                        "(above sampled at reference-default shapes, below "
                        "at B=8192 text8-scale — verify on your corpus)"))
    bt = next((t for t in (256, 128) if B % t == 0), 0)
    if bt:
        out.append(("banded", dict(fused, banded_tile=bt),
                    "same sums, float order differs"))
        # the round-5 bench winners: spanning-sweep scatter and the fused
        # context kernel (update-equal modulo float order; the kernel
        # needs reg == 0)
        out.append(("span-banded", dict(fused, banded_tile=bt,
                                        scatter_impl="span"),
                    "sorted sweep scatter; update-equal (float order)"))
        if not cfg.reg:
            out.append(("ctx-span-banded",
                        dict(fused, banded_tile=bt, scatter_impl="span",
                             context_pallas=True),
                        "fused context kernel + span; update-equal "
                        "(float order)"))
    # scan-chunk size: the measured top lever on the tunnel-latency v5e
    # (step_bench 2026-08-19: S=128 +22% over S=16) — dispatch grouping
    # only, same estimator; skip when the user already runs big chunks or
    # the no-scan capacity path (S=1 exists to halve peak HBM)
    if 1 < cfg.steps_per_chunk < 64:
        out.append(("chunk64", dict(steps_per_chunk=64),
                    "same math, fewer dispatches (scan 64 steps/chunk)"))
        if bt:
            out.append(("banded-chunk64",
                        dict(fused, banded_tile=bt, steps_per_chunk=64),
                        "banded + 64-step chunks (the bench winner's "
                        "shape, 2026-08-19)"))
    if cfg.dtype == "float32":
        out.append(("bf16", dict(fused, dtype="bfloat16"),
                    "bf16 backing store (validated at/above f32 "
                    "convergence)"))
    return out


def measure(cfg: Word2BitsConfig, vocab, ep, capacity: int,
            seg_tokens: int, source_len: int,
            seconds: float = 4.0, group: int = 8) -> float:
    """words/sec of cfg's engine on the prepared epoch arrays.

    Counts corpus words consumed (the reference word_count_actual
    accounting, src/word2bits.cpp:379-393) like train()/bench.py.
    Sync is a host loss fetch — block_until_ready is unreliable on the
    axon backend (CLAUDE.md).
    """
    import jax
    import jax.numpy as jnp

    from word2bits_tpu.data.pipeline import cold_positions
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.init import init_params
    from word2bits_tpu.train import build_engine

    V = vocab.size
    B, S, W = cfg.batch_size, cfg.steps_per_chunk, cfg.window
    hyper = CBOWHyper(bitlevel=cfg.bitlevel, size=cfg.size, window=W,
                      negative=cfg.negative, reg=cfg.reg)
    u, v = init_params(V, cfg.size, init=cfg.init, seed=cfg.seed,
                       dtype=jnp.dtype(cfg.dtype))
    eng = build_engine(cfg, vocab, u, v, hyper, B, S)
    if cfg.hot_rows and eng.fused_mode:
        n_rows = capacity // B + S + 2
        eng.seg_cold["pos"] = jnp.asarray(
            cold_positions(ep.tokens, B, W, n_rows, cfg.hot_rows))
    tokens = jnp.asarray(ep.tokens)
    sents = jnp.asarray(ep.sent_ids)
    table = eng.table
    u, v = eng.u, eng.v

    n_centers = max(ep.n_tokens, 1)
    # this segment's share of the corpus words (train.py seg_words):
    # charging full train_words against a truncated segment would inflate
    # words/sec for corpora beyond segment_tokens
    seg_words = vocab.train_words * seg_tokens / max(source_len, 1)
    words_per_step = B * seg_words / n_centers
    max_chunks = max(1, n_centers // (S * B))

    def scalars(ci, words_done):
        return ChunkScalars(
            base0=jnp.int32(W + (ci % max_chunks) * S * B),
            alpha0=jnp.float32(cfg.effective_alpha),
            wca_start=jnp.float32(words_done),
            wca_per_step=jnp.float32(words_per_step),
            denom=jnp.float32(cfg.iter * vocab.train_words + 1.0))

    def call(chunks, words_done, sub):
        nonlocal u, v
        if eng.sharded is not None:
            return eng.sharded.run_chunk(tokens, sents, table.prob,
                                         table.alias,
                                         scalars(chunks, words_done), sub)
        u, v, loss = eng.chunk_fn(u, v, tokens, sents, table.prob,
                                  table.alias, scalars(chunks, words_done),
                                  sub)
        return loss

    key = jax.random.PRNGKey(cfg.seed)
    key, sub = jax.random.split(key)
    float(call(0, 0.0, sub))  # compile + warmup barrier

    t0 = time.perf_counter()
    chunks = 0
    words_done = 0.0
    while True:
        for _ in range(group):
            key, sub = jax.random.split(key)
            loss = call(chunks, words_done, sub)
            chunks += 1
            words_done += S * words_per_step
        float(loss)
        if time.perf_counter() - t0 > seconds:
            break
    return words_done / (time.perf_counter() - t0)


def run_tune(cfg: Word2BitsConfig, seconds: float = 4.0,
             as_json: bool = False,
             max_variants: Optional[int] = None) -> int:
    from word2bits_tpu.data.pipeline import build_epoch_arrays
    from word2bits_tpu.train import prepare, segment_capacity

    vocab, encoded = prepare(cfg)
    V = vocab.size
    W = cfg.window
    # epoch arrays must cover the LARGEST steps_per_chunk any candidate
    # uses (capacity pads by S*B past the segment)
    cands_S = [int(o.get("steps_per_chunk", cfg.steps_per_chunk))
               for _, o, _ in variants(cfg, V)]
    cfg_cap = dataclasses.replace(cfg, steps_per_chunk=max(cands_S))
    seg_tokens, capacity = segment_capacity(cfg_cap, len(encoded))
    ep = build_epoch_arrays(encoded[:seg_tokens], vocab.counts, cfg.sample,
                            vocab.train_words, W,
                            np.random.default_rng(cfg.seed),
                            capacity=capacity)

    cands = variants(cfg, V)
    if max_variants is not None:
        cands = cands[:max_variants]
    rows = []
    best: Optional[Tuple[str, float, Dict]] = None
    for name, overlay, note in cands:
        try:
            cfg_v = dataclasses.replace(cfg, **overlay)
        except ValueError as e:
            rows.append(dict(name=name, error=str(e)))
            continue
        try:
            wps = measure(cfg_v, vocab, ep, capacity, seg_tokens,
                          len(encoded), seconds=seconds)
        except Exception as e:  # measure every candidate we can
            rows.append(dict(name=name, error=f"{type(e).__name__}: {e}"))
            continue
        rows.append(dict(name=name, words_per_sec=round(wps, 1),
                         flags=_flags(overlay), note=note))
        print(f"tune: {name:<12s} {wps/1e6:8.3f}M words/sec   "
              f"{_flags(overlay) or '(as given)'}", flush=True)
        if best is None or wps > best[1]:
            best = (name, wps, overlay)

    if best is None:
        print("tune: no variant could be measured", flush=True)
        return 1
    base_wps = next((r["words_per_sec"] for r in rows
                     if r.get("name") == "as-given"
                     and "words_per_sec" in r), None)
    result = dict(recommended=best[0], flags=_flags(best[2]),
                  words_per_sec=round(best[1], 1),
                  speedup_vs_given=(round(best[1] / base_wps, 2)
                                    if base_wps else None),
                  rows=rows)
    if as_json:
        print(json.dumps(result))
    else:
        extra = (f"  ({result['speedup_vs_given']}x your flags)"
                 if result["speedup_vs_given"] else "")
        print(f"tune: recommended: {result['flags'] or '(as given)'}"
              f"{extra}")
    return 0
