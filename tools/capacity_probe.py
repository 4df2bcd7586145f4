"""Single-chip capacity probe: compile + step the full-Wikipedia config
(3.7M vocab x 800d, reference README.md:39) on one v5e chip.

Uses the no-scan per-step path (steps_per_chunk=1, donated buffers) that
avoids lax.scan's double-buffered carry — the fix for the round-1 OOM at
>=2.5M x 800d bf16 (VERDICT item 5).  Synthetic zipf tokens; measures
words/sec over a few pipelined steps, host-fetch sync only.

Usage: python tools/capacity_probe.py [V] [D] [B] [--cpu] [--f32]
                                      [--dense H]   (dense-hot negatives)
                                      [--rmw]       (Pallas group-RMW
                                                     scatter: true in-place
                                                     table, peak = 1x table
                                                     — the path that fits
                                                     3.7M x 800d on one
                                                     chip; pads V to the
                                                     sublane group and
                                                     2D to 128 lanes)
                                      [--analyze]   (compile-only: buffer
                                                     report, no execution)

--analyze lowers the step with ShapeDtypeStructs (the table is never
materialized) and prints XLA's buffer assignment (memory_analysis): with
donation honored, output aliases the table argument and peak = table +
temps, not 2x table — the compile-time proof of the no-scan path's fix for
the round-1 >=2.5M OOM, checkable even when the TPU tunnel is down.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_fused import make_fused_train_chunk
    from word2bits_tpu.sampling.unigram import build_alias_table

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    V = int(args[0]) if len(args) > 0 else 3_700_000
    D = int(args[1]) if len(args) > 1 else 800
    B = int(args[2]) if len(args) > 2 else 16_384
    W, K, G = 8, 24, 64
    dtype = jnp.dtype("float32" if "--f32" in sys.argv else "bfloat16")

    n_tokens = 4 * B + 2 * W + 64
    rng = np.random.default_rng(0)
    ids = np.minimum(rng.zipf(1.3, size=n_tokens) - 1, V - 1).astype(np.int32)
    tokens = jnp.asarray(ids)
    sents = jnp.asarray((np.arange(n_tokens) // 1000).astype(np.int32))
    # count-sorted like a real vocab (SortVocab): id == frequency rank
    counts = np.sort(np.maximum(rng.zipf(1.3, size=V).astype(np.float64),
                                1.0))[::-1].copy()
    atab = build_alias_table(counts ** 0.75)

    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.0)
    gb = V * 2 * D * dtype.itemsize / 1e9
    print(f"table: {V} x {2*D} {dtype.name} = {gb:.1f} GB",
          file=sys.stderr, flush=True)
    rmw = "--rmw" in sys.argv
    vpad = cpad = 0
    if rmw:
        from word2bits_tpu.kernels.scatter_pallas import group_rows
        vpad = (-V) % group_rows(dtype)
        cpad = (-2 * D) % 128
    table = jnp.zeros((V + vpad, 2 * D + cpad), dtype)  # zeros: init LCG too slow at 3.7M
    dense_H = 0
    if "--dense" in sys.argv:
        dense_H = int(sys.argv[sys.argv.index("--dense") + 1])
    if dense_H:
        from word2bits_tpu.sampling.unigram import build_stratified_tables
        st = build_stratified_tables(counts ** 0.75, dense_H)
        dh = st.dense_split(K)
        atab = st.cold
        print(f"dense-hot H={dense_H} p_hot={st.p_hot:.3f} kc={dh[0]}",
              file=sys.stderr, flush=True)
        chunk1 = make_fused_train_chunk(hyper, V, B, steps=1, neg_sharing=G,
                                        hot_rows=dense_H, dense_hot=dh)
    else:
        chunk1 = make_fused_train_chunk(hyper, V, B, steps=1, neg_sharing=G,
                                        rmw_scatter=rmw, col_pad=cpad)

    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(B),
                           denom=jnp.float32(1e12))
    key = jax.random.PRNGKey(0)

    if "--analyze" in sys.argv:
        # compile-only: the table exists just as an avals shape, so the full
        # 3.7M x 1600 buffer is never allocated on host or device
        spec = jax.ShapeDtypeStruct((V + vpad, 2 * D + cpad), dtype)
        t0 = time.perf_counter()
        compiled = chunk1.lower(spec, tokens, sents, atab.prob, atab.alias,
                                scalars, key).compile()
        ma = compiled.memory_analysis()
        fields = {}
        for name in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes", "alias_size_in_bytes",
                     "generated_code_size_in_bytes"):
            fields[name.replace("_in_bytes", "_gb")] = round(
                getattr(ma, name, 0) / 1e9, 3)
        table_bytes = (V + vpad) * (2 * D + cpad) * dtype.itemsize
        table_gb = table_bytes / 1e9
        # peak live = arguments + temps + (output NOT aliased ? output : 0)
        # compare RAW bytes — GB rounding would call any sub-MB table
        # "aliased" (0.0 >= 0.0) regardless of what XLA actually did
        aliased = getattr(ma, "alias_size_in_bytes", 0) >= table_bytes
        peak = (fields["argument_size_gb"] + fields["temp_size_gb"]
                + (0.0 if aliased else fields["output_size_gb"]))
        print(json.dumps({
            "V": V, "D": D, "B": B, "dtype": dtype.name,
            "dense_hot": dense_H, "rmw": rmw,
            "table_gb": round(table_gb, 2),
            "compile_s": round(time.perf_counter() - t0, 1),
            "backend": jax.default_backend(),
            **fields,
            "table_output_aliased": bool(aliased),
            "peak_live_gb": round(peak, 2),
        }))
        return
    t0 = time.perf_counter()
    key, sub = jax.random.split(key)
    table, loss = chunk1(table, tokens, sents, atab.prob, atab.alias,
                         scalars, sub)
    float(loss)
    compile_s = time.perf_counter() - t0
    print(f"compile+first step: {compile_s:.1f}s", file=sys.stderr, flush=True)

    steps = 0
    t0 = time.perf_counter()
    while True:
        for _ in range(4):
            key, sub = jax.random.split(key)
            table, loss = chunk1(table, tokens, sents, atab.prob, atab.alias,
                                 scalars, sub)
            steps += 1
        float(loss)
        if time.perf_counter() - t0 > 10.0:
            break
    dt = time.perf_counter() - t0
    print(json.dumps({
        "V": V, "D": D, "B": B, "dtype": dtype.name, "dense_hot": dense_H,
        "rmw": rmw, "table_gb": round(gb, 2),
        "compile_s": round(compile_s, 1),
        "ms_per_step": round(dt / steps * 1e3, 1),
        "words_per_sec": round(steps * B / dt, 1),
    }))


if __name__ == "__main__":
    main()
