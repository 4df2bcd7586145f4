"""Ablate the flagship-scale step (3.7M vocab x 800d bf16, B=16384) into
dispatch latency vs RMW-scatter vs everything-else (VERDICT r4 item 1).

The round-4 capacity number (28.2 ms/step, 581k words/sec) was measured on
the no-scan steps=1 path, which pays one tunnel dispatch PER STEP.  This
tool separates:

  rmw1        steps=1 + Pallas group-RMW scatter  (the round-4 baseline)
  dense1      steps=1, scatter replaced by an equal-traffic dense slice RMW
              (NOT update-equal; everything-but-scatter floor)
  disp        dispatch floor: a minimal donated table touch, timed
              back-to-back — the per-dispatch cost at this buffer size
  scat        the scatter alone: jitted donated scatter_add_rmw on a fixed
              update set of the step's row count (expansion+combine+kernel)
  rmw_foriS   steps=S with loop_mode="fori": lax.fori_loop keeps the carry
              in place (unlike lax.scan's double buffer), amortizing the
              dispatch over S steps; compile-checked via memory_analysis
              before execution
  rmw_unroll4 4 steps unrolled in one jit (aliasing cross-check)
  rmw1_B65536 steps=1 at 4x batch (dispatch amortized by batch instead)

Usage: python tools/capacity_ablate.py [variant ...] [--cpu] [--v V] [--d D]
Sync via host fetch only (CLAUDE.md).  Run variants in separate
invocations if the tunnel is flaky; each prints its own JSON line.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SECONDS = float(os.environ.get("W2B_ABLATE_SECONDS", 10.0))


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_fused import make_fused_train_chunk
    from word2bits_tpu.sampling.unigram import build_alias_table

    def argval(flag, default):
        return (int(sys.argv[sys.argv.index(flag) + 1])
                if flag in sys.argv else default)

    V = argval("--v", 3_700_000)
    D = argval("--d", 800)
    B0 = argval("--b", 16_384)
    W, K, G = 8, 24, 64
    dtype = jnp.dtype("bfloat16")
    from word2bits_tpu.kernels.scatter_pallas import group_rows
    vpad = (-V) % group_rows(dtype)
    cpad = (-2 * D) % 128
    C = 2 * D + cpad

    rng = np.random.default_rng(0)
    counts = np.sort(np.maximum(rng.zipf(1.3, size=V).astype(np.float64),
                                1.0))[::-1].copy()
    atab = build_alias_table(counts ** 0.75)
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.0)

    ntok_min = argval("--ntok", 0)   # replicate the trainer's full-segment
    #                                  token arrays (flagship: ~17.4M)

    def make_tokens(n):
        n = max(n, ntok_min)
        ids = np.minimum(rng.zipf(1.3, size=n) - 1, V - 1).astype(np.int32)
        return (jnp.asarray(ids),
                jnp.asarray((np.arange(n) // 1000).astype(np.int32)))

    def scalars(B):
        return ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                            wca_start=jnp.float32(0.0),
                            wca_per_step=jnp.float32(B),
                            denom=jnp.float32(1e12))

    table_shape = (V + vpad, C)
    table_gb = table_shape[0] * table_shape[1] * dtype.itemsize / 1e9

    def fresh_table():
        return jnp.zeros(table_shape, dtype)

    def measure_chunk(name, chunk_fn, B, S, analyze_first=False):
        tokens, sents = make_tokens(S * B + 2 * W + 64)
        sc = scalars(B)
        if analyze_first:
            spec = jax.ShapeDtypeStruct(table_shape, dtype)
            compiled = chunk_fn.lower(spec, tokens, sents, atab.prob,
                                      atab.alias, sc,
                                      jax.random.PRNGKey(0)).compile()
            ma = compiled.memory_analysis()
            tb = table_shape[0] * table_shape[1] * dtype.itemsize
            aliased = getattr(ma, "alias_size_in_bytes", 0) >= tb
            peak = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                    + (0 if aliased else ma.output_size_in_bytes)) / 1e9
            print(json.dumps({"variant": name, "phase": "analyze",
                              "aliased": bool(aliased),
                              "temp_gb": round(ma.temp_size_in_bytes / 1e9, 2),
                              "peak_gb": round(peak, 2)}), flush=True)
            if peak > 15.0:
                print(json.dumps({"variant": name, "skipped":
                                  f"peak {peak:.1f} GB > 15"}), flush=True)
                return
        table = fresh_table()
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        key, sub = jax.random.split(key)
        table, loss = chunk_fn(table, tokens, sents, atab.prob, atab.alias,
                               sc, sub)
        float(loss)
        compile_s = time.perf_counter() - t0
        steps = 0
        t0 = time.perf_counter()
        while True:
            for _ in range(4):
                key, sub = jax.random.split(key)
                table, loss = chunk_fn(table, tokens, sents, atab.prob,
                                       atab.alias, sc, sub)
                steps += S
            float(loss)
            if time.perf_counter() - t0 > SECONDS:
                break
        dt = time.perf_counter() - t0
        print(json.dumps({
            "variant": name, "V": V, "D": D, "B": B, "S": S,
            "compile_s": round(compile_s, 1),
            "ms_per_step": round(dt / steps * 1e3, 2),
            "words_per_sec": round(steps * B / dt),
        }), flush=True)
        del table

    wanted = [a for a in sys.argv[1:]
              if not a.startswith("--") and not a.isdigit()]

    def on(name):
        return (not wanted) or name in wanted

    print(json.dumps({"table_gb": round(table_gb, 2), "V": V, "D": D,
                      "backend": jax.default_backend()}), flush=True)

    if on("disp"):
        # dispatch floor: donated pass-through with a 16-row touch — the
        # smallest donated executable on a table-sized buffer
        def _touch(t):
            head = (t[:16].astype(jnp.float32) + 1.0).astype(t.dtype)
            return lax.dynamic_update_slice(t, head, (0, 0))
        touch = jax.jit(_touch, donate_argnums=0)
        table = fresh_table()
        table = touch(table)
        np.asarray(table[:1, :1])  # sync
        n = 0
        t0 = time.perf_counter()
        while True:
            for _ in range(16):
                table = touch(table)
                n += 1
            np.asarray(table[:1, :1])
            if time.perf_counter() - t0 > SECONDS:
                break
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": "disp",
                          "ms_per_dispatch": round(dt / n * 1e3, 2)}),
              flush=True)
        del table

    if on("scat"):
        from word2bits_tpu.kernels.scatter_pallas import scatter_add_rmw
        N = B0 + 2 * W + (B0 // G) * K
        ids = jnp.asarray(np.minimum(rng.zipf(1.3, size=N) - 1,
                                     V - 1).astype(np.int32))
        rows = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32),
                           dtype=dtype)
        scat = jax.jit(lambda t: scatter_add_rmw(t, ids, rows),
                       donate_argnums=0)
        table = fresh_table()
        table = scat(table)
        np.asarray(table[:1, :1])
        n = 0
        t0 = time.perf_counter()
        while True:
            for _ in range(4):
                table = scat(table)
                n += 1
            np.asarray(table[:1, :1])
            if time.perf_counter() - t0 > SECONDS:
                break
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": "scat", "rows": int(N),
                          "ms_per_call": round(dt / n * 1e3, 2)}), flush=True)
        del table

    if on("scatk") or on("scatprep"):
        # split `scat` into its two halves: the XLA prep (group-layout
        # expansion + MXU block combine) vs the Pallas RMW kernel itself
        from word2bits_tpu.kernels.scatter_pallas import (_scatter_rmw,
                                                          group_rows)
        from word2bits_tpu.ops.scatter import _combine_block
        grp = group_rows(dtype)
        shift = grp.bit_length() - 1
        N = B0 + 2 * W + (B0 // G) * K
        block = 512
        it = dtype.itemsize
        while block > 32 and block * grp * C * it > (4 << 20):
            block //= 2
        nb = -(-N // block)
        pad = nb * block - N
        ids_np = np.minimum(rng.zipf(1.3, size=N) - 1, V - 1).astype(np.int32)
        ids = jnp.concatenate([jnp.asarray(ids_np),
                               jnp.full((pad,), 0x7FFFFFF0, jnp.int32)])
        rows = jnp.asarray(
            rng.standard_normal((N + pad, C)).astype(np.float32), dtype=dtype)

        def prep(ids, rows):
            gids = ids >> shift
            off = ids & (grp - 1)
            onehot = (off[:, None]
                      == jnp.arange(grp, dtype=jnp.int32)[None, :])
            rows8 = jnp.where(onehot[:, :, None], rows[:, None, :],
                              jnp.zeros((), dtype))
            g2, r2 = jax.vmap(lambda xs: _combine_block(*xs))(
                (gids.reshape(nb, block), rows8.reshape(nb, block, grp * C)))
            return g2.reshape(-1), r2.reshape(-1, grp, C)

        prep_j = jax.jit(prep)
        g2, r2 = prep_j(ids, rows)
        np.asarray(g2[:1])
        uniq_groups = int(np.sum(np.asarray(g2) < (V + vpad) // grp))
        if on("scatprep"):
            n = 0
            t0 = time.perf_counter()
            while True:
                for _ in range(4):
                    g2, r2 = prep_j(ids, rows)
                    n += 1
                np.asarray(g2[:1])
                if time.perf_counter() - t0 > SECONDS:
                    break
            dt = time.perf_counter() - t0
            print(json.dumps({"variant": "scatprep", "rows": int(N),
                              "groups": uniq_groups,
                              "ms_per_call": round(dt / n * 1e3, 2)}),
                  flush=True)
        if on("scatk"):
            # pass g2/r2 as ARGUMENTS: closing over device arrays inlines
            # them as HLO constants and the 1.2 GB remote-compile request
            # body exceeds the tunnel's HTTP limit (413)
            kern = jax.jit(lambda t, g, r: _scatter_rmw(t, g, r, block,
                                                        min(32, block),
                                                        False),
                           donate_argnums=0)
            table = fresh_table()
            table = kern(table, g2, r2)
            np.asarray(table[:1, :1])
            n = 0
            t0 = time.perf_counter()
            while True:
                for _ in range(4):
                    table = kern(table, g2, r2)
                    n += 1
                np.asarray(table[:1, :1])
                if time.perf_counter() - t0 > SECONDS:
                    break
            dt = time.perf_counter() - t0
            print(json.dumps({"variant": "scatk", "rows": int(N),
                              "groups": uniq_groups,
                              "ms_per_call": round(dt / n * 1e3, 2)}),
                  flush=True)
            del table

    if on("rmw1"):
        fn = make_fused_train_chunk(hyper, V, B0, steps=1,
                                    neg_sharing=G, rmw_scatter=True,
                                    col_pad=cpad)
        measure_chunk("rmw1", fn, B0, 1)

    if on("dense1"):
        fn = make_fused_train_chunk(hyper, V, B0, steps=1,
                                    neg_sharing=G,
                                    scatter_impl="dense_probe")
        measure_chunk("dense1", fn, B0, 1)

    for S in (8, 32):
        name = f"rmw_fori{S}"
        if on(name):
            fn = make_fused_train_chunk(hyper, V, B0, steps=S,
                                        neg_sharing=G, rmw_scatter=True,
                                        col_pad=cpad, loop_mode="fori")
            measure_chunk(name, fn, B0, S, analyze_first=True)

    if on("dense_fori8"):
        fn = make_fused_train_chunk(hyper, V, B0, steps=8,
                                    neg_sharing=G,
                                    scatter_impl="dense_probe",
                                    loop_mode="fori")
        measure_chunk("dense_fori8", fn, B0, 8, analyze_first=True)

    if on("rmw_unroll4"):
        fn = make_fused_train_chunk(hyper, V, B0, steps=4,
                                    neg_sharing=G, rmw_scatter=True,
                                    col_pad=cpad, loop_mode="unroll")
        measure_chunk("rmw_unroll4", fn, B0, 4, analyze_first=True)

    if on("rmw1_B65536"):
        fn = make_fused_train_chunk(hyper, V, 65_536, steps=1,
                                    neg_sharing=G, rmw_scatter=True,
                                    col_pad=cpad)
        measure_chunk("rmw1_B65536", fn, 65_536, 1)

    # sorted group-RMW (kernels/group_rmw.py): in-kernel one-hot placement
    # replaces the XLA group-layout expansion + block combine whose prep
    # measured 21.4 ms/step (`scatprep`)
    if on("grmw1"):
        fn = make_fused_train_chunk(hyper, V, B0, steps=1,
                                    neg_sharing=G, scatter_impl="grmw",
                                    col_pad=cpad)
        measure_chunk("grmw1", fn, B0, 1)

    for S in (8, 32):
        name = f"grmw_fori{S}"
        if on(name):
            fn = make_fused_train_chunk(hyper, V, B0, steps=S,
                                        neg_sharing=G, scatter_impl="grmw",
                                        col_pad=cpad, loop_mode="fori")
            measure_chunk(name, fn, B0, S, analyze_first=True)

    for S in (8, 32):
        name = f"grmw_fori{S}_banded"
        if on(name):
            fn = make_fused_train_chunk(hyper, V, B0, steps=S,
                                        neg_sharing=G, scatter_impl="grmw",
                                        col_pad=cpad, loop_mode="fori",
                                        banded=256)
            measure_chunk(name, fn, B0, S, analyze_first=True)

    if on("grmw_fori32_banded_ctx"):
        fn = make_fused_train_chunk(hyper, V, B0, steps=32,
                                    neg_sharing=G, scatter_impl="grmw",
                                    col_pad=cpad, loop_mode="fori",
                                    banded=256, context_pallas=True)
        measure_chunk("grmw_fori32_banded_ctx", fn, B0, 32,
                      analyze_first=True)

    for Bv in (32_768, 65_536):
        name = f"grmw_fori8_banded_ctx_B{Bv}"
        if on(name):
            fn = make_fused_train_chunk(hyper, V, Bv, steps=8,
                                        neg_sharing=G, scatter_impl="grmw",
                                        col_pad=cpad, loop_mode="fori",
                                        banded=256, context_pallas=True)
            measure_chunk(name, fn, Bv, 8, analyze_first=True)

    if on("grmw_fori8_banded_c256"):
        fn = make_fused_train_chunk(hyper, V, B0, steps=8,
                                    neg_sharing=G, scatter_impl="grmw",
                                    col_pad=cpad, loop_mode="fori",
                                    banded=256, span_chunk=256)
        measure_chunk("grmw_fori8_banded_c256", fn, B0, 8,
                      analyze_first=True)

    if on("grmw_fori8_B65536"):
        fn = make_fused_train_chunk(hyper, V, 65_536, steps=8,
                                    neg_sharing=G, scatter_impl="grmw",
                                    col_pad=cpad, loop_mode="fori")
        measure_chunk("grmw_fori8_B65536", fn, 65_536, 8,
                      analyze_first=True)


if __name__ == "__main__":
    main()
