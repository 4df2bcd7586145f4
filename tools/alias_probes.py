"""XLA:TPU donation/aliasing behavior probes — one entry point.

Consolidates the round-3/4 alias_exp{,2,3,4}.py probes (VERDICT r4 item 8).
Findings these produced are recorded in ARCHITECTURE.md ("Why the RMW
scatter is required") and kernels/scatter_pallas.py's docstring; keep the
probes runnable so the behavior can be re-checked when the toolchain moves.

Subcommands (python tools/alias_probes.py SUB):

  chunk   Which chunk formulation avoids the table-sized HLO copy temp?
          Compiles gather->compute->scatter skeletons (two scatters, one
          merged scatter, optimization_barrier, no-loss) plus the real
          steps=1 chunk at small V and prints temp/alias sizes.
          FINDING (v5e, 2026-08-19): every .at[].add formulation holds a
          full table-sized `copy(table)` temp even with donation.

  bisect  Minimal op pattern triggering the copy: scatter alone, f32 rows,
          gather+scatter, +loss output, dynamic_update_slice, sorted+unique
          scatter.  FINDING: every scatter pays the copy;
          dynamic_update_slice does NOT (temp = 0).

  rmw     The Pallas group-RMW scatter (kernels/scatter_pallas.py):
          numerics vs .at[].add(mode="drop") with OOB sentinels, f32 and
          bf16, plus buffer assignment at a capacity-style shape.
          FINDING: max_abs_err 0 / bf16-granular; temp ~= 0 (true in-place).

  mosaic  Minimal Mosaic features the RMW kernel relies on: [8, C]
          group-slice DMA from a 3D HBM ref with a dynamic leading index,
          under pl.when, and aliasing through reshape->pallas->reshape
          with donation.  FINDING: all supported on the v5e.
"""

import functools
import json
import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)

import numpy as np


def _report(name, fn, *specs, donate=(0,)):
    import jax
    try:
        jfn = jax.jit(fn, donate_argnums=donate)
        comp = jfn.lower(*specs).compile()
        ma = comp.memory_analysis()
        print(json.dumps({
            "variant": name,
            "arg_gb": round(ma.argument_size_in_bytes / 1e9, 3),
            "out_gb": round(ma.output_size_in_bytes / 1e9, 3),
            "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
            "alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:200]}),
              flush=True)


def probe_chunk():
    import jax
    import jax.numpy as jnp
    from jax import lax

    V, D, B, W, K, G = 500_000, 800, 16_384, 8, 24, 64
    T = B // G
    dt = jnp.bfloat16
    tab = jax.ShapeDtypeStruct((V, 2 * D), dt)
    ids_s = jax.ShapeDtypeStruct((B + 2 * W,), jnp.int32)
    negs_s = jax.ShapeDtypeStruct((T * K,), jnp.int32)

    def skel_two(table, ids, negs):
        g = table[ids].astype(jnp.float32)
        gn = table[negs].astype(jnp.float32)
        loss = jnp.sum(g) + jnp.sum(gn)
        du = g * 0.1
        dv = gn[:, D:] * 0.1
        table = table.at[ids].add(du.astype(table.dtype))
        nr = jnp.concatenate([jnp.zeros_like(dv), dv], axis=1)
        table = table.at[negs].add(nr.astype(table.dtype))
        return table, loss

    def skel_one(table, ids, negs):
        g = table[ids].astype(jnp.float32)
        gn = table[negs].astype(jnp.float32)
        loss = jnp.sum(g) + jnp.sum(gn)
        du = g * 0.1
        dv = gn[:, D:] * 0.1
        nr = jnp.concatenate([jnp.zeros_like(dv), dv], axis=1)
        all_ids = jnp.concatenate([ids, negs])
        all_rows = jnp.concatenate([du, nr], axis=0)
        return table.at[all_ids].add(all_rows.astype(table.dtype)), loss

    def skel_barrier(table, ids, negs):
        g = table[ids].astype(jnp.float32)
        gn = table[negs].astype(jnp.float32)
        loss = jnp.sum(g) + jnp.sum(gn)
        du = g * 0.1
        dv = gn[:, D:] * 0.1
        table, du, dv = lax.optimization_barrier((table, du, dv))
        table = table.at[ids].add(du.astype(table.dtype))
        nr = jnp.concatenate([jnp.zeros_like(dv), dv], axis=1)
        table = table.at[negs].add(nr.astype(table.dtype))
        return table, loss

    def skel_noloss(table, ids, negs):
        g = table[ids].astype(jnp.float32)
        gn = table[negs].astype(jnp.float32)
        du = g * 0.1
        dv = gn[:, D:] * 0.1
        table = table.at[ids].add(du.astype(table.dtype))
        nr = jnp.concatenate([jnp.zeros_like(dv), dv], axis=1)
        return table.at[negs].add(nr.astype(table.dtype))

    _report("skel_two", skel_two, tab, ids_s, negs_s)
    _report("skel_one", skel_one, tab, ids_s, negs_s)
    _report("skel_barrier", skel_barrier, tab, ids_s, negs_s)
    _report("skel_noloss", skel_noloss, tab, ids_s, negs_s)

    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_fused import make_fused_train_chunk

    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=K, reg=0.0)
    chunk1 = make_fused_train_chunk(hyper, V, B, steps=1, neg_sharing=G)
    n_tokens = 4 * B + 2 * W + 64
    tok_s = jax.ShapeDtypeStruct((n_tokens,), jnp.int32)
    ap_s = jax.ShapeDtypeStruct((V,), jnp.float32)
    aa_s = jax.ShapeDtypeStruct((V,), jnp.int32)
    sc = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                      wca_start=jnp.float32(0.0),
                      wca_per_step=jnp.float32(B),
                      denom=jnp.float32(1e12))
    try:
        comp = chunk1.lower(tab, tok_s, tok_s, ap_s, aa_s, sc,
                            jax.random.PRNGKey(0)).compile()
        ma = comp.memory_analysis()
        print(json.dumps({
            "variant": "real_chunk1",
            "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
            "alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": "real_chunk1", "error": str(e)[:300]}),
              flush=True)


def probe_bisect():
    import jax
    import jax.numpy as jnp
    from jax import lax

    V, D = 500_000, 800
    N = 16_400
    dt = jnp.bfloat16
    tab = jax.ShapeDtypeStruct((V, 2 * D), dt)
    ids_s = jax.ShapeDtypeStruct((N,), jnp.int32)
    rows_s = jax.ShapeDtypeStruct((N, 2 * D), dt)

    def scatter_only(table, ids, rows):
        return table.at[ids].add(rows)

    def scatter_only_f32rows(table, ids, rows):
        return table.at[ids].add((rows.astype(jnp.float32) * 0.1)
                                 .astype(table.dtype))

    def gather_scatter(table, ids, rows):
        g = table[ids].astype(jnp.float32)
        return table.at[ids].add((g * 0.1).astype(table.dtype))

    def gather_scatter_loss(table, ids, rows):
        g = table[ids].astype(jnp.float32)
        return table.at[ids].add((g * 0.1).astype(table.dtype)), jnp.sum(g)

    def dus_inplace(table, ids, rows):
        head = (table[:N].astype(jnp.float32) * 0.5).astype(table.dtype)
        return lax.dynamic_update_slice(table, head, (0, 0))

    def gather_sorted_scatter(table, ids, rows):
        s = jnp.sort(ids)
        g = table[s].astype(jnp.float32)
        return table.at[s].add((g * 0.1).astype(table.dtype),
                               unique_indices=True)

    _report("scatter_only", scatter_only, tab, ids_s, rows_s)
    _report("scatter_only_f32rows", scatter_only_f32rows, tab, ids_s, rows_s)
    _report("gather_scatter", gather_scatter, tab, ids_s, rows_s)
    _report("gather_scatter_loss", gather_scatter_loss, tab, ids_s, rows_s)
    _report("dus_inplace", dus_inplace, tab, ids_s, rows_s)
    _report("gather_sorted_scatter", gather_sorted_scatter, tab, ids_s,
            rows_s)


def probe_rmw():
    import jax
    import jax.numpy as jnp
    from word2bits_tpu.kernels.scatter_pallas import scatter_add_rmw

    rng = np.random.default_rng(0)
    V, C, N = 4096, 256, 3000
    table = rng.standard_normal((V, C)).astype(np.float32)
    ids = rng.integers(0, V, size=N).astype(np.int32)
    ids[::17] = 0x7FFFFFF0  # OOB sentinels like the chunk's masked rows
    rows = rng.standard_normal((N, C)).astype(np.float32)

    want = jnp.asarray(table).at[jnp.asarray(ids)].add(
        jnp.asarray(rows), mode="drop")
    got = scatter_add_rmw(jnp.asarray(table), jnp.asarray(ids),
                          jnp.asarray(rows), block=512, slots=16)
    err = float(jnp.max(jnp.abs(want - got)))
    print(json.dumps({"check": "numerics_f32", "max_abs_err": err}),
          flush=True)

    tb = jnp.asarray(table).astype(jnp.bfloat16)
    want = tb.at[jnp.asarray(ids)].add(
        jnp.asarray(rows).astype(jnp.bfloat16), mode="drop")
    got = scatter_add_rmw(tb, jnp.asarray(ids),
                          jnp.asarray(rows).astype(jnp.bfloat16),
                          block=512, slots=16)
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(json.dumps({"check": "numerics_bf16", "max_abs_err": err}),
          flush=True)

    Vb, Cb, Nb = 500_000, 1664, 16_400
    tab = jax.ShapeDtypeStruct((Vb, Cb), jnp.bfloat16)
    ids_s = jax.ShapeDtypeStruct((Nb,), jnp.int32)

    def gather_rmw(table, ids):
        g = table[ids].astype(jnp.float32)
        loss = jnp.sum(g)
        return scatter_add_rmw(table, ids, (g * 0.1).astype(table.dtype),
                               block=1024, slots=32, interpret=False), loss

    comp = jax.jit(gather_rmw, donate_argnums=(0,)).lower(tab,
                                                          ids_s).compile()
    ma = comp.memory_analysis()
    print(json.dumps({
        "check": "alias_rmw",
        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
        "alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
    }), flush=True)


def probe_mosaic(V8=4096, C=256, n=5):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(nvalid, ids_ref, rows_ref, table_ref, out_ref, acc_ref, rsem,
             wsem):
        del table_ref
        i = pl.program_id(0)
        gid = ids_ref[i]

        @pl.when(gid < nvalid)
        def _():
            cp = pltpu.make_async_copy(out_ref.at[gid], acc_ref, rsem)
            cp.start()
            cp.wait()
            acc_ref[...] = acc_ref[...] + rows_ref[0]
            wr = pltpu.make_async_copy(acc_ref, out_ref.at[gid], wsem)
            wr.start()
            wr.wait()

    G = V8 // 8
    table = jnp.arange(V8 * C, dtype=jnp.float32).reshape(V8, C) * 1e-6
    ids = np.array([3, 1, 0x7FFFFFF0 >> 3, 2, 1][:n], np.int32)
    rows = np.ones((n, 8, C), np.float32) * np.arange(1,
                                                      n + 1)[:, None, None]

    def fn(table, ids, rows):
        t3 = table.reshape(G, 8, C)
        kernel = functools.partial(kern, G)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n,),
                in_specs=[
                    pl.BlockSpec((1, 8, C), lambda b, ids: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((8, C), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((G, 8, C), jnp.float32),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ids, rows.reshape(n, 1, 8, C)[:, 0], t3)
        return out.reshape(V8, C)

    jfn = jax.jit(fn, donate_argnums=(0,))
    got = jfn(table, jnp.asarray(ids), jnp.asarray(rows))
    want = (np.arange(V8 * C, dtype=np.float32).reshape(V8, C) * 1e-6)
    for k, g in enumerate(ids):
        if g < G:
            want[g * 8:(g + 1) * 8] += rows[k]
    err = float(np.max(np.abs(np.asarray(got) - want)))
    print(json.dumps({"check": "group_rmw_exec", "max_abs_err": err}),
          flush=True)

    comp = jfn.lower(jax.ShapeDtypeStruct((V8, C), jnp.float32),
                     jax.ShapeDtypeStruct((n,), jnp.int32),
                     jax.ShapeDtypeStruct((n, 8, C), jnp.float32)).compile()
    ma = comp.memory_analysis()
    print(json.dumps({
        "check": "alias_through_reshape",
        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 4),
        "alias_gb": round(ma.alias_size_in_bytes / 1e9, 4),
    }), flush=True)


PROBES = {"chunk": probe_chunk, "bisect": probe_bisect, "rmw": probe_rmw,
          "mosaic": probe_mosaic}

if __name__ == "__main__":
    subs = [a for a in sys.argv[1:] if a in PROBES] or list(PROBES)
    for s in subs:
        print(f"--- {s} ---", flush=True)
        PROBES[s]()
