"""Find the chunk formulation whose XLA:TPU buffer assignment does NOT hold
a table-sized HLO temp alongside the donated argument.

Context: at 3.7M x 800d bf16 the no-scan chunk donates correctly (output
aliases the argument buffer) but copy-insertion still materializes
`copy(table.1)` as an 11.5 GB HLO temp, so compile OOMs at 22.6 GB
(/tmp/tpu_runs/capacity_3.7M.err, 2026-08-19).  This probe compiles small-V
variants on the SAME backend and prints temp_size so the copy shows up as
temp ~= table size.

Variants:
  base      the shipped make_fused_train_chunk(steps=1)
  onescat   slab + negative scatters concatenated into ONE scatter
  barrier   optimization_barrier pinning table AFTER all gathers
  noloss    chunk that returns only the table (no loss output)
"""

import json
import sys

import numpy as np

REPO = "/root/repo"
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax import lax


def report(name, fn, *specs, donate=(0,)):
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


def main():
    V, D, B, W, K, G = 500_000, 800, 16_384, 8, 24, 64
    dt = jnp.bfloat16
    T = B // G

    tab = jax.ShapeDtypeStruct((V, 2 * D), dt)
    ids_s = jax.ShapeDtypeStruct((B + 2 * W,), jnp.int32)
    negs_s = jax.ShapeDtypeStruct((T * K,), jnp.int32)
    rows_s = jax.ShapeDtypeStruct((B + 2 * W, 2 * D), jnp.float32)
    nrows_s = jax.ShapeDtypeStruct((T * K, D), jnp.float32)

    # Minimal skeleton of the chunk's read->compute->scatter shape: gather
    # rows, fake-compute deltas from them, scatter back.  If the skeleton
    # reproduces the copy, the cause is structural, not model-specific.
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
        table = table.at[all_ids].add(all_rows.astype(table.dtype))
        return table, loss

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
        table = table.at[negs].add(nr.astype(table.dtype))
        return table

    report("skel_two", skel_two, tab, ids_s, negs_s)
    report("skel_one", skel_one, tab, ids_s, negs_s)
    report("skel_barrier", skel_barrier, tab, ids_s, negs_s)
    report("skel_noloss", skel_noloss, tab, ids_s, negs_s)

    # The real chunk at the same small V
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
    key_s = jax.random.PRNGKey(0)
    try:
        comp = chunk1.lower(tab, tok_s, tok_s, ap_s, aa_s, sc, key_s).compile()
        ma = comp.memory_analysis()
        print(json.dumps({
            "variant": "real_chunk1",
            "arg_gb": round(ma.argument_size_in_bytes / 1e9, 3),
            "out_gb": round(ma.output_size_in_bytes / 1e9, 3),
            "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
            "alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": "real_chunk1", "error": str(e)[:300]}),
              flush=True)


if __name__ == "__main__":
    main()
