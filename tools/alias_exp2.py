"""Bisect the table-copy trigger: which minimal op pattern makes XLA:TPU
copy a donated table?  (Follow-up to alias_exp.py — ALL gather+scatter
skeletons showed temp ~= table.)"""

import json
import sys

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
            "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
            "alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:200]}),
              flush=True)


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


report("scatter_only", scatter_only, tab, ids_s, rows_s)
report("scatter_only_f32rows", scatter_only_f32rows, tab, ids_s, rows_s)
report("gather_scatter", gather_scatter, tab, ids_s, rows_s)
report("gather_scatter_loss", gather_scatter_loss, tab, ids_s, rows_s)
report("dus_inplace", dus_inplace, tab, ids_s, rows_s)
report("gather_sorted_scatter", gather_sorted_scatter, tab, ids_s, rows_s)
