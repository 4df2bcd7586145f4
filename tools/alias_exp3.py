"""On-TPU check of the unpadded Pallas RMW scatter: numerics vs
.at[].add(), and buffer-assignment temp size (the XLA scatter always
copy-inserts a donated table on this compiler — alias_exp2.py; the RMW
kernel must not)."""

import json
import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from word2bits_tpu.kernels.scatter_pallas import scatter_add_rmw

# --- numerics on the real chip (small table) ---
rng = np.random.default_rng(0)
V, C, N = 4096, 256, 3000
table = rng.standard_normal((V, C)).astype(np.float32)
ids = rng.integers(0, V, size=N).astype(np.int32)
# include some OOB sentinels like the chunk's masked rows
ids[::17] = 0x7FFFFFF0
rows = rng.standard_normal((N, C)).astype(np.float32)

want = jnp.asarray(table).at[jnp.asarray(ids)].add(
    jnp.asarray(rows), mode="drop")
got = scatter_add_rmw(jnp.asarray(table), jnp.asarray(ids),
                      jnp.asarray(rows), block=512, slots=16)
err = float(jnp.max(jnp.abs(want - got)))
print(json.dumps({"check": "numerics_f32", "max_abs_err": err}), flush=True)

# bf16 table
tb = jnp.asarray(table).astype(jnp.bfloat16)
want = tb.at[jnp.asarray(ids)].add(
    jnp.asarray(rows).astype(jnp.bfloat16), mode="drop")
got = scatter_add_rmw(tb, jnp.asarray(ids),
                      jnp.asarray(rows).astype(jnp.bfloat16),
                      block=512, slots=16)
# dedup combine sums duplicates in f32 first — tolerate bf16-granular diff
err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                            - got.astype(jnp.float32))))
print(json.dumps({"check": "numerics_bf16", "max_abs_err": err}), flush=True)

# --- buffer assignment at capacity-style shape ---
Vb, Cb, Nb = 500_000, 1664, 16_400
tab = jax.ShapeDtypeStruct((Vb, Cb), jnp.bfloat16)
ids_s = jax.ShapeDtypeStruct((Nb,), jnp.int32)


def gather_rmw(table, ids):
    g = table[ids].astype(jnp.float32)
    loss = jnp.sum(g)
    return scatter_add_rmw(table, ids, (g * 0.1).astype(table.dtype),
                           block=1024, slots=32, interpret=False), loss


comp = jax.jit(gather_rmw, donate_argnums=(0,)).lower(tab, ids_s).compile()
ma = comp.memory_analysis()
print(json.dumps({
    "check": "alias_rmw",
    "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
    "alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
}), flush=True)
