"""Minimal Mosaic feature probe: (a) [8, C] group-slice DMA from a 3D HBM
ref with dynamic leading index, (b) the same under pl.when, (c) end-to-end
aliasing through reshape->pallas->reshape with donation."""

import json
import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(nvalid, ids_ref, rows_ref, table_ref, out_ref, acc_ref, rsem, wsem):
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


def run(V8, C, n):
    G = V8 // 8
    table = jnp.arange(V8 * C, dtype=jnp.float32).reshape(V8, C) * 1e-6
    ids = np.array([3, 1, 0x7FFFFFF0 >> 3, 2, 1][:n], np.int32)
    rows = np.ones((n, 8, C), np.float32) * np.arange(1, n + 1)[:, None, None]

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


run(V8=4096, C=256, n=5)
