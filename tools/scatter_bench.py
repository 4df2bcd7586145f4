"""Measure the hot-loop scatter-add variants on the real chip.

The training step's bottleneck is the duplicate-id scatter
(ARCHITECTURE.md ablation: ~50 ns/row, 50-59%% of the step).  This times,
in ONE process (per-process first-dispatch costs 30-150 s here):

  baseline   table.at[ids].add(rows)             (serialized on duplicates)
  sorted     argsort + indices_are_sorted=True
  dedup-M    ops.scatter.scatter_add_dedup block M (MXU combine + unique)
  unique     scatter of N distinct ids, unique_indices=True (the floor XLA
             offers if duplicates are fully removed)

at the bench shape (V=70k, C=400 bf16 fused tables, N=11,280 rows/step:
slab 8,208 + negatives 3,072, Zipf ids) and the Wikipedia-config shape.
Sync is by host fetch only (bool(jnp.isfinite(...)) per rep) — NEVER
block_until_ready on this backend (CLAUDE.md).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def zipf_ids(rng, n, v, a=1.2):
    return np.minimum(rng.zipf(a, size=n) - 1, v - 1).astype(np.int32)


REPS = 20


def timeit(fn, reps=None):
    import jax.numpy as jnp
    reps = reps or REPS
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    # host fetch = the only real sync on axon
    assert bool(jnp.isfinite(out[0, 0] if out.ndim else out))
    return (time.perf_counter() - t0) / reps


def main():
    global REPS
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from word2bits_tpu.ops.scatter import scatter_add_dedup, scatter_add_sorted

    if "--reps" in sys.argv:
        REPS = int(sys.argv[sys.argv.index("--reps") + 1])
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    shapes = [
        ("bench-70k-c400-bf16", 70_000, 400, 11_280, jnp.bfloat16),
        ("wiki-400k-c1600-bf16", 400_000, 1600, 11_280, jnp.bfloat16),
        # the RMW kernel's own shape class (capacity path): 128-lane-
        # aligned rows — on the first two shapes rmw correctly refuses
        # (C % 128 != 0) and the failure prints, documenting the constraint
        ("capacity-500k-c1664-bf16", 500_000, 1664, 22_544, jnp.bfloat16),
    ]
    if "--quick" in sys.argv:
        shapes = shapes[:1]
    results = {}
    for name, V, C, N, dt in shapes:
        table = jnp.zeros((V, C), dt)
        ids = jnp.asarray(zipf_ids(rng, N, V))
        uniq = jnp.asarray(rng.permutation(V)[:N].astype(np.int32))
        rows = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32), dt)

        base = jax.jit(lambda t, i, r: t.at[i].add(r))
        uniq_fn = jax.jit(lambda t, i, r: t.at[i].add(r, unique_indices=True))
        sort_fn = jax.jit(scatter_add_sorted)
        dedup_fn = jax.jit(scatter_add_dedup, static_argnums=(3,))

        res = {}
        res["baseline"] = timeit(lambda: base(table, ids, rows))
        res["unique_ids_flag"] = timeit(lambda: uniq_fn(table, uniq, rows))
        res["unique_ids_noflag"] = timeit(lambda: base(table, uniq, rows))
        res["sorted"] = timeit(lambda: sort_fn(table, ids, rows))
        for M in (512, 1024, 2048):
            res[f"dedup-{M}"] = timeit(lambda M=M: dedup_fn(table, ids, rows, M))
        interp = jax.default_backend() not in ("tpu", "axon")
        if "--no-pallas" not in sys.argv and not interp:
            # interpret mode simulates each RMW chain in Python — minutes
            # per call at bench N; the kernel is only worth timing compiled
            from word2bits_tpu.kernels.scatter_pallas import scatter_add_rmw
            rmw_fn = jax.jit(scatter_add_rmw, static_argnums=(3, 4, 5))
            for blk, sl in ((512, 32), (1024, 32), (1024, 64), (2048, 64)):
                try:
                    res[f"rmw-{blk}x{sl}"] = timeit(
                        lambda blk=blk, sl=sl: rmw_fn(
                            table, ids, rows, blk, sl, interp))
                except Exception as e:
                    print(f"  rmw-{blk}x{sl} failed: "
                          f"{type(e).__name__}: {e}"[:200], flush=True)
        results[name] = {k: round(v * 1e6, 1) for k, v in res.items()}
        print(name, json.dumps(results[name]), flush=True)
        b = res["baseline"]
        best = min(res, key=res.get)
        print(f"  baseline {b*1e6:.0f} us ({b/N*1e9:.1f} ns/row); "
              f"best {best} = {res[best]*1e6:.0f} us "
              f"({b/res[best]:.2f}x)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
