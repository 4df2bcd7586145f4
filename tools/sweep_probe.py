"""Split the sweep scatter's in-step cost: XLA pre-pass vs Pallas kernel.

ablate_fused measured scatter_impl='sweep' at 3077 us/step vs the plain
scatter's 975 us at the bench winner shape — ~2.6 ms of sweep cost against
a ~250 us analytic estimate.  This probe times the pieces in the SAME
execution context the step uses (donated table carried through a jitted
lax.scan, host-fetch sync), at the exact bench scatter shape:

  noop       scan framework + id refresh only (floor)
  scatter    plain table.at[ids].add (the production baseline)
  argsort    pre-pass argsort only
  prepass    full XLA pre-pass (sort, edges, slot maps, row gather) - kernel
  sweep      the full scatter_add_sweep
  kernel     sweep with the pre-pass hoisted OUT of the scan (placement
             arrays precomputed once; measures the pallas_call alone)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_probe.py
       [variant ...] [--cpu]
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

SECONDS = float(os.environ.get("W2B_PROBE_SECONDS", 4.0))
S = 128          # scan steps per dispatch (bench winner uses 128-256)
V, C, N = 53248, 512, 11280   # bench shape: padded vocab, 2D+pad, rows/step
WINDOW, CHUNK = 512, 128


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from word2bits_tpu.kernels import sweep_scatter as sw

    rng = np.random.default_rng(0)
    base_ids = np.minimum(rng.zipf(1.2, size=N) - 1, V - 1).astype(np.int32)
    rows_np = rng.normal(size=(N, C)).astype(np.float32)
    interpret = "--cpu" in sys.argv

    def ids_at(s):
        # preserves the duplicate structure while defeating hoisting
        return (jnp.asarray(base_ids) + s) % jnp.int32(V - 256)

    def prepass(table, ids, rows):
        """The XLA half of scatter_add_sweep, verbatim shapes."""
        order = jnp.argsort(ids)
        sids = ids[order]
        nwin = V // WINDOW
        edges = jnp.searchsorted(
            sids, (jnp.arange(nwin + 1, dtype=jnp.int32) * WINDOW)
            .astype(ids.dtype)).astype(jnp.int32)
        spans = edges[1:] - edges[:-1]
        cpw = -(-spans // CHUNK)
        pad_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cpw) * CHUNK])
        K = N // CHUNK + min(nwin, N) + (1 if N % CHUNK else 0)
        slot = jnp.arange(K * CHUNK, dtype=jnp.int32)
        w_of = jnp.clip(
            jnp.searchsorted(pad_start, slot, side="right").astype(jnp.int32)
            - 1, 0, nwin - 1)
        src = edges[w_of] + (slot - pad_start[w_of])
        valid = (slot < pad_start[nwin]) & (src < edges[w_of + 1])
        srcc = jnp.clip(src, 0, N - 1)
        g = jnp.where(valid, order[srcc], N)
        prows = jnp.concatenate(
            [rows.astype(table.dtype), jnp.zeros((1, C), table.dtype)])[g]
        poffs = jnp.where(valid, sids[srcc] - w_of * WINDOW,
                          jnp.int32(-1)).reshape(K, 1, CHUNK)
        poffs = jnp.broadcast_to(poffs, (K, 8, CHUNK))
        meta = w_of.reshape(K, CHUNK)[:, 0]
        first = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (meta[1:] != meta[:-1]).astype(jnp.int32)])
        return prows.reshape(K * CHUNK, C), poffs, meta, first

    def body_noop(table, s, rows):
        return table.at[:1, :1].add(ids_at(s)[:1, None].astype(table.dtype))

    def body_scatter(table, s, rows):
        return table.at[ids_at(s)].add(rows.astype(table.dtype))

    def body_argsort(table, s, rows):
        order = jnp.argsort(ids_at(s))
        return table.at[:1, :1].add(order[:1, None].astype(table.dtype))

    def body_prepass(table, s, rows):
        prows, poffs, meta, first = prepass(table, ids_at(s), rows)
        # tiny fold-in so nothing is DCE'd (touches 1 element of each)
        t = table.at[:1, :1].add(prows[:1, :1].astype(table.dtype))
        t = t.at[:1, :1].add((poffs[0, 0, :1] + meta[:1] + first[:1]
                              )[:, None].astype(table.dtype))
        return t

    def body_sweep(table, s, rows):
        return sw.scatter_add_sweep(table, ids_at(s), rows,
                                    window=WINDOW, chunk=CHUNK,
                                    interpret=interpret)

    # --- pre-pass bisection: cumulative stages of prepass() ---
    def _stage(table, s, rows, upto):
        ids = ids_at(s)
        nwin = V // WINDOW
        order = jnp.argsort(ids)
        sids = ids[order]
        acc = sids[:1]
        if upto >= 1:
            edges = jnp.searchsorted(
                sids, (jnp.arange(nwin + 1, dtype=jnp.int32) * WINDOW)
                .astype(ids.dtype)).astype(jnp.int32)
            spans = edges[1:] - edges[:-1]
            cpw = -(-spans // CHUNK)
            pad_start = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(cpw) * CHUNK])
            acc = acc + edges[:1] + pad_start[:1]
        if upto >= 2:
            K = N // CHUNK + min(nwin, N) + (1 if N % CHUNK else 0)
            slot = jnp.arange(K * CHUNK, dtype=jnp.int32)
            w_of = jnp.clip(
                jnp.searchsorted(pad_start, slot,
                                 side="right").astype(jnp.int32) - 1,
                0, nwin - 1)
            src = edges[w_of] + (slot - pad_start[w_of])
            valid = (slot < pad_start[nwin]) & (src < edges[w_of + 1])
            srcc = jnp.clip(src, 0, N - 1)
            g = jnp.where(valid, order[srcc], N)
            acc = acc + g[:1]
        if upto >= 3:
            prows = jnp.concatenate(
                [rows.astype(table.dtype),
                 jnp.zeros((1, C), table.dtype)])[g]
            acc = acc + prows[0, :1].astype(jnp.int32)
        if upto >= 4:
            poffs = jnp.where(valid, sids[srcc] - w_of * WINDOW,
                              jnp.int32(-1)).reshape(K, 1, CHUNK)
            poffs = jnp.broadcast_to(poffs, (K, 8, CHUNK))
            meta = w_of.reshape(K, CHUNK)[:, 0]
            first = jnp.concatenate(
                [jnp.ones((1,), jnp.int32),
                 (meta[1:] != meta[:-1]).astype(jnp.int32)])
            acc = acc + poffs[0, 0, :1] + meta[:1] + first[:1]
        return table.at[:1, :1].add(acc[:, None].astype(table.dtype))

    def stage_body(upto):
        return lambda table, s, rows: _stage(table, s, rows, upto)

    def scan_of(body):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(table, rows):
            def step(tab, s):
                return body(tab, s, rows), ()
            table, _ = jax.lax.scan(step, table,
                                    jnp.arange(S, dtype=jnp.int32))
            return table
        return run

    def while_of(body):
        """Same loop as scan_of but lax.while_loop: no ys stacking — does
        XLA keep the carried table in place here where scan copies it?"""
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(table, rows):
            def cond(c):
                return c[1] < S
            def step(c):
                tab, s = c
                return body(tab, s, rows), s + 1
            table, _ = jax.lax.while_loop(cond, step,
                                          (table, jnp.int32(0)))
            return table
        return run

    # --- hoisted plans: ids for every step of the chunk are knowable at
    # chunk entry (slab ids from the epoch; negatives pre-drawable), so the
    # whole sort/slot pre-pass batches out of the loop ---
    @jax.jit
    def _plans_of(ids_all):
        return jax.vmap(
            lambda i: sw.sweep_plan(i, V, window=WINDOW, chunk=CHUNK)
        )(ids_all)

    def all_plans():
        # ids as a runtime arg so XLA can't constant-fold the batched sort
        ids_all = np.stack([(base_ids + s) % (V - 256) for s in range(S)])
        return _plans_of(jnp.asarray(ids_all.astype(np.int32)))

    def planned_scan():
        # plans ride as runtime ARGUMENTS (captured arrays would embed as
        # XLA literals — a ~100 MB poffs constant) and scan xs slices them
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(table, rows, g, poffs, meta, first):
            def step(tab, xs):
                return sw.scatter_add_sweep_planned(
                    tab, xs, rows, window=WINDOW, chunk=CHUNK,
                    interpret=interpret), ()
            table, _ = jax.lax.scan(step, table, (g, poffs, meta, first))
            return table
        return run

    def planned_while():
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(table, rows, g, poffs, meta, first):
            def cond(c):
                return c[1] < S
            def step(c):
                tab, s = c
                plan = tuple(
                    jax.lax.dynamic_index_in_dim(p, s, keepdims=False)
                    for p in (g, poffs, meta, first))
                return sw.scatter_add_sweep_planned(
                    tab, plan, rows, window=WINDOW, chunk=CHUNK,
                    interpret=interpret), s + 1
            table, _ = jax.lax.while_loop(cond, step, (table, jnp.int32(0)))
            return table
        return run

    def bsort_cost():
        """One batched sort_key_val over the whole chunk's ids ([S, N]) —
        the irreducible hoisted cost of any sorted-scatter design."""
        ids_np = np.stack(
            [(base_ids + s) % (V - 256) for s in range(S)]).astype(np.int32)
        iota2 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (S, N))

        @jax.jit
        def run(table, ids_all):
            sids, order = jax.lax.sort_key_val(ids_all, iota2, dimension=1)
            return table.at[:1, :1].add(
                (sids[:1, :1] + order[:1, :1]).astype(table.dtype))

        ids_dev = jnp.asarray(ids_np)   # transfer ONCE: a per-rep 5.8 MB
        # host->device copy through the tunnel dominated earlier numbers
        return run, (lambda: (jnp.zeros((V, C), jnp.bfloat16), ids_dev))

    def sortedrows_cost():
        """In-scan rows[order] permutation row gather (order hoisted as xs):
        the only per-step XLA cost of the spanning-sweep design."""
        ids_np = np.stack(
            [(base_ids + s) % (V - 256) for s in range(S)]).astype(np.int32)
        order_np = np.argsort(ids_np, axis=1).astype(np.int32)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(table, rows, order_all):
            def step(tab, order):
                sr = rows[order]
                return tab.at[:1, :1].add(sr[:1, :1].astype(tab.dtype)), ()
            table, _ = jax.lax.scan(step, table, order_all)
            return table

        order_dev = jnp.asarray(order_np)   # transfer once (see bsort_cost)
        return run, (lambda: (jnp.zeros((V, C), jnp.bfloat16), rows_j,
                              order_dev))

    def plans_cost():
        """The batched plan build itself (amortized per step of S)."""
        ids_np = np.stack(
            [(base_ids + s) % (V - 256) for s in range(S)]).astype(np.int32)

        @jax.jit
        def run(table, ids_all):
            plans = _plans_of(ids_all)
            return table.at[:1, :1].add(
                (plans[0][:1, :1] + plans[2][:1, :1]).astype(table.dtype))

        ids_dev = jnp.asarray(ids_np)   # transfer once (see bsort_cost)
        return run, (lambda: (jnp.zeros((V, C), jnp.bfloat16), ids_dev))

    # kernel-only: pre-pass hoisted out of the scan, same pallas_call
    prows0, poffs0, meta0, first0 = jax.jit(
        lambda t, i, r: prepass(t, i, r))(
        jnp.zeros((V, C), jnp.bfloat16), jnp.asarray(base_ids),
        jnp.asarray(rows_np))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_kernel_only(table, prows, poffs, meta, first):
        def step(tab, s):
            return sw._sweep_call.__wrapped__(
                tab, prows, poffs, meta, first, WINDOW, CHUNK,
                interpret), ()
        table, _ = jax.lax.scan(step, table, jnp.arange(S, dtype=jnp.int32))
        return table

    variants = {
        "noop": scan_of(body_noop),
        "noop_while": while_of(body_noop),
        "scatter": scan_of(body_scatter),
        "scatter_while": while_of(body_scatter),
        "argsort": scan_of(body_argsort),
        "prepass": scan_of(body_prepass),
        "sweep": scan_of(body_sweep),
        "sweep_while": while_of(body_sweep),
        "stage0_sort": scan_of(stage_body(0)),
        "stage1_edges": scan_of(stage_body(1)),
        "stage2_slots": scan_of(stage_body(2)),
        "stage3_rows": scan_of(stage_body(3)),
        "stage4_offs": scan_of(stage_body(4)),
    }
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    results = {}

    def time_one(name, fn, args_fn):
        args = args_fn()
        out = fn(*args)
        float(out[0, 0].astype(jnp.float32))    # compile + real sync
        t0 = time.perf_counter()
        reps = 0
        while True:
            out = fn(out, *args_fn()[1:])
            reps += 1
            float(out[0, 0].astype(jnp.float32))
            if time.perf_counter() - t0 > SECONDS:
                break
        us = (time.perf_counter() - t0) / (reps * S) * 1e6
        results[name] = round(us, 1)
        print(json.dumps({"variant": name, "us_per_step": results[name]}),
              flush=True)

    rows_j = jnp.asarray(rows_np)
    for name, fn in variants.items():
        if wanted and name not in wanted:
            continue
        try:
            time_one(name, fn,
                     lambda: (jnp.zeros((V, C), jnp.bfloat16), rows_j))
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {e}"[:300], flush=True)
    for nm, mk in (("plans_cost", plans_cost), ("bsort", bsort_cost),
                   ("sortedrows", sortedrows_cost)):
        if wanted and nm not in wanted:
            continue
        try:
            pfn, pargs = mk()
            time_one(nm, pfn, pargs)
        except Exception as e:
            print(f"{nm} FAILED: {type(e).__name__}: {e}"[:300], flush=True)
    planned_wanted = [n for n in ("planned", "planned_while")
                      if not wanted or n in wanted]
    if planned_wanted:
        plans = all_plans()
        plans = tuple(jnp.asarray(p) for p in plans)
        for name, mk in (("planned", planned_scan),
                         ("planned_while", planned_while)):
            if name not in planned_wanted:
                continue
            try:
                time_one(name, mk(),
                         lambda: (jnp.zeros((V, C), jnp.bfloat16), rows_j)
                         + plans)
            except Exception as e:
                print(f"{name} FAILED: {type(e).__name__}: {e}"[:300],
                      flush=True)
    if not wanted or "kernel" in wanted:
        try:
            time_one("kernel", run_kernel_only,
                     lambda: (jnp.zeros((V, C), jnp.bfloat16), prows0,
                              poffs0, meta0, first0))
        except Exception as e:
            print(f"kernel FAILED: {type(e).__name__}: {e}"[:300], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
