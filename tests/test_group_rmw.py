"""scatter_add_grmw == table.at[ids].add(rows) (interpret mode, CPU).

The sorted group-RMW kernel (kernels/group_rmw.py) replaces the capacity
path's XLA-side group-layout expansion + MXU block-dedup (measured
21.4 ms/step of prep at the flagship shape) with one sort + in-kernel
one-hot placement.  Equality is modulo float summation order (per-visit
f32 sums — strictly fewer roundings than per-row adds).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from word2bits_tpu.kernels.group_rmw import (
    group_plan,
    scatter_add_grmw,
    scatter_add_grmw_planned,
)


def _case(rng, V, C, N, dup_heavy=False):
    table = rng.normal(size=(V, C)).astype(np.float32)
    if dup_heavy:
        ids = np.minimum(rng.zipf(1.1, size=N) - 1, V - 1).astype(np.int32)
    else:
        ids = rng.integers(0, V, size=N).astype(np.int32)
    rows = rng.normal(size=(N, C)).astype(np.float32)
    return table, ids, rows


@pytest.mark.parametrize("V,C,N,chunk,slots", [
    (1024, 256, 777, 128, 16),       # N not a chunk multiple
    (1024, 256, 64, 128, 16),        # N < chunk
    (512, 128, 2048, 64, 8),         # many chunks, few groups
    (2048, 256, 1500, 128, 4),       # few slots (deep reuse)
    (64, 128, 500, 128, 16),         # more slots than groups
])
@pytest.mark.parametrize("dup_heavy", [False, True])
def test_matches_baseline(V, C, N, chunk, slots, dup_heavy, rng):
    table, ids, rows = _case(rng, V, C, N, dup_heavy)
    want = np.asarray(
        jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(rows)))
    got = np.asarray(scatter_add_grmw(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows),
        chunk=chunk, slots=slots, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_sparse_tail(rng):
    """Huge-vocab shape: few ids over many groups — every visit is its own
    group, pipeline never accumulates twice into a slot."""
    V, C, N = 16384, 128, 200
    table = rng.normal(size=(V, C)).astype(np.float32)
    ids = (rng.integers(0, 64, size=N) * 251).astype(np.int32)  # gappy
    rows = rng.normal(size=(N, C)).astype(np.float32)
    want = np.asarray(
        jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(rows)))
    got = np.asarray(scatter_add_grmw(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows),
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_group_spans_chunk_boundary(rng):
    """One hot group dominating the stream spans many chunk boundaries —
    each chunk's visit must RMW through HBM in order (drain discipline)."""
    V, C, N = 512, 128, 640
    table = rng.normal(size=(V, C)).astype(np.float32)
    ids = rng.integers(0, 8, size=N).astype(np.int32)   # all in group 0
    rows = rng.normal(size=(N, C)).astype(np.float32)
    want = np.asarray(
        jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(rows)))
    got = np.asarray(scatter_add_grmw(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows),
        chunk=64, slots=8, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_bf16_table(rng):
    """bf16 tables use 16-row groups; per-visit f32 accumulation must be at
    least as close to the exact f32 result as the per-row bf16 walk."""
    V, C, N = 1024, 256, 900
    table, ids, rows = _case(rng, V, C, N, dup_heavy=True)
    t16 = jnp.asarray(table, jnp.bfloat16)
    exact = np.asarray(t16, np.float32) + np.zeros((V, C), np.float32)
    np.add.at(exact, ids, np.asarray(jnp.asarray(rows, jnp.bfloat16),
                                     np.float32))
    base = np.asarray(
        t16.at[jnp.asarray(ids)].add(jnp.asarray(rows, jnp.bfloat16)),
        np.float32)
    got = np.asarray(scatter_add_grmw(
        t16, jnp.asarray(ids), jnp.asarray(rows, jnp.bfloat16),
        interpret=True), np.float32)
    err_got = np.abs(got - exact).max()
    err_base = np.abs(base - exact).max()
    assert err_got <= err_base + 0.25, (err_got, err_base)
    np.testing.assert_allclose(got, exact, atol=max(4 * err_base, 0.25),
                               rtol=0.05)


def test_drop_sentinel(rng):
    """ids >= V (the pad/drop sentinel) open no visit, like mode='drop'."""
    V, C, N = 512, 128, 300
    table, ids, rows = _case(rng, V, C, N)
    ids[::7] = 0x7FFFFFF0
    want = np.asarray(jnp.asarray(table).at[jnp.asarray(ids)].add(
        jnp.asarray(rows), mode="drop"))
    got = np.asarray(scatter_add_grmw(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows),
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_planned_in_scan_matches(rng):
    """The hoisted-plan path: vmapped group_plan over an S-step chunk,
    plans consumed as scan xs — the production integration shape."""
    V, C, N, S = 512, 128, 300, 3
    table = rng.normal(size=(V, C)).astype(np.float32)
    ids_all = rng.integers(0, V, size=(S, N)).astype(np.int32)
    rows_all = rng.normal(size=(S, N, C)).astype(np.float32)

    want = jnp.asarray(table)
    for s in range(S):
        want = want.at[jnp.asarray(ids_all[s])].add(jnp.asarray(rows_all[s]))
    want = np.asarray(want)

    plans = jax.vmap(lambda i: group_plan(i, 8))(jnp.asarray(ids_all))

    def step(tab, xs):
        plan, rows = xs
        return scatter_add_grmw_planned(tab, plan, rows,
                                        interpret=True), ()

    got, _ = jax.lax.scan(step, jnp.asarray(table),
                          (plans, jnp.asarray(rows_all)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-5)


def test_rejects_unpadded_vocab():
    with pytest.raises(ValueError, match="%"):
        scatter_add_grmw(jnp.zeros((1001, 128)),
                         jnp.zeros((4,), jnp.int32),
                         jnp.zeros((4, 128)), interpret=True)


@pytest.mark.parametrize("steps,pool,loop_mode", [
    (1, 1, "scan"), (2, 1, "scan"), (2, 8, "scan"),
    (2, 1, "fori"), (2, 1, "unroll"),
])
def test_fused_chunk_grmw_matches_base(rng, steps, pool, loop_mode):
    """The fused training chunk with scatter_impl='grmw' (pre-drawn
    negatives + hoisted batched plan) == the base chunk, across the scan /
    fori / unroll loop modes (fori is the huge-vocab capacity loop)."""
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_fused import make_fused_train_chunk
    from word2bits_tpu.sampling.unigram import build_alias_table

    V, D, B, W, G = 300, 16, 64, 3, 8
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=5, reg=0.1)
    n = 4 * B + 2 * W + 16
    tokens = jnp.asarray(rng.integers(0, V, size=n).astype(np.int32))
    sents = jnp.asarray((np.arange(n) // 97).astype(np.int32))
    atab = build_alias_table(np.ones(V))
    table = jnp.asarray(rng.normal(size=(V, 2 * D)).astype(np.float32))
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(B),
                           denom=jnp.float32(1e6))
    key = jax.random.PRNGKey(3)

    base = make_fused_train_chunk(hyper, V, B, steps, neg_sharing=G,
                                  neg_pool=pool, donate=False)
    t_base, l_base = base(table, tokens, sents, atab.prob, atab.alias,
                          scalars, key)

    col_pad = (-2 * D) % 128
    vpad = (-V) % 8                     # f32 group tile
    table_pad = jnp.pad(table, ((0, vpad), (0, col_pad)))
    grmw = make_fused_train_chunk(hyper, V, B, steps, neg_sharing=G,
                                  neg_pool=pool, donate=False,
                                  scatter_impl="grmw", col_pad=col_pad,
                                  loop_mode=loop_mode)
    t_g, l_g = grmw(table_pad, tokens, sents, atab.prob, atab.alias,
                    scalars, key)
    np.testing.assert_allclose(float(l_g), float(l_base), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t_g[:V, :2 * D]),
                               np.asarray(t_base), atol=1e-4, rtol=1e-4)
    assert float(jnp.max(jnp.abs(t_g[:V, 2 * D:]))) == 0.0
    assert float(jnp.max(jnp.abs(t_g[V:]))) == 0.0


@pytest.mark.parametrize("loop_mode", ["fori", "unroll"])
def test_fused_chunk_loop_modes_match_scan(rng, loop_mode):
    """loop_mode='fori'/'unroll' produce the scan path's exact updates on
    the PLAIN scatter too (the capacity path pairs fori with rmw/grmw)."""
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_fused import make_fused_train_chunk
    from word2bits_tpu.sampling.unigram import build_alias_table

    V, D, B, W, G, steps = 200, 8, 32, 2, 8, 3
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=4, reg=0.0)
    n = 4 * B + 2 * W + 16
    tokens = jnp.asarray(rng.integers(0, V, size=n).astype(np.int32))
    sents = jnp.asarray((np.arange(n) // 53).astype(np.int32))
    atab = build_alias_table(np.ones(V))
    table = jnp.asarray(rng.normal(size=(V, 2 * D)).astype(np.float32))
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(B),
                           denom=jnp.float32(1e6))
    key = jax.random.PRNGKey(7)

    mk = lambda lm: make_fused_train_chunk(  # noqa: E731
        hyper, V, B, steps, neg_sharing=G, donate=False, loop_mode=lm)
    t_scan, l_scan = mk("scan")(table, tokens, sents, atab.prob, atab.alias,
                                scalars, key)
    t_alt, l_alt = mk(loop_mode)(table, tokens, sents, atab.prob,
                                 atab.alias, scalars, key)
    np.testing.assert_allclose(float(l_alt), float(l_scan), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(t_alt), np.asarray(t_scan))
