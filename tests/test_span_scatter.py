"""scatter_add_span == table.at[ids].add(rows) (interpret mode, CPU).

The spanning sweep kernel (kernels/span_scatter.py) streams SORTED rows in
plain chunks and walks the windows each chunk spans — no slot plan, so its
pre-pass is one sort (hoistable) instead of the per-slot int gathers that
sank sweep_scatter's plan.  Equality is modulo float summation order
(per-visit f32 sums — strictly fewer roundings than per-row adds).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from word2bits_tpu.kernels.span_scatter import (
    scatter_add_span,
    scatter_add_span_planned,
    span_plan,
)


def _case(rng, V, C, N, dup_heavy=False):
    table = rng.normal(size=(V, C)).astype(np.float32)
    if dup_heavy:
        ids = np.minimum(rng.zipf(1.1, size=N) - 1, V - 1).astype(np.int32)
    else:
        ids = rng.integers(0, V, size=N).astype(np.int32)
    rows = rng.normal(size=(N, C)).astype(np.float32)
    return table, ids, rows


@pytest.mark.parametrize("V,C,N,window,chunk", [
    (1024, 256, 777, 512, 128),      # N not a chunk multiple
    (1024, 256, 64, 512, 128),       # N < chunk
    (512, 128, 2048, 128, 64),       # small windows, chunks span many
    (2048, 256, 1500, 1024, 128),    # wide windows
])
@pytest.mark.parametrize("dup_heavy", [False, True])
def test_matches_baseline(V, C, N, window, chunk, dup_heavy, rng):
    table, ids, rows = _case(rng, V, C, N, dup_heavy)
    want = np.asarray(
        jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(rows)))
    got = np.asarray(scatter_add_span(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows),
        window=window, chunk=chunk, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_sparse_tail_skips_empty_windows(rng):
    """Huge-vocab shape: few ids scattered over many windows — correctness
    of the edges-based empty-window skip inside wide [wfirst, wlast] spans."""
    V, C, N = 16384, 128, 200
    table = rng.normal(size=(V, C)).astype(np.float32)
    ids = (rng.integers(0, 64, size=N) * 251).astype(np.int32)  # gappy
    rows = rng.normal(size=(N, C)).astype(np.float32)
    want = np.asarray(
        jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(rows)))
    got = np.asarray(scatter_add_span(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows),
        window=512, chunk=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_bf16_table(rng):
    """bf16 sums: per-visit f32 accumulation must be at least as close to
    the exact f32 result as the baseline's per-row bf16 rounding walk."""
    V, C, N = 1024, 256, 900
    table, ids, rows = _case(rng, V, C, N, dup_heavy=True)
    t16 = jnp.asarray(table, jnp.bfloat16)
    exact = np.asarray(t16, np.float32) + np.zeros((V, C), np.float32)
    np.add.at(exact, ids, np.asarray(jnp.asarray(rows, jnp.bfloat16),
                                     np.float32))
    base = np.asarray(
        t16.at[jnp.asarray(ids)].add(jnp.asarray(rows, jnp.bfloat16)),
        np.float32)
    got = np.asarray(scatter_add_span(
        t16, jnp.asarray(ids), jnp.asarray(rows, jnp.bfloat16),
        interpret=True), np.float32)
    err_got = np.abs(got - exact).max()
    err_base = np.abs(base - exact).max()
    assert err_got <= err_base + 0.25, (err_got, err_base)
    np.testing.assert_allclose(got, exact, atol=max(4 * err_base, 0.25),
                               rtol=0.05)


def test_drop_sentinel(rng):
    """ids >= V (the dedup/pad drop sentinel) are dropped like mode='drop'."""
    V, C, N = 512, 128, 300
    table, ids, rows = _case(rng, V, C, N)
    ids[::7] = 0x7FFFFFF0
    want = np.asarray(jnp.asarray(table).at[jnp.asarray(ids)].add(
        jnp.asarray(rows), mode="drop"))
    got = np.asarray(scatter_add_span(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows),
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_all_one_window(rng):
    """Every id in one window: every chunk continues the same open window
    (no write-back until the final drain)."""
    V, C, N = 1024, 128, 640
    table = rng.normal(size=(V, C)).astype(np.float32)
    ids = rng.integers(0, 40, size=N).astype(np.int32)
    rows = rng.normal(size=(N, C)).astype(np.float32)
    want = np.asarray(
        jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(rows)))
    got = np.asarray(scatter_add_span(
        jnp.asarray(table), jnp.asarray(ids), jnp.asarray(rows),
        window=256, chunk=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_planned_in_scan_matches(rng):
    """The hoisted-plan path: vmapped span_plan over an S-step chunk, plans
    consumed as scan xs — the production integration shape."""
    V, C, N, S = 512, 128, 300, 3
    table = rng.normal(size=(V, C)).astype(np.float32)
    ids_all = rng.integers(0, V, size=(S, N)).astype(np.int32)
    rows_all = rng.normal(size=(S, N, C)).astype(np.float32)

    want = jnp.asarray(table)
    for s in range(S):
        want = want.at[jnp.asarray(ids_all[s])].add(jnp.asarray(rows_all[s]))
    want = np.asarray(want)

    plans = jax.vmap(lambda i: span_plan(i, V))(jnp.asarray(ids_all))

    def step(tab, xs):
        plan, rows = xs
        return scatter_add_span_planned(tab, plan, rows,
                                        interpret=True), ()

    got, _ = jax.lax.scan(step, jnp.asarray(table),
                          (plans, jnp.asarray(rows_all)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-5)


def test_rejects_unpadded_vocab():
    with pytest.raises(ValueError, match="window"):
        scatter_add_span(jnp.zeros((1000, 128)),
                         jnp.zeros((4,), jnp.int32),
                         jnp.zeros((4, 128)), window=512, interpret=True)


@pytest.mark.parametrize("steps,pool", [(1, 1), (2, 1), (2, 8)])
def test_fused_chunk_span_matches_base(rng, steps, pool):
    """The fused training chunk with scatter_impl='span' (pre-drawn
    negatives + hoisted batched plan as scan xs) == the base chunk (padded
    storage; same updates modulo float order)."""
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
    vpad = (-V) % 512
    table_pad = jnp.pad(table, ((0, vpad), (0, col_pad)))
    span = make_fused_train_chunk(hyper, V, B, steps, neg_sharing=G,
                                  neg_pool=pool, donate=False,
                                  scatter_impl="span", col_pad=col_pad)
    t_span, l_span = span(table_pad, tokens, sents, atab.prob, atab.alias,
                          scalars, key)
    np.testing.assert_allclose(float(l_span), float(l_base), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t_span[:V, :2 * D]),
                               np.asarray(t_base), atol=1e-4, rtol=1e-4)
    assert float(jnp.max(jnp.abs(t_span[:, 2 * D:]))) == 0.0
    assert float(jnp.max(jnp.abs(t_span[V:]))) == 0.0


@pytest.mark.parametrize("sharing,steps", [(0, 1), (0, 2), (8, 2)])
def test_slab_chunk_span_matches_base(rng, sharing, steps):
    """The SLAB training chunk with scatter_impl='span' (separate u/v
    tables, two sweeps; scan path hoists both plans) == the base chunk —
    including neg_sharing=0, the exact-reference-semantics per-center mode
    whose B*(K+1)-row v-scatter is the exact path's throughput bound
    (reference src/word2bits.cpp:450-504)."""
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_slab import make_slab_train_chunk
    from word2bits_tpu.sampling.unigram import build_alias_table

    V, D, B, W = 300, 16, 64, 3
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=5, reg=0.1)
    n = 4 * B + 2 * W + 16
    tokens = jnp.asarray(rng.integers(0, V, size=n).astype(np.int32))
    sents = jnp.asarray((np.arange(n) // 97).astype(np.int32))
    atab = build_alias_table(np.ones(V))
    u = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(B),
                           denom=jnp.float32(1e6))
    key = jax.random.PRNGKey(0)

    base = make_slab_train_chunk(hyper, V, B, steps, neg_sharing=sharing,
                                 donate=False)
    u0, v0, l0 = base(u, v, tokens, sents, atab.prob, atab.alias,
                      scalars, key)

    sw = 64
    cp, vp = (-D) % 128, (-V) % sw
    span = make_slab_train_chunk(hyper, V, B, steps, neg_sharing=sharing,
                                 donate=False, scatter_impl="span",
                                 span_window=sw, span_chunk=32)
    u1, v1, l1 = span(jnp.pad(u, ((0, vp), (0, cp))),
                      jnp.pad(v, ((0, vp), (0, cp))),
                      tokens, sents, atab.prob, atab.alias, scalars, key)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u1[:V, :D]), np.asarray(u0),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v1[:V, :D]), np.asarray(v0),
                               atol=1e-4, rtol=1e-4)
    for t in (u1, v1):  # padding must stay exactly zero
        assert float(jnp.max(jnp.abs(t[V:]))) == 0.0
        assert float(jnp.max(jnp.abs(t[:, D:]))) == 0.0


@pytest.mark.parametrize("steps", [1, 2])
def test_slab_chunk_span_rank1_matches_base(rng, steps):
    """reg == 0 routes the per-center v-update through the RANK-1 span
    apply (scatter_add_span_rank1: rows formed from [B,K] coefficients x
    cavg inside the permute, no [B,K,D] dv tensor) — must equal the base
    chunk exactly like the materialized path (VERDICT r4 item 2)."""
    from word2bits_tpu.models.cbow import CBOWHyper, ChunkScalars
    from word2bits_tpu.models.cbow_slab import make_slab_train_chunk
    from word2bits_tpu.sampling.unigram import build_alias_table

    V, D, B, W = 300, 16, 64, 3
    hyper = CBOWHyper(bitlevel=1, size=D, window=W, negative=5, reg=0.0)
    n = 4 * B + 2 * W + 16
    tokens = jnp.asarray(rng.integers(0, V, size=n).astype(np.int32))
    sents = jnp.asarray((np.arange(n) // 97).astype(np.int32))
    atab = build_alias_table(np.ones(V))
    u = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    scalars = ChunkScalars(base0=jnp.int32(W), alpha0=jnp.float32(0.05),
                           wca_start=jnp.float32(0.0),
                           wca_per_step=jnp.float32(B),
                           denom=jnp.float32(1e6))
    key = jax.random.PRNGKey(1)

    base = make_slab_train_chunk(hyper, V, B, steps, neg_sharing=0,
                                 donate=False)
    u0, v0, l0 = base(u, v, tokens, sents, atab.prob, atab.alias,
                      scalars, key)
    sw = 64
    cp, vp = (-D) % 128, (-V) % sw
    span = make_slab_train_chunk(hyper, V, B, steps, neg_sharing=0,
                                 donate=False, scatter_impl="span",
                                 span_window=sw, span_chunk=32,
                                 span_rank1=True)
    u1, v1, l1 = span(jnp.pad(u, ((0, vp), (0, cp))),
                      jnp.pad(v, ((0, vp), (0, cp))),
                      tokens, sents, atab.prob, atab.alias, scalars, key)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u1[:V, :D]), np.asarray(u0),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v1[:V, :D]), np.asarray(v0),
                               atol=1e-4, rtol=1e-4)
    for t in (u1, v1):
        assert float(jnp.max(jnp.abs(t[V:]))) == 0.0
        assert float(jnp.max(jnp.abs(t[:, D:]))) == 0.0
