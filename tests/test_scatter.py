"""scatter_add_dedup / scatter_add_sorted == the serialized .at[].add
baseline for adversarial duplicate patterns (the correctness gate for the
hot-loop scatter replacement; reference updates src/word2bits.cpp:489-503)."""

import jax.numpy as jnp
import numpy as np
import pytest

from word2bits_tpu.ops.scatter import scatter_add_dedup, scatter_add_sorted

V, C = 257, 40


def _case(rng, n, zipf=True):
    if zipf:
        ids = np.minimum(rng.zipf(1.3, size=n) - 1, V - 1).astype(np.int32)
    else:
        ids = rng.integers(0, V, size=n).astype(np.int32)
    rows = rng.normal(size=(n, C)).astype(np.float32)
    return ids, rows


@pytest.mark.parametrize("block", [32, 100, 1024])
@pytest.mark.parametrize("n", [1, 31, 32, 33, 500])
def test_dedup_matches_baseline(block, n):
    rng = np.random.default_rng(n * 7 + block)
    ids, rows = _case(rng, n)
    table = rng.normal(size=(V, C)).astype(np.float32)
    want = jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(rows))
    got = scatter_add_dedup(jnp.asarray(table), jnp.asarray(ids),
                            jnp.asarray(rows), block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dedup_all_same_id():
    """Worst case: every row updates one id (maximal serialization)."""
    rng = np.random.default_rng(0)
    n = 300
    ids = np.zeros(n, np.int32) + 7
    rows = rng.normal(size=(n, C)).astype(np.float32)
    table = np.zeros((V, C), np.float32)
    got = scatter_add_dedup(jnp.asarray(table), jnp.asarray(ids),
                            jnp.asarray(rows), 64)
    np.testing.assert_allclose(np.asarray(got)[7], rows.sum(0),
                               rtol=1e-5, atol=1e-4)
    assert np.all(np.asarray(got)[np.arange(V) != 7] == 0)


def test_dedup_bf16_at_least_as_accurate():
    """The f32 in-block combine + one bf16 add must stay within the
    baseline's own bf16 rounding envelope."""
    rng = np.random.default_rng(1)
    ids, rows = _case(rng, 400)
    table = rng.normal(size=(V, C)).astype(np.float32)
    exact = jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(rows))
    got = scatter_add_dedup(jnp.asarray(table, jnp.bfloat16),
                            jnp.asarray(ids), jnp.asarray(rows), 128)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(exact), rtol=0.02, atol=0.05)


def test_sorted_matches_baseline():
    rng = np.random.default_rng(2)
    ids, rows = _case(rng, 333, zipf=False)
    table = rng.normal(size=(V, C)).astype(np.float32)
    want = jnp.asarray(table).at[jnp.asarray(ids)].add(jnp.asarray(rows))
    got = scatter_add_sorted(jnp.asarray(table), jnp.asarray(ids),
                             jnp.asarray(rows))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dedup_block_step_equivalence():
    """slab_step with dedup_block produces the same tables as the serialized
    scatter path (f32, exact modulo float summation order)."""
    import jax.numpy as jnp

    from word2bits_tpu.models.cbow import CBOWHyper
    from word2bits_tpu.models.cbow_slab import slab_step
    from tests.test_cbow_slab import _setup

    B, W, K = 32, 3, 4
    u, v, inputs = _setup(B=B, W=W, K=K)
    hyper = CBOWHyper(bitlevel=1, size=16, window=W, negative=K, reg=0.01)
    alpha = jnp.float32(0.05)
    u1, v1, l1 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                           hyper, B, neg_sharing=0, dedup_block=0)
    u2, v2, l2 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                           hyper, B, neg_sharing=0, dedup_block=64)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_dedup_block_cli_train(tmp_path):
    """-dedup-block reaches both chunk builders end-to-end."""
    from word2bits_tpu.config import config_from_argv
    from word2bits_tpu.train import train

    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(30)]
    corpus = tmp_path / "c.txt"
    corpus.write_text("\n".join(
        " ".join(words[rng.integers(0, 30)] for _ in range(12))
        for _ in range(300)) + "\n")
    for extra in (["-neg-sharing", "8", "-fused-tables", "1"], []):
        out = tmp_path / f"v{len(extra)}.bin"
        cfg = config_from_argv([
            "-train", str(corpus), "-output", str(out), "-binary", "1",
            "-size", "16", "-iter", "1", "-min-count", "1",
            "-batch-size", "64", "-dedup-block", "128", "-debug", "0"]
            + extra)
        assert cfg.dedup_block == 128
        res = train(cfg)
        assert out.exists() and res.steps > 0
