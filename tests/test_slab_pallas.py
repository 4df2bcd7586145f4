"""slab_step with the fused Pallas negative phase == XLA path."""

import jax.numpy as jnp
import numpy as np

from word2bits_tpu.models.cbow import CBOWHyper
from word2bits_tpu.models.cbow_slab import slab_step
from tests.test_cbow_slab import _setup


def test_pallas_path_matches_xla_path():
    B, W, K, G = 32, 3, 4, 8
    u, v, inputs = _setup(B=B, W=W, K=K)
    rng = np.random.default_rng(11)
    negs = rng.integers(1, 50, (B // G, K)).astype(np.int32)
    inputs = inputs._replace(neg_ids=jnp.asarray(negs))
    hyper = CBOWHyper(bitlevel=1, size=16, window=W, negative=K, reg=0.01)
    alpha = jnp.float32(0.05)

    u1, v1, l1 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                           hyper, B, neg_sharing=G, use_pallas=False)
    u2, v2, l2 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                           hyper, B, neg_sharing=G, use_pallas=True)

    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-5)


def test_fused_pallas_path_matches_xla_path():
    """fused_slab_step(use_pallas=True) == XLA path (the bench-config
    integration surface: -fused-tables 1 -use-pallas 1)."""
    from word2bits_tpu.models.cbow_fused import fused_slab_step, interleave

    B, W, K, G = 32, 3, 4, 8
    u, v, inputs = _setup(B=B, W=W, K=K)
    rng = np.random.default_rng(12)
    negs = rng.integers(1, 50, (B // G, K)).astype(np.int32)
    inputs = inputs._replace(neg_ids=jnp.asarray(negs))
    hyper = CBOWHyper(bitlevel=1, size=16, window=W, negative=K, reg=0.01)
    alpha = jnp.float32(0.05)
    table = interleave(jnp.asarray(u), jnp.asarray(v))

    t1, l1 = fused_slab_step(table, inputs, alpha, hyper, B, G,
                             use_pallas=False)
    t2, l2 = fused_slab_step(table, inputs, alpha, hyper, B, G,
                             use_pallas=True)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-5)


def test_use_pallas_cli_wiring(tmp_path):
    """-use-pallas reaches the train loop (end-to-end tiny run)."""
    from word2bits_tpu.config import config_from_argv
    from word2bits_tpu.train import train

    corpus = tmp_path / "c.txt"
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(30)]
    corpus.write_text("\n".join(
        " ".join(words[rng.integers(0, 30)] for _ in range(12))
        for _ in range(300)) + "\n")
    out = tmp_path / "v.bin"
    cfg = config_from_argv([
        "-train", str(corpus), "-output", str(out), "-binary", "1",
        "-size", "16", "-iter", "1", "-min-count", "1", "-batch-size", "64",
        "-neg-sharing", "8", "-use-pallas", "1", "-debug", "0"])
    assert cfg.use_pallas
    res = train(cfg)
    assert out.exists() and res.steps > 0


def test_use_pallas_requires_neg_sharing():
    import pytest
    from word2bits_tpu.config import Word2BitsConfig
    with pytest.raises(ValueError, match="neg_sharing"):
        Word2BitsConfig(use_pallas=True)


def test_pallas_path_matches_xla_path_neg_pool():
    """use_pallas with neg_pool > 1: the in-kernel pool mask must match the
    XLA pool_mask path exactly."""
    B, W, K, G, P = 32, 3, 4, 8, 4
    u, v, inputs = _setup(B=B, W=W, K=K)
    rng = np.random.default_rng(17)
    negs = rng.integers(1, 50, (B // G, P * K)).astype(np.int32)
    inputs = inputs._replace(neg_ids=jnp.asarray(negs))
    hyper = CBOWHyper(bitlevel=2, size=16, window=W, negative=K, reg=0.01)
    alpha = jnp.float32(0.05)

    u1, v1, l1 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                           hyper, B, neg_sharing=G, neg_pool=P,
                           use_pallas=False)
    u2, v2, l2 = slab_step(jnp.asarray(u), jnp.asarray(v), inputs, alpha,
                           hyper, B, neg_sharing=G, neg_pool=P,
                           use_pallas=True)

    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-5)
