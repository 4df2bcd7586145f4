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
