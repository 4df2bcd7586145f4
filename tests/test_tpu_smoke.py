"""Opt-in on-TPU smoke tests (ADVICE r2: the Pallas RMW kernel's compiled
Mosaic semantics are otherwise covered only by ad-hoc tool runs).

The suite forces CPU (conftest.py), so these run the device check in a
SUBPROCESS with the session's axon environment.  Skipped unless
W2B_TPU_SMOKE=1 — the tunnel's first dispatch costs 30-150 s and wedges
under load (CLAUDE.md), so this must never run in the default ~8-min gate:

    W2B_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SMOKE = r"""
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
from word2bits_tpu.kernels.scatter_pallas import scatter_add_rmw

rng = np.random.default_rng(0)
V, C, N = 4096, 256, 2048
table = rng.normal(size=(V, C)).astype(np.float32)
ids = np.minimum(rng.zipf(1.2, size=N) - 1, V - 1).astype(np.int32)
rows = rng.normal(size=(N, C)).astype(np.float32)

for dt in (jnp.float32, jnp.bfloat16):
    t = jnp.asarray(table, dt)
    want = np.asarray(t.at[jnp.asarray(ids)].add(
        jnp.asarray(rows, dt)), np.float32)
    got = np.asarray(scatter_add_rmw(
        jnp.asarray(table, dt), jnp.asarray(ids), jnp.asarray(rows, dt),
        block=256, slots=16, interpret=False), np.float32)
    # duplicate combine sums in f32 before the table-dtype store; bf16
    # rounding differs from one-by-one accumulation by ~1 ulp per dup
    tol = 1e-4 if dt == jnp.float32 else 0.15
    np.testing.assert_allclose(got, want, atol=tol, rtol=tol)
    print("ok", dt.__name__, flush=True)
print("SMOKE_PASS", flush=True)
"""


@pytest.mark.skipif(not os.environ.get("W2B_TPU_SMOKE"),
                    reason="opt-in: set W2B_TPU_SMOKE=1 (needs the live TPU; "
                           "first dispatch 30-150s through the axon tunnel)")
def test_rmw_scatter_compiled_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the axon plugin claim the backend
    env["PYTHONPATH"] = REPO + ":/root/.axon_site"
    r = subprocess.run([sys.executable, "-c", _SMOKE], env=env,
                       capture_output=True, text=True, timeout=600)
    assert "SMOKE_PASS" in r.stdout, (
        f"rc={r.returncode}\nstdout:\n{r.stdout}\nstderr:\n"
        + "\n".join(r.stderr.splitlines()[-15:]))
