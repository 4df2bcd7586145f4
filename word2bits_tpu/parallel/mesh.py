"""Device mesh helpers.

The reference's only parallelism is Hogwild shared-memory threads
(reference src/word2bits.cpp:535-536) — racy unsynchronized writes to `u`/`v`.
On TPU the equivalent scaling axes are:
  * "data"  — batch parallelism (what Hogwild's threads actually provided)
  * "vocab" — parameter sharding by vocabulary rows, the scaling axis for the
    3.7M-vocab x 800d configuration (reference README.md:39) whose tables
    exceed one chip's HBM

Collectives ride ICI via XLA psum; there is no NCCL/MPI analog to port.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"
VOCAB_AXIS = "vocab"


def make_mesh(mesh_shape: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    """Build a (data, vocab) mesh. Defaults to all devices on the data axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if mesh_shape is None:
        mesh_shape = {DATA_AXIS: n, VOCAB_AXIS: 1}
    nd = mesh_shape.get(DATA_AXIS, 1)
    nv = mesh_shape.get(VOCAB_AXIS, 1)
    if nd * nv != n:
        raise ValueError(f"mesh {mesh_shape} needs {nd * nv} devices, have {n}")
    return Mesh(devices.reshape(nd, nv), (DATA_AXIS, VOCAB_AXIS))
