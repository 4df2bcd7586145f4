"""Blocked device->host transfer for multi-GB tables.

A single `np.asarray(table)` on the axon backend streams the whole buffer
through the tunnel in one materialization; at flagship scale (the 3.7M x
800d fused table is 12.3 GB bf16) that one-shot fetch reproducibly wedges
the tunnel (round-4 postmortem: the fetch sat >60 min with flat RSS and
pure retry churn on the relay, while epoch training itself ran fine).
Fetching the same bytes as a sequence of bounded row-block materializations
keeps every roundtrip small enough to survive, and a transient flake costs
one block, not the whole transfer.

The analogous upload direction already ships the table once as one
host-assembled array (train.build_engine); uploads have not exhibited the
wedge (the client pipelines them), so only the fetch side is blocked here.
"""

from __future__ import annotations

import numpy as np


def to_numpy_blocked(x, block_bytes: int = 1 << 28) -> np.ndarray:
    """np.asarray(x) in row blocks of ~block_bytes (default 256 MB).

    `x` is any 2-D (or higher) jax array; small arrays (or numpy input)
    take the direct path.  Row slices are materialized one at a time into
    a preallocated host buffer.
    """
    if isinstance(x, np.ndarray):
        return x
    nbytes = getattr(x, "nbytes", 0)
    if x.ndim == 0 or nbytes <= block_bytes:
        return np.asarray(x)
    # 1-D arrays block along axis 0 too — a multi-GB 1-D fetch would hit
    # exactly the tunnel wedge this helper exists to avoid (ADVICE r4)
    n = x.shape[0]
    row_bytes = max(nbytes // max(n, 1), 1)
    rows = max(int(block_bytes // row_bytes), 1)
    out = np.empty(x.shape, dtype=np.dtype(x.dtype))
    for i in range(0, n, rows):
        out[i:i + rows] = np.asarray(x[i:i + rows])
    return out
