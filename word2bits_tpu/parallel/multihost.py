"""Multi-host bootstrap and host-sharded data pipeline.

The reference's parallelism is confined to one process (SURVEY.md section 2
C17); scaling beyond a single host here follows standard JAX practice:

  * `initialize()` wires `jax.distributed` (coordinator address from env or
    args) so all hosts join one runtime; the (data, vocab) mesh then spans
    every chip in the slice and the shard_map steps in
    parallel/sharded_slab.py are unchanged — XLA routes the psums over
    ICI/DCN.
  * corpus work is sharded by host the way the reference shards by thread
    (byte ranges, reference src/word2bits.cpp:377): each host counts its
    range, counts are summed via an allgather, and each host encodes only
    its range for its data shards.

Failure handling is standard JAX fail-fast: a lost host aborts the step;
recovery = restart from the latest checkpoint (train.py checkpoints full
state each epoch).  This container exposes a single host, so these paths are
exercised at unit level (count-merge) and via the driver's virtual-device
dryrun; the jax.distributed call itself is a no-op guard when unset.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the multi-host runtime. Returns True if distributed mode is on.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are omitted; silently stays single-host when neither is provided.
    """
    import jax

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return False
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    pid = process_id if process_id is not None else \
        int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    return True


def host_byte_range(path: str, host_id: int, num_hosts: int):
    """The byte range host `host_id` scans — same slop semantics as the
    reference's per-thread fseek sharding (src/word2bits.cpp:377): ranges
    split evenly; a word straddling a boundary is read by the range that
    contains its first byte's successor scan."""
    size = os.path.getsize(path)
    start = size * host_id // num_hosts
    end = size * (host_id + 1) // num_hosts
    return start, end


def count_words_range(path: str, start: int, end: int) -> Dict[str, int]:
    """Frequency-count only [start, end) of the corpus (host-local pass).
    Boundary handling: skip the first partial word unless at 0; read through
    the word that begins before `end`."""
    from word2bits_tpu.data.corpus import split_tokens

    with open(path, "rb") as f:
        f.seek(start)
        chunk = f.read(end - start + 4096 + 1)
    extra = len(chunk) - (end - start)

    data = chunk
    if start > 0:
        # drop the leading partial word
        for i, b in enumerate(data):
            if b in (0x20, 0x09, 0x0A):
                data = data[i:]
                break
        else:
            return {}
    if extra > 0:
        # keep through the end of the word that starts before `end`
        tail = data[-(extra):]
        cut = len(data) - extra
        for i, b in enumerate(tail):
            if b in (0x20, 0x09, 0x0A):
                cut = len(data) - extra + i + 1
                break
        data = data[:cut]

    from collections import Counter
    # Only a range trimmed at an interior boundary gets a synthetic separator
    # (its last word IS terminated in the full file, by the byte at `end`+).
    # The final host's range reaches EOF, where the reference ReadWord (and
    # single-host count_words) DROP a trailing unterminated word
    # (reference src/word2bits.cpp:277-279) — appending b' ' there would
    # resurrect it and diverge from the single-host count.
    if extra > 0:
        data = data + b" "
    counts = Counter(split_tokens(data))
    return {k.decode("utf-8", errors="surrogateescape"): v
            for k, v in counts.items()}


def merge_counts(per_host: List[Dict[str, int]]) -> Dict[str, int]:
    """Sum per-host count dicts (the allgather-reduce of the vocab pass)."""
    out: Dict[str, int] = {}
    for d in per_host:
        for w, c in d.items():
            out[w] = out.get(w, 0) + c
    return out
