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

    SEPS = (b" ", b"\t", b"\n")

    def _find_sep(buf, lo):
        hits = [i for i in (buf.find(s, lo) for s in SEPS) if i != -1]
        return min(hits) if hits else -1

    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start + 4096 + 1)
        extra = len(data) - (end - start)

        if start > 0:
            # drop the leading partial word
            i = _find_sep(data, 0)
            if i == -1:
                return {}
            data = data[i:]
        if extra > 0:
            # keep through the end of the word that starts before `end`;
            # a word longer than the initial 4 KB tail keeps being read
            # until its separator (or EOF) so no mid-word fragment is ever
            # counted (the single-host pass sees the whole token)
            scan_from = len(data) - extra
            while True:
                cut = _find_sep(data, scan_from)
                if cut != -1:
                    data = data[:cut + 1]
                    break
                more = f.read(1 << 16)
                if not more:
                    # the straddling word runs to EOF unterminated: the
                    # reference ReadWord DROPS it
                    # (reference src/word2bits.cpp:277-279) — cut it away
                    last = max(data.rfind(s) for s in SEPS)
                    if last == -1:
                        return {}
                    data = data[:last + 1]
                    break
                scan_from = len(data)
                data = data + more

    from collections import Counter
    # data now always ends at a separator (interior boundary) or at the
    # EOF-drop cut, matching what the single-host pass counts for this
    # range — no synthetic separator is needed.
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
