"""Host-sharded vocab pass: split counts == whole-corpus counts."""

import numpy as np
import pytest

from word2bits_tpu.data.corpus import count_words
from word2bits_tpu.parallel.multihost import (
    count_words_range,
    host_byte_range,
    initialize,
    merge_counts,
)


@pytest.mark.parametrize("num_hosts", [1, 2, 3, 5])
def test_sharded_counts_equal_full(tmp_path, num_hosts):
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(40)]
    toks = rng.choice(words, 5000)
    data = (" ".join(toks) + " ").encode()
    p = tmp_path / "c.txt"
    p.write_bytes(data)

    full = count_words(str(p), use_native=False)
    parts = []
    for h in range(num_hosts):
        s, e = host_byte_range(str(p), h, num_hosts)
        parts.append(count_words_range(str(p), s, e))
    merged = merge_counts(parts)
    merged.setdefault("</s>", 0)
    assert merged == full


def test_initialize_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize() is False
