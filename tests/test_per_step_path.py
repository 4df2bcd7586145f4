"""steps_per_chunk=1 takes the no-scan donated path (the capacity mode for
huge vocab tables — lax.scan double-buffers its carried table, OOMing one
chip at >=2.5M x 800d bf16; a donated per-step jit aliases in place)."""

import numpy as np
import pytest

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.train import train


def _corpus(tmp_path, n_lines=400):
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(40)]
    p = tmp_path / "c.txt"
    p.write_text("\n".join(
        " ".join(words[rng.integers(0, 40)] for _ in range(12))
        for _ in range(n_lines)) + "\n")
    return p


@pytest.mark.parametrize("extra", [
    dict(),                                        # slab per-center
    dict(neg_sharing=8),                           # slab shared
    dict(neg_sharing=8, fused_tables=True),        # fused table
    dict(neg_sharing=8, fused_tables=True, dtype="bfloat16"),
])
def test_per_step_train_runs(tmp_path, extra):
    corpus = _corpus(tmp_path)
    out = tmp_path / "v.bin"
    cfg = Word2BitsConfig(
        train_file=str(corpus), output_file=str(out), binary=True,
        size=16, iter=2, min_count=1, batch_size=64, steps_per_chunk=1,
        debug=0, **extra)
    res = train(cfg)
    assert out.exists() and res.steps > 0
    assert np.isfinite(res.epoch_losses).all()
    # training signal exists: epoch loss improves (less negative) or stays
    assert res.epoch_losses[-1] >= res.epoch_losses[0] - abs(
        res.epoch_losses[0]) * 0.5


def test_per_step_deterministic(tmp_path):
    corpus = _corpus(tmp_path, 200)
    outs = []
    for tag in ("a", "b"):
        out = tmp_path / f"{tag}.bin"
        cfg = Word2BitsConfig(
            train_file=str(corpus), output_file=str(out), binary=True,
            size=16, iter=1, min_count=1, batch_size=64, steps_per_chunk=1,
            neg_sharing=8, fused_tables=True, debug=0, seed=7)
        train(cfg)
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]
