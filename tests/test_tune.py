"""cli tune: the throughput auto-tuner (word2bits_tpu/tune.py).

The tuner measures candidate step variants through train.build_engine —
the same construction train() uses — so these tests assert (a) every
generated overlay survives config validation, (b) the end-to-end CLI run
produces measurements and a recommendation.
"""

import dataclasses

import numpy as np
import pytest

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.tune import run_tune, variants


def _cfg(tmp_path, **kw):
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(80)]
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(
        " ".join(words[rng.integers(80)] for _ in range(12))
        for _ in range(800)) + "\n")
    base = dict(train_file=str(corpus), size=16, window=3, negative=5,
                min_count=1, batch_size=64, steps_per_chunk=2, iter=1,
                seed=1, debug=0)
    base.update(kw)
    return Word2BitsConfig(**base)


def test_variants_all_validate(tmp_path):
    cfg = _cfg(tmp_path)
    vs = variants(cfg, V=81)
    names = [n for n, _, _ in vs]
    assert names[0] == "as-given"
    assert "hot-rows" in names and "dense-hot" in names
    for name, overlay, note in vs:
        # every overlay must survive the config's own validation
        dataclasses.replace(cfg, **overlay)
        assert note


def test_variants_skipgram_and_mesh_reduced(tmp_path):
    sg = _cfg(tmp_path, model="skipgram")
    names = [n for n, _, _ in variants(sg, V=81)]
    assert names == ["as-given", "dense-hot", "bf16"]
    for _, overlay, _ in variants(sg, V=81):
        dataclasses.replace(sg, **overlay)
    mesh = _cfg(tmp_path, mesh_shape={"data": 2, "vocab": 4})
    assert [n for n, _, _ in variants(mesh, V=81)] == ["as-given"]


def test_run_tune_skipgram(tmp_path, capsys):
    cfg = _cfg(tmp_path, model="skipgram")
    rc = run_tune(cfg, seconds=0.05)
    out = capsys.readouterr().out
    assert rc == 0 and "recommended:" in out
    measured = out.count("M words/sec")
    assert measured >= 2  # as-given + at least one overlay must measure


def test_run_tune_mesh(tmp_path, capsys):
    """Sharded configs must be measurable (engine.sharded path), not crash
    through the chunk_fn=None branch."""
    cfg = _cfg(tmp_path, mesh_shape={"data": 2, "vocab": 4})
    rc = run_tune(cfg, seconds=0.05)
    out = capsys.readouterr().out
    assert rc == 0
    assert "as-given" in out and "recommended:" in out


def test_run_tune_max_variants(tmp_path, capsys):
    cfg = _cfg(tmp_path)
    rc = run_tune(cfg, seconds=0.05, max_variants=2)
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("M words/sec") == 2


def test_run_tune_end_to_end(tmp_path, capsys):
    cfg = _cfg(tmp_path)
    rc = run_tune(cfg, seconds=0.05)
    out = capsys.readouterr().out
    assert rc == 0
    assert "recommended:" in out
    assert "as-given" in out
    # at least the as-given row must carry a positive measurement
    assert "M words/sec" in out


def test_run_tune_json(tmp_path, capsys):
    cfg = _cfg(tmp_path)
    rc = run_tune(cfg, seconds=0.05, as_json=True)
    out = capsys.readouterr().out
    assert rc == 0
    import json
    last = [l for l in out.splitlines() if l.startswith("{")][-1]
    obj = json.loads(last)
    assert obj["recommended"]
    assert obj["words_per_sec"] > 0
    measured = [r for r in obj["rows"] if "words_per_sec" in r]
    assert len(measured) >= 2
    assert all("error" not in r for r in measured)
