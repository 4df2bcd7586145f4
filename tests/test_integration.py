"""End-to-end: tiny corpus -> train -> loss improves -> serialize -> evaluate.
Includes a cross-check of our binary output against the *compiled reference
evaluator* when a C compiler is available (SURVEY.md section 4 acceptance)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from word2bits_tpu.config import Word2BitsConfig
from word2bits_tpu.train import train
from word2bits_tpu.io.vectors import read_vectors

REFERENCE_SRC = "/root/reference/src/compute-accuracy.c"


def _make_corpus(path, n_sentences=300, seed=0):
    """Synthetic corpus with learnable co-occurrence: topic words cluster."""
    rng = np.random.default_rng(seed)
    topics = [
        ["cat", "dog", "pet", "fur", "paw"],
        ["sun", "moon", "star", "sky", "cloud"],
        ["red", "blue", "green", "color", "paint"],
    ]
    fillers = ["the", "a", "of", "and", "to"]
    lines = []
    for _ in range(n_sentences):
        t = topics[rng.integers(len(topics))]
        words = []
        for _ in range(rng.integers(8, 15)):
            if rng.random() < 0.3:
                words.append(fillers[rng.integers(len(fillers))])
            else:
                words.append(t[rng.integers(len(t))])
        lines.append(" ".join(words))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    corpus = str(d / "corpus.txt")
    _make_corpus(corpus)
    out = str(d / "vectors.bin")
    cfg = Word2BitsConfig(
        train_file=corpus, output_file=out, bitlevel=1, size=16, window=3,
        negative=5, iter=3, min_count=2, alpha=0.05, sample=1e-3, binary=True,
        batch_size=64, steps_per_chunk=8, save_vocab_file=str(d / "vocab.txt"),
    )
    result = train(cfg)
    return d, cfg, result


def test_loss_defined_and_finite(trained):
    _, _, result = trained
    assert len(result.epoch_losses) == 3
    assert all(np.isfinite(l) for l in result.epoch_losses)
    # NS log-likelihood: should trend upward (less negative) as training goes
    assert result.epoch_losses[-1] > result.epoch_losses[0]


def test_output_file_readable_and_quantized(trained):
    d, cfg, result = trained
    words, vecs = read_vectors(str(d / "vectors.bin"))
    assert words == result.vocab.words
    assert vecs.shape == (result.vocab.size, cfg.size)
    third = np.float32(1.0) / np.float32(3.0)
    assert set(np.unique(vecs)) <= {third, -third}


def test_vocab_file_written(trained):
    d, cfg, result = trained
    lines = open(d / "vocab.txt").read().splitlines()
    assert lines[0].startswith("</s> ")
    assert len(lines) == result.vocab.size


def test_our_evaluator_runs_on_output(trained):
    d, cfg, result = trained
    from word2bits_tpu.eval.analogy import AnalogyQuestions, evaluate_analogies

    words, vecs = read_vectors(str(d / "vectors.bin"))
    q = AnalogyQuestions(
        sections=["s1"],
        questions=[(0, "CAT", "DOG", "SUN", "MOON"),
                   (0, "OOV1", "DOG", "SUN", "MOON")])
    res = evaluate_analogies(words, vecs, q, bitlevel=0)
    assert res.total_questions == 2
    assert res.seen_questions == 1  # the OOV one skipped


def test_save_every_epoch(tmp_path):
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=50)
    out = str(tmp_path / "v.txt")
    cfg = Word2BitsConfig(train_file=corpus, output_file=out, bitlevel=1,
                          size=8, window=2, negative=3, iter=2, min_count=1,
                          batch_size=32, steps_per_chunk=4,
                          save_every_epoch=True, debug=0)
    train(cfg)
    assert os.path.exists(out)
    assert os.path.exists(out + "_epoch0")
    assert os.path.exists(out + "_epoch1")


def test_classes_nonzero_writes_empty_file(tmp_path):
    """Reference quirk: -classes != 0 produces an empty output
    (reference src/word2bits.cpp:561-576)."""
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=30)
    out = str(tmp_path / "v.txt")
    cfg = Word2BitsConfig(train_file=corpus, output_file=out, classes=7,
                          size=8, window=2, negative=2, iter=1, min_count=1,
                          batch_size=32, steps_per_chunk=4, debug=0)
    train(cfg)
    assert os.path.exists(out)
    assert os.path.getsize(out) == 0


@pytest.mark.skipif(shutil.which("gcc") is None or not os.path.exists(REFERENCE_SRC),
                    reason="no C compiler or reference source")
def test_reference_evaluator_reads_our_binary(trained, tmp_path_factory):
    """Byte-compat acceptance: the reference compute-accuracy C binary must
    parse our binary vector file and agree with our evaluator."""
    d, cfg, result = trained
    bindir = tmp_path_factory.mktemp("refbin")
    exe = str(bindir / "compute-accuracy")
    subprocess.run(["gcc", REFERENCE_SRC, "-o", exe, "-lm", "-O2"],
                   check=True, capture_output=True)

    questions = "\n".join([
        ": section-one",
        "cat dog sun moon",
        "sun moon cat dog",
        "red blue cat dog",
    ]) + "\n"
    proc = subprocess.run([exe, str(d / "vectors.bin"), "0", "0"],
                          input=questions.encode(),
                          capture_output=True, timeout=60)
    out = proc.stdout.decode()
    assert "ACCURACY TOP1" in out, out

    # our evaluator on the same file+questions
    from word2bits_tpu.eval.analogy import (
        AnalogyQuestions, evaluate_analogies, format_report)
    words, vecs = read_vectors(str(d / "vectors.bin"))
    q = AnalogyQuestions(sections=["section-one"], questions=[
        (0, "CAT", "DOG", "SUN", "MOON"),
        (0, "SUN", "MOON", "CAT", "DOG"),
        (0, "RED", "BLUE", "CAT", "DOG"),
    ])
    res = evaluate_analogies(words, vecs, q, bitlevel=0)

    # parse reference's final accuracy count "(x / y)"
    import re
    m = re.findall(r"ACCURACY TOP1: [\d.]+ %  \((\d+) / (\d+)\)", out)
    assert m, out
    ref_correct, ref_seen = int(m[-1][0]), int(m[-1][1])
    assert ref_seen == max(res.seen_questions, 1)
    assert ref_correct == int(res.section_correct.sum())
