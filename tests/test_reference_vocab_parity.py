"""Golden-file vocab parity vs the reference binary on the same corpus
(SURVEY.md section 4 integration item).

Note: the reference *parses* no -save-vocab/-read-vocab flags (the globals
exist and TrainModel honors them, but main() never sets them —
reference src/word2bits.cpp:596-611 lacks those ArgPos lines, unlike
original word2vec).  Our CLI supports them as a working superset.  To get
the reference's vocabulary we run it with -iter 0 and read the words out of
its vector file (rows are emitted in vocab order, :564-574)."""

import os
import shutil
import subprocess

import pytest

from word2bits_tpu.data.corpus import build_vocab
from word2bits_tpu.io.vectors import read_vectors
from tests.test_integration import _make_corpus

REFERENCE_SRC = "/root/reference/src/word2bits.cpp"

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not os.path.exists(REFERENCE_SRC),
    reason="no g++ or reference source")


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    d = tmp_path_factory.mktemp("refbin")
    exe = str(d / "word2bits")
    subprocess.run(["g++", REFERENCE_SRC, "-o", exe, "-lm", "-pthread", "-O2",
                    "-Wno-unused-result"],
                   check=True, capture_output=True)
    return exe


@pytest.mark.parametrize("min_count", [1, 2])
def test_vocab_matches_reference(tmp_path, ref_binary, min_count):
    corpus = str(tmp_path / "c.txt")
    _make_corpus(corpus, n_sentences=200, seed=3)

    out = str(tmp_path / f"ref_vec_{min_count}.bin")
    subprocess.run([ref_binary, "-train", corpus, "-output", out,
                    "-iter", "0", "-binary", "1", "-size", "4",
                    "-min-count", str(min_count), "-debug", "0"],
                   check=True, capture_output=True, timeout=120)
    ref_words, _ = read_vectors(out)

    ours = build_vocab(corpus, min_count=min_count)

    # same vocabulary (as a set) and the same size
    assert set(ref_words) == set(ours.words)
    assert len(ref_words) == ours.size
    # both pin </s> at row 0
    assert ref_words[0] == "</s>" == ours.words[0]
    # the reference's emission order must be non-increasing under OUR counts
    # (both sort by count; tie order is qsort-unspecified in the reference)
    counts = {w: int(c) for w, c in zip(ours.words, ours.counts)}
    ref_cns = [counts[w] for w in ref_words[1:]]
    assert all(a >= b for a, b in zip(ref_cns, ref_cns[1:]))
