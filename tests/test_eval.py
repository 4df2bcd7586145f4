"""Analogy evaluator vs a transcription of the reference scan
(reference src/compute-accuracy.c:114-186)."""

import numpy as np

from word2bits_tpu.eval.analogy import (
    AnalogyQuestions,
    evaluate_analogies,
    format_report,
    load_questions,
)


def _reference_eval(words, M, questions, bitlevel=0):
    """Scalar transcription of the reference evaluator for small cases."""
    from tests.test_quantize import ref_quantize_py

    vocab = [w.upper() for w in words]
    Mq = np.vectorize(lambda x: ref_quantize_py(float(x), bitlevel))(M).astype(np.float32)
    norms = np.sqrt((Mq ** 2).sum(1, keepdims=True))
    Mn = Mq / np.where(norms == 0, 1, norms)

    def find(w):
        for i, x in enumerate(vocab):
            if x == w:
                return i
        return len(vocab)

    seen = np.zeros(len(questions.sections), np.int64)
    correct = np.zeros(len(questions.sections), np.int64)
    tq = 0
    for sec, a, b, c, d in questions.questions:
        tq += 1
        b1, b2, b3 = find(a), find(b), find(c)
        if len(vocab) in (b1, b2, b3):
            continue
        bd = find(d)
        if bd == len(vocab):
            continue
        vec = Mn[b2] - Mn[b1] + Mn[b3]
        bestd, best = 0.0, -1
        for r in range(len(vocab)):
            if r in (b1, b2, b3):
                continue
            dist = float(vec @ Mn[r])
            if dist > bestd:
                bestd, best = dist, r
        seen[sec] += 1
        if best == bd:
            correct[sec] += 1
    return seen, correct, tq


def _toy_setup():
    # Construct vectors where KING - MAN + WOMAN ~= QUEEN
    words = ["</s>", "man", "woman", "king", "queen", "apple", "orange",
             "walk", "walked", "run", "ran"]
    rng = np.random.default_rng(0)
    D = 16
    base = {w: rng.normal(0, 0.1, D) for w in words}
    royal = rng.normal(0, 1, D)
    female = rng.normal(0, 1, D)
    past = rng.normal(0, 1, D)
    M = np.stack([
        base["</s>"],
        base["man"],
        base["man"] + female,
        base["man"] + royal,
        base["man"] + royal + female,
        base["apple"] + rng.normal(0, 1, D),
        base["orange"] + rng.normal(0, 1, D),
        base["walk"],
        base["walk"] + past,
        base["run"],
        base["run"] + past,
    ]).astype(np.float32)
    questions = AnalogyQuestions(
        sections=["family", "s2", "s3", "s4", "s5", "gram-past"],
        questions=[
            (0, "MAN", "WOMAN", "KING", "QUEEN"),
            (0, "WOMAN", "MAN", "QUEEN", "KING"),
            (0, "MAN", "WOMAN", "OOVWORD", "QUEEN"),  # skipped: OOV
            (5, "WALK", "WALKED", "RUN", "RAN"),
            (5, "WALKED", "WALK", "RAN", "RUN"),
        ],
    )
    return words, M, questions


def test_matches_reference_scan():
    words, M, questions = _toy_setup()
    for bl in (0, 1):
        res = evaluate_analogies(words, M, questions, bitlevel=bl)
        seen, correct, tq = _reference_eval(words, M, questions, bitlevel=bl)
        np.testing.assert_array_equal(res.section_seen, seen)
        np.testing.assert_array_equal(res.section_correct, correct)
        assert res.total_questions == tq
        assert res.seen_questions == seen.sum()


def test_analogy_solves_toy():
    words, M, questions = _toy_setup()
    res = evaluate_analogies(words, M, questions, bitlevel=0)
    assert res.seen_questions == 4  # one OOV question skipped
    # exactness vs the reference scan is covered by
    # test_matches_reference_scan; here just require signal above chance
    assert res.section_correct.sum() >= 1
    assert 0 < res.coverage < 100


def test_semantic_syntactic_split():
    words, M, questions = _toy_setup()
    res = evaluate_analogies(words, M, questions, bitlevel=0)
    # sections 0-4 semantic, 5+ syntactic (reference QID<=5)
    assert res.section_seen[:5].sum() == 2
    assert res.section_seen[5:].sum() == 2


def test_threshold_truncation():
    words, M, questions = _toy_setup()
    res = evaluate_analogies(words, M, questions, bitlevel=0, threshold=4)
    # queen (row 4) now OOV -> its questions skipped
    assert res.seen_questions == 0 or res.seen_questions < 4


def test_report_format():
    words, M, questions = _toy_setup()
    res = evaluate_analogies(words, M, questions, bitlevel=0)
    rep = format_report(res)
    assert "ACCURACY TOP1:" in rep
    assert "Total accuracy:" in rep
    assert "Questions seen / total:" in rep
    assert rep.count("%") >= 8


def test_load_questions_file(tmp_path):
    p = tmp_path / "q.txt"
    p.write_text(": capital-common-countries\nathens greece baghdad iraq\n"
                 ": gram1-adjective-to-adverb\namazing amazingly apparent apparently\n")
    q = load_questions(str(p))
    assert q.sections == ["capital-common-countries", "gram1-adjective-to-adverb"]
    assert q.questions[0] == (0, "ATHENS", "GREECE", "BAGHDAD", "IRAQ")
    assert q.questions[1][0] == 1


def test_real_google_analogies_parse():
    """The actual dataset (from the reference checkout) parses to the counts
    SURVEY.md C22 documents."""
    import os
    path = "/root/reference/data/google_analogies_test_set/questions-words.txt"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference dataset not present")
    q = load_questions(path)
    assert len(q.sections) == 14
    assert len(q.questions) == 19544
    assert q.sections[0] == "capital-common-countries"


def test_bf16_table_branch_matches_f32(monkeypatch):
    """The flagship-scale bf16 table shipping path (analogy._BF16_TABLE_
    BYTES) produces the same rankings as the f32 path on a well-separated
    toy problem (round 4; the branch only triggers >2 GB in production)."""
    import word2bits_tpu.eval.analogy as A

    words, M, qs = _toy_setup()
    full = evaluate_analogies(words, M, qs)
    monkeypatch.setattr(A, "_BF16_TABLE_BYTES", 0)
    small = evaluate_analogies(words, M, qs)
    assert small.total_accuracy == full.total_accuracy
    assert small.coverage == full.coverage


def test_to_numpy_blocked_roundtrip():
    """utils/fetch.to_numpy_blocked == np.asarray for every block split."""
    import jax.numpy as jnp
    from word2bits_tpu.utils.fetch import to_numpy_blocked

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(103, 17)).astype(np.float32))
    ref = np.asarray(x)
    for bb in (1, 64, 1000, 10**9):
        out = to_numpy_blocked(x, block_bytes=bb)
        np.testing.assert_array_equal(out, ref)
    # bf16 path preserves bits
    xb = x.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        to_numpy_blocked(xb, block_bytes=128).view(np.uint16),
        np.asarray(xb).view(np.uint16))
    # 1-D and numpy inputs take the direct path
    np.testing.assert_array_equal(to_numpy_blocked(x[:, 0]), ref[:, 0])
    np.testing.assert_array_equal(to_numpy_blocked(ref), ref)
