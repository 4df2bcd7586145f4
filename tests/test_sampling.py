"""Alias-table unigram^0.75 sampler (SURVEY.md section 2 C6)."""

import jax
import jax.numpy as jnp
import numpy as np

from word2bits_tpu.sampling.unigram import build_alias_table, draw_negatives


def test_alias_table_distribution_exact():
    """Expected draw frequency matches count^0.75 (chi-square, SURVEY.md §4)."""
    counts = np.asarray([0, 1000, 100, 10, 1, 500], dtype=np.float64)
    weights = counts ** 0.75
    table = build_alias_table(weights)
    n = 200_000
    draws = np.asarray(
        draw_negatives(jax.random.PRNGKey(0), table, (n,), len(counts)))
    # id 0 is remapped away (reference :457)
    assert (draws == 0).sum() == 0
    got = np.bincount(draws, minlength=len(counts)).astype(np.float64)

    p = weights / weights.sum()
    # 0-draws get remapped uniformly to [1, V-1]
    expect = p * n
    expect[1:] += expect[0] / (len(counts) - 1)
    expect[0] = 0
    # chi-square on nonzero-expectation bins
    mask = expect > 5
    chi2 = np.sum((got[mask] - expect[mask]) ** 2 / expect[mask])
    dof = mask.sum() - 1
    # generous: p-value ~ 1e-6 threshold
    assert chi2 < dof * 8, (chi2, dof, got, expect)


def test_alias_probabilities_sum():
    w = np.asarray([3.0, 1.0, 1.0, 1.0])
    t = build_alias_table(w)
    # implied distribution: P(i) = (prob[i] + sum_j alias[j]==i of (1-prob[j])) / V
    prob = np.asarray(t.prob, np.float64)
    alias = np.asarray(t.alias)
    V = len(w)
    implied = prob.copy()
    for j in range(V):
        if alias[j] != j:
            implied[alias[j]] += 1 - prob[j]
    implied /= V
    np.testing.assert_allclose(implied, w / w.sum(), atol=1e-7)


def test_draw_shape_and_range():
    t = build_alias_table(np.asarray([1.0, 5.0, 2.0]))
    d = draw_negatives(jax.random.PRNGKey(1), t, (8, 4), 3)
    assert d.shape == (8, 4)
    arr = np.asarray(d)
    assert arr.min() >= 1 and arr.max() < 3
