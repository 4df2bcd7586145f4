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


class TestStratifiedSampler:
    def _weights(self, V=2000, seed=0):
        rng = np.random.default_rng(seed)
        counts = np.sort(rng.zipf(1.2, 4 * V))[::-1][:V].astype(np.float64)
        counts[0] = counts[1]
        return counts ** 0.75

    def test_lane_structure_and_ranges(self):
        from word2bits_tpu.sampling.unigram import (
            build_stratified_tables, draw_negatives_stratified)
        w = self._weights()
        st = build_stratified_tables(w, 64)
        kh, wh, wc = st.lane_split(12)
        ids = np.asarray(draw_negatives_stratified(
            jax.random.PRNGKey(0), st.hot, st.cold, 50, 2, 12, kh,
            64)).reshape(50, 2, 12)
        assert (ids[:, :, :kh] > 0).all() and (ids[:, :, :kh] < 64).all()
        assert (ids[:, :, kh:] >= 64).all() and (ids[:, :, kh:] < 2000).all()

    def test_weighted_marginal_matches_effective_distribution(self):
        """Importance-weighted stratified histogram == the plain sampler's
        effective distribution (alias dist + remap-0 fold-in)."""
        from word2bits_tpu.sampling.unigram import (
            build_stratified_tables, draw_negatives_stratified)
        V, H, K = 2000, 64, 24
        w = self._weights(V)
        st = build_stratified_tables(w, H)
        kh, wh, wc = st.lane_split(K)
        n = 40_000
        ids = np.asarray(draw_negatives_stratified(
            jax.random.PRNGKey(3), st.hot, st.cold, n, 1, K, kh, H))
        lane_w = np.where(np.arange(K) < kh, wh, wc)
        weff = w.copy()
        weff[1:] += weff[0] / (V - 1)
        weff[0] = 0.0
        weff /= weff.sum()
        lw = np.broadcast_to(lane_w, ids.shape)
        assert ids[0].shape == (K,)
        for lo, hi in [(1, 10), (10, H), (H, 400), (400, V)]:
            m = (ids >= lo) & (ids < hi)
            got = lw[m].sum() / lw.sum()
            want = weff[lo:hi].sum()
            assert abs(got - want) < 0.01, (lo, hi, got, want)
        assert not (ids == 0).any()

    def test_lane_split_edges(self):
        from word2bits_tpu.sampling.unigram import build_stratified_tables
        w = self._weights()
        # H >= V: everything hot, weights exactly 1
        st = build_stratified_tables(w, 5000)
        kh, wh, wc = st.lane_split(8)
        assert (kh, wh, wc) == (8, 1.0, 0.0)
        # tiny H: hot stratum still gets >= 1 lane
        st2 = build_stratified_tables(w, 2)
        kh2, wh2, wc2 = st2.lane_split(8)
        assert 1 <= kh2 <= 7 and wh2 > 0 and wc2 > 0
        # unbiasedness identity: kh*wh + (K-kh)*wc == K
        for st_, K in ((st2, 8), (build_stratified_tables(w, 64), 24)):
            kh_, wh_, wc_ = st_.lane_split(K)
            assert abs(kh_ * wh_ + (K - kh_) * wc_ - K) < 1e-9


def test_native_alias_build_bit_identical():
    """The C++ Walker construction must match the Python builder exactly
    (same stack order, same float ops)."""
    from word2bits_tpu import native
    import word2bits_tpu.sampling.unigram as ug
    if native.lib is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for n in (1, 2, 17, 5000):
        w = np.maximum(rng.zipf(1.2, n).astype(np.float64), 1.0) ** 0.75
        t_nat = ug.build_alias_table(w)
        saved, native.lib = native.lib, None
        try:
            t_py = ug.build_alias_table(w)
        finally:
            native.lib = saved
        np.testing.assert_array_equal(np.asarray(t_nat.alias),
                                      np.asarray(t_py.alias))
        np.testing.assert_array_equal(np.asarray(t_nat.prob),
                                      np.asarray(t_py.prob))


def test_lane_split_rejects_single_lane():
    """K=1 cannot give both nonzero strata a lane — the old clamps
    contradicted (kh=1 > K-1=0) and silently zeroed the cold weight."""
    import numpy as np
    import pytest
    from word2bits_tpu.sampling.unigram import build_stratified_tables

    st = build_stratified_tables(np.arange(1, 40, dtype=np.float64)[::-1], 8)
    assert 0.0 < st.p_hot < 1.0
    with pytest.raises(ValueError, match="negative >= 2"):
        st.lane_split(1)
    kh, wh, wc = st.lane_split(2)   # minimum legal K
    assert kh == 1 and abs(kh * wh + (2 - kh) * wc - 2.0) < 1e-9
