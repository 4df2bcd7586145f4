"""Vectorized LCG skip-ahead vs a scalar oracle."""

import numpy as np

from word2bits_tpu.utils.lcg import lcg_uniform_block, lcg_values_scalar, lcg_states_at


def test_block_matches_scalar_oracle():
    want = lcg_values_scalar(500, seed=1)
    got = lcg_uniform_block(0, 500, seed=1)
    np.testing.assert_array_equal(got, want)


def test_block_offsets_compose():
    full = lcg_uniform_block(0, 300)
    a = lcg_uniform_block(0, 100)
    b = lcg_uniform_block(100, 150)
    c = lcg_uniform_block(250, 50)
    np.testing.assert_array_equal(np.concatenate([a, b, c]), full)


def test_states_at_large_k():
    # state after k steps computed by skip-ahead == iterated scalar steps
    k = 12345
    s = np.uint64(1)
    with np.errstate(over="ignore"):
        for _ in range(k):
            s = np.uint64(s * np.uint64(25214903917) + np.uint64(11))
    got = lcg_states_at(np.asarray([k]))[0]
    assert got == s


def test_values_in_range():
    vals = lcg_uniform_block(0, 10000)
    assert vals.min() >= -0.5
    assert vals.max() < 0.5
    # Mean of uniform(-0.5, 0.5) ~ 0
    assert abs(vals.mean()) < 0.01


def test_native_fill_equals_numpy_lane_path():
    """lcg_uniform_block dispatches to the native w2b_lcg_fill when built;
    both implementations must produce the identical stream (the numpy
    lane-strided path is itself oracle-checked above)."""
    from word2bits_tpu import native
    import word2bits_tpu.utils.lcg as L
    if native.lib is None:
        import pytest
        pytest.skip("native lib unavailable")
    # cross a lane boundary and a thread-chunk boundary shape
    for start, n in ((0, 5), (65_530, 200), (1_000_003, 70_000)):
        nat = native.lib.lcg_fill(start, n)
        ks = np.arange(start + 1, start + n + 1, dtype=np.uint64)
        ref = ((L.lcg_states_at(ks) & np.uint64(0xFFFF)).astype(np.float32)
               / np.float32(65536.0) - np.float32(0.5))
        np.testing.assert_array_equal(nat, ref)
