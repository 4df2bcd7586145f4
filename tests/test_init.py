"""init_params("reference") must reproduce the reference InitNet stream
(reference src/word2bits.cpp:343-361): one LCG from seed 1, v filled first,
then u, value = ((state & 0xFFFF)/65536) - 0.5."""

import numpy as np

from word2bits_tpu.models.init import init_params


def reference_initnet(vocab_size, size):
    A = np.uint64(25214903917)
    C = np.uint64(11)
    state = np.uint64(1)
    v = np.empty((vocab_size, size), np.float32)
    u = np.empty((vocab_size, size), np.float32)
    with np.errstate(over="ignore"):
        for a in range(vocab_size):
            for b in range(size):
                state = np.uint64(state * A + C)
                v[a, b] = np.float32(state & np.uint64(0xFFFF)) / np.float32(65536) - np.float32(0.5)
        for a in range(vocab_size):
            for b in range(size):
                state = np.uint64(state * A + C)
                u[a, b] = np.float32(state & np.uint64(0xFFFF)) / np.float32(65536) - np.float32(0.5)
    return u, v


def test_reference_init_bit_exact():
    V, D = 13, 7
    u, v = init_params(V, D, init="reference")
    ru, rv = reference_initnet(V, D)
    np.testing.assert_array_equal(np.asarray(u), ru)
    np.testing.assert_array_equal(np.asarray(v), rv)


def test_uniform_init_range():
    u, v = init_params(50, 16, init="uniform", seed=7)
    for t in (np.asarray(u), np.asarray(v)):
        assert t.min() >= -0.5 and t.max() < 0.5
    assert not np.array_equal(np.asarray(u), np.asarray(v))
