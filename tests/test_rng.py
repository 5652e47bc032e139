"""splitmix64 emulation golden parity with the reference jitter
(samp_cpu.cpp:21-35), via a pure-Python uint64 oracle."""

import numpy as np
import jax.numpy as jnp

from dvren_tpu.ops import rng


def test_mix_seed_golden():
    cases = [0, 1, 42, 0xDEADBEEF, 0x123456789ABCDEF0, 2**64 - 1]
    for state in cases:
        expected = rng.mix_seed_py(state)
        hi = jnp.uint32((state >> 32) & 0xFFFFFFFF)
        lo = jnp.uint32(state & 0xFFFFFFFF)
        got_hi, got_lo = rng.mix_seed(hi, lo)
        got = (int(got_hi) << 32) | int(got_lo)
        assert got == expected, f"state={state:#x}"


def test_mix_seed_vectorized_golden():
    states = np.random.default_rng(3).integers(
        0, 2**64, size=256, dtype=np.uint64)
    hi = jnp.asarray((states >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((states & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    got_hi, got_lo = rng.mix_seed(hi, lo)
    got = (np.asarray(got_hi).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(got_lo).astype(np.uint64)
    expected = np.array([rng.mix_seed_py(int(s)) for s in states],
                        dtype=np.uint64)
    np.testing.assert_array_equal(got, expected)


def test_stratified_jitter_matches_oracle():
    seed = 1234567
    rays = jnp.arange(64, dtype=jnp.int32)[:, None]
    steps = jnp.arange(32, dtype=jnp.int32)[None, :]
    got = np.asarray(rng.stratified_jitter(seed, rays, steps))
    for r in range(0, 64, 7):
        for s in range(0, 32, 5):
            exp = rng.stratified_jitter_py(seed, r, s)
            assert abs(got[r, s] - exp) <= 2e-7, (r, s)


def test_jitter_range_and_spread():
    got = np.asarray(rng.stratified_jitter(
        9, jnp.arange(128, dtype=jnp.int32)[:, None],
        jnp.arange(64, dtype=jnp.int32)[None, :]))
    assert np.all(got >= 0.0) and np.all(got < 1.0)
    assert abs(got.mean() - 0.5) < 0.02
    assert got.std() > 0.2


def test_jitter_deterministic():
    a = np.asarray(rng.stratified_jitter(
        5, jnp.arange(16, dtype=jnp.int32)[:, None],
        jnp.arange(8, dtype=jnp.int32)[None, :]))
    b = np.asarray(rng.stratified_jitter(
        5, jnp.arange(16, dtype=jnp.int32)[:, None],
        jnp.arange(8, dtype=jnp.int32)[None, :]))
    assert a.tobytes() == b.tobytes()  # memcmp-level, hp_runner.cpp:1033
