"""Integration numeric goldens (int_cpu_constant / int_cpu_piecewise /
int_cpu_gaussian / int_cpu_early_stop analogues; hp_runner.cpp:1134-1370)
plus parity of the parallel-cumprod formulation against a sequential oracle.
"""

import math

import numpy as np
import jax.numpy as jnp

from dvren_tpu.ops.integrate import (
    STOP_THRESHOLD, Integration, compute_alpha, integrate)


def run(sigma, color, dt, mask=None, t_near=0.0, t_far=None):
    sigma = jnp.asarray(sigma, jnp.float32)
    color = jnp.asarray(color, jnp.float32)
    dt = jnp.asarray(dt, jnp.float32)
    if mask is None:
        mask = jnp.ones(sigma.shape, bool)
    else:
        mask = jnp.asarray(mask, bool)
    if t_far is None:
        t_far = float(np.asarray(dt).sum(axis=1).max()) + float(t_near)
    return integrate(sigma, color, dt, mask, t_near, t_far)


def sequential_oracle(sigma, color, dt, t_near=0.0, t_far=1.0):
    """Literal transcription of the int_cpu.cpp:173-226 loop in float64."""
    n, k = sigma.shape
    rad = np.zeros((n, 3))
    trans = np.ones(n)
    depth = np.full(n, t_far)
    aux = np.zeros((n, k, 4))
    for r in range(n):
        T = 1.0
        acc = np.zeros(3)
        dw = 0.0
        t_cursor = t_near
        for i in range(k):
            od = sigma[r, i] * dt[r, i]
            if od <= 0.0:
                alpha = 0.0
            elif od < 1e-4:
                alpha = od * (1 - 0.5 * od)
            else:
                alpha = min(max(-math.expm1(-od), 0.0), 1.0)
            T_before = T
            w = T_before * alpha
            acc += w * color[r, i]
            dw += w * (t_cursor + 0.5 * dt[r, i])
            aux[r, i] = (alpha, w, T_before,
                         math.log(max(T_before, 1e-30)))
            T *= max(1.0 - alpha, 0.0)
            t_cursor += dt[r, i]
            if T <= STOP_THRESHOLD:
                break
        rad[r] = acc
        trans[r] = T
        op = 1.0 - T
        depth[r] = dw / op if op > 1e-6 else t_far
    return rad, trans, depth, aux


def test_constant_medium_analytic():
    """Constant sigma: T = exp(-sigma * L); radiance = (1 - T) * c."""
    sigma_val, L, steps = 2.0, 1.0, 64
    dt = L / steps
    sigma = np.full((1, steps), sigma_val, np.float32)
    color = np.full((1, steps, 3), 0.7, np.float32)
    out = run(sigma, color, np.full((1, steps), dt), t_far=L)
    T_expect = math.exp(-sigma_val * L)
    assert abs(float(out.transmittance[0]) - T_expect) < 1e-5
    np.testing.assert_allclose(
        np.asarray(out.radiance[0]), (1 - T_expect) * 0.7, rtol=1e-5)
    assert abs(float(out.opacity[0]) - (1 - T_expect)) < 1e-5


def test_piecewise_vs_sequential_oracle():
    rng = np.random.default_rng(4)
    n, k = 8, 32
    sigma = rng.uniform(0, 5, (n, k)).astype(np.float32)
    sigma[:, k // 2:] *= rng.integers(0, 2, (n, k // 2))  # some zeros
    color = rng.uniform(0, 1, (n, k, 3)).astype(np.float32)
    dt = np.full((n, k), 0.03, np.float32)
    out = run(sigma, color, dt, t_far=0.03 * k)
    rad, trans, depth, aux = sequential_oracle(
        sigma, color, dt, t_far=0.03 * k)
    np.testing.assert_allclose(np.asarray(out.radiance), rad,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.transmittance), trans,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.depth), depth,
                               rtol=1e-4, atol=1e-5)


def test_gaussian_profile_converges():
    """Gaussian density: integral matches erf-based optical depth."""
    steps = 512
    L = 1.0
    dt = L / steps
    ts = (np.arange(steps) + 0.5) * dt
    sigma = 10.0 * np.exp(-((ts - 0.5) ** 2) / (2 * 0.1 ** 2))
    out = run(sigma[None].astype(np.float32),
              np.ones((1, steps, 3), np.float32),
              np.full((1, steps), dt, np.float32), t_far=L)
    tau = 10.0 * 0.1 * math.sqrt(2 * math.pi)  # full Gaussian integral
    T_expect = math.exp(-tau)
    assert abs(float(out.transmittance[0]) - T_expect) < 1e-3


def test_early_stop_matches_sequential():
    """Dense medium saturates; unprocessed tail has zero aux
    (int_cpu_early_stop analogue, hp_runner.cpp:1362-1370)."""
    n, k = 2, 40
    sigma = np.full((n, k), 50.0, np.float32)
    color = np.random.default_rng(5).uniform(0, 1, (n, k, 3)).astype(np.float32)
    dt = np.full((n, k), 0.1, np.float32)
    out = run(sigma, color, dt, t_far=4.0)
    rad, trans, depth, aux = sequential_oracle(sigma, color, dt, t_far=4.0)
    np.testing.assert_allclose(np.asarray(out.radiance), rad, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.transmittance), trans,
                               rtol=1e-4, atol=1e-7)
    got_aux = np.asarray(out.aux)
    np.testing.assert_allclose(got_aux, aux, rtol=1e-4, atol=1e-6)
    # termination: T after 2 samples = exp(-10) < 1e-4 -> samples >= 3 unprocessed
    assert np.all(got_aux[:, 3:, :] == 0.0)


def test_masked_slots_contribute_nothing():
    n, k = 4, 16
    rng = np.random.default_rng(6)
    sigma = rng.uniform(0, 3, (n, k)).astype(np.float32)
    color = rng.uniform(0, 1, (n, k, 3)).astype(np.float32)
    dt = np.full((n, k), 0.05, np.float32)
    mask = np.zeros((n, k), bool)
    mask[:, :10] = True
    dt_masked = dt * mask
    out_masked = run(sigma, color, dt_masked, mask=mask, t_far=0.5)
    out_short = run(sigma[:, :10], color[:, :10], dt[:, :10], t_far=0.5)
    np.testing.assert_allclose(np.asarray(out_masked.radiance),
                               np.asarray(out_short.radiance), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_masked.transmittance),
                               np.asarray(out_short.transmittance), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_masked.depth),
                               np.asarray(out_short.depth), rtol=1e-6)


def test_compute_alpha_branches():
    # od <= 0
    assert float(compute_alpha(jnp.float32(0.0), jnp.float32(1.0))) == 0.0
    assert float(compute_alpha(jnp.float32(-1.0), jnp.float32(1.0))) == 0.0
    # tiny od: Taylor
    got = float(compute_alpha(jnp.float32(1e-5), jnp.float32(1.0)))
    assert abs(got - (1e-5 * (1 - 0.5e-5))) < 1e-12
    # large od clamps to 1
    assert float(compute_alpha(jnp.float32(1e4), jnp.float32(1.0))) == 1.0
    # mid-range matches expm1
    got = float(compute_alpha(jnp.float32(0.5), jnp.float32(0.4)))
    assert abs(got - (-math.expm1(-0.2))) < 1e-6


def test_empty_rays_background():
    out = run(np.zeros((2, 4), np.float32), np.zeros((2, 4, 3), np.float32),
              np.full((2, 4), 0.1, np.float32), t_near=0.25, t_far=0.65)
    np.testing.assert_allclose(np.asarray(out.transmittance), 1.0)
    np.testing.assert_allclose(np.asarray(out.opacity), 0.0)
    np.testing.assert_allclose(np.asarray(out.depth), 0.65)  # t_far
    np.testing.assert_allclose(np.asarray(out.radiance), 0.0)
