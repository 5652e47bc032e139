"""Pallas fused integration kernel vs the jnp reference path.

The analogue of the reference's CUDA-vs-CPU parity blocks
(``tests/render/test_smoke_forward.cpp:107-263``, tolerance 2e-3): here the
roles are jnp reference (oracle) vs Pallas kernel, gated much tighter
(1e-5, the BASELINE.json parity budget). Runs the kernel in interpreter mode
on CPU; the same code compiles for TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvren_tpu.ops.integrate import integrate
from dvren_tpu.ops.integrate_pallas import integrate_pallas
from dvren_tpu.ops.diff import per_sample_grads

INTERPRET = jax.default_backend() != "tpu"


def scene(n=40, k=50, seed=0, saturating=False):
    rng = np.random.default_rng(seed)
    hi = 40.0 if saturating else 4.0
    sigma = rng.uniform(0.0, hi, (n, k)).astype(np.float32)
    color = rng.uniform(0, 1, (n, k, 3)).astype(np.float32)
    dt = np.full((n, k), 0.05, np.float32)
    mask = np.ones((n, k), bool)
    # ragged tails like real sampling
    lens = rng.integers(k // 2, k + 1, n)
    for i, L in enumerate(lens):
        mask[i, L:] = False
        dt[i, L:] = 0.0
    return (jnp.asarray(sigma), jnp.asarray(color), jnp.asarray(dt),
            jnp.asarray(mask))


@pytest.mark.parametrize("saturating", [False, True])
def test_forward_parity(saturating):
    sigma, color, dt, mask = scene(saturating=saturating)
    ref = integrate(sigma, color, dt, mask, 0.3, 2.8)
    rad, trans, opac, depth = integrate_pallas(
        sigma, color, dt, mask, 0.3, 2.8, 64, INTERPRET)
    np.testing.assert_allclose(np.asarray(rad), np.asarray(ref.radiance),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(trans),
                               np.asarray(ref.transmittance),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(opac), np.asarray(ref.opacity),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_large_k():
    sigma, color, dt, mask = scene(n=16, k=200, seed=3)
    ref = integrate(sigma, color, dt, mask, 0.0, 10.5)
    rad, trans, opac, depth = integrate_pallas(
        sigma, color, dt, mask, 0.0, 10.5, 8, INTERPRET)
    np.testing.assert_allclose(np.asarray(rad), np.asarray(ref.radiance),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                               rtol=1e-4, atol=1e-5)


def test_backward_parity():
    """Pallas custom-VJP gradients == jnp vjp gradients (hp_diff contract)."""
    sigma, color, dt, mask = scene(seed=5)
    g = jnp.asarray(
        np.random.default_rng(6).uniform(-1, 1, (sigma.shape[0], 3)),
        jnp.float32)

    ds_ref, dc_ref = per_sample_grads(g, sigma, color, dt, mask)

    def loss(s, c):
        rad, _, _, _ = integrate_pallas(s, c, dt, mask, 0.3, 2.8,
                                        64, INTERPRET)
        return jnp.vdot(rad, g)

    ds, dc = jax.grad(loss, argnums=(0, 1))(sigma, color)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_ref),
                               rtol=1e-4, atol=1e-7)


def test_backward_parity_early_termination():
    sigma, color, dt, mask = scene(seed=7, saturating=True)
    g = jnp.asarray(
        np.random.default_rng(8).uniform(-1, 1, (sigma.shape[0], 3)),
        jnp.float32)
    ds_ref, dc_ref = per_sample_grads(g, sigma, color, dt, mask)

    def loss(s, c):
        rad, _, _, _ = integrate_pallas(s, c, dt, mask, 0.3, 2.8,
                                        64, INTERPRET)
        return jnp.vdot(rad, g)

    ds, dc = jax.grad(loss, argnums=(0, 1))(sigma, color)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_ref),
                               rtol=1e-4, atol=1e-7)


def test_odd_shapes_padding():
    """Non-multiples of tile/lane sizes survive the padding path."""
    sigma, color, dt, mask = scene(n=7, k=13, seed=9)
    ref = integrate(sigma, color, dt, mask, 0.1, 0.75)
    rad, trans, opac, depth = integrate_pallas(
        sigma, color, dt, mask, 0.1, 0.75, 8, INTERPRET)
    np.testing.assert_allclose(np.asarray(rad), np.asarray(ref.radiance),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(trans),
                               np.asarray(ref.transmittance),
                               rtol=1e-5, atol=1e-7)
