"""Gradient referee: sparse central finite differences.

The analogue of the reference's FD gradient gate
(``hp_runner.cpp:1867-1953``; spec gate rel-err <= 1e-3 with eps 1e-3,
DESIGN_SPECIFICATION.md:233) extended to voxel-grid and camera gradients -
the reference verifies per-sample gradients only and its camera gradient is
a zero stub.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvren_tpu import (
    CameraConfig, Context, DenseGridConfig, DenseGridField, Plan, PlanConfig,
    Renderer, SamplingConfig,
)
from dvren_tpu.ops import diff as diff_ops
from dvren_tpu.ops.integrate import radiance_only
from dvren_tpu.render.pipeline import render

N_GRID = 6
W, H = 6, 5


def make_scene(seed=0):
    rng = np.random.default_rng(seed)
    sigma = rng.uniform(0.5, 4.0, (N_GRID,) * 3).astype(np.float32)
    color = rng.uniform(0.1, 0.9, (N_GRID,) * 3 + (3,)).astype(np.float32)
    field = DenseGridField.create(DenseGridConfig(
        resolution=(N_GRID,) * 3, sigma=sigma.reshape(-1),
        color=color.reshape(-1)))
    plan = Plan.create(PlanConfig(
        width=W, height=H, t_near=0.3, t_far=2.2,
        camera=CameraConfig(
            k=(7.0, 0, 3.0, 0, 7.0, 2.5, 0, 0, 1.0),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=0.06, max_steps=40)))
    return plan, field


def rel_err(got, want):
    denom = max(abs(want), 1e-4)
    return abs(got - want) / denom


def adjoint_oracle(g, sigma, color, dt):
    """Literal float64 transcription of the reference reverse adjoint
    recurrence (diff_cpu.cpp:156-195) over a dense lattice - the exact
    referee for per-sample gradients."""
    import math
    n, k = sigma.shape
    d_sigma = np.zeros((n, k))
    d_color = np.zeros((n, k, 3))
    for r in range(n):
        # forward pass to persist aux (alpha, weight, T_before)
        T = 1.0
        aux = []
        stop = k
        for i in range(k):
            od = float(sigma[r, i]) * float(dt[r, i])
            if od <= 0.0:
                alpha = 0.0
            elif od < 1e-4:
                alpha = od * (1 - 0.5 * od)
            else:
                alpha = min(max(-math.expm1(-od), 0.0), 1.0)
            aux.append((alpha, T * alpha, T))
            T *= max(1 - alpha, 0.0)
            if T <= 1e-4:
                stop = i + 1
                break
        adj_T_next = 0.0
        for i in reversed(range(k)):
            if i >= stop or i >= len(aux):
                continue
            alpha, weight, T_prev = aux[i]
            dot = float(np.dot(g[r], color[r, i]))
            d_color[r, i] = g[r] * weight
            adj_alpha = dot * T_prev - adj_T_next * T_prev
            adj_T_prev = dot * alpha + adj_T_next * (1 - alpha)
            d_sigma[r, i] = adj_alpha * float(dt[r, i]) * (1 - alpha)
            adj_T_next = adj_T_prev
    return d_sigma, d_color


def test_per_sample_grads_match_reference_adjoint():
    """vjp-derived per-sample grads == hand-written reference adjoint
    recurrence (diff_cpu.cpp:156-195) in float64."""
    rng = np.random.default_rng(1)
    n, k = 6, 16
    sigma = rng.uniform(0.2, 3.0, (n, k)).astype(np.float32)
    color = rng.uniform(0, 1, (n, k, 3)).astype(np.float32)
    dt = np.full((n, k), 0.05, np.float32)
    g = rng.uniform(-1, 1, (n, 3)).astype(np.float32)

    d_sigma, d_color = diff_ops.per_sample_grads(
        jnp.asarray(g), jnp.asarray(sigma), jnp.asarray(color),
        jnp.asarray(dt), jnp.ones((n, k), bool))
    ds_ref, dc_ref = adjoint_oracle(g, sigma, color, dt)
    np.testing.assert_allclose(np.asarray(d_sigma), ds_ref,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_color), dc_ref,
                               rtol=1e-4, atol=1e-6)


def test_per_sample_grads_with_early_termination_match_adjoint():
    rng = np.random.default_rng(7)
    n, k = 4, 24
    sigma = rng.uniform(2.0, 40.0, (n, k)).astype(np.float32)  # saturating
    color = rng.uniform(0, 1, (n, k, 3)).astype(np.float32)
    dt = np.full((n, k), 0.1, np.float32)
    g = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d_sigma, d_color = diff_ops.per_sample_grads(
        jnp.asarray(g), jnp.asarray(sigma), jnp.asarray(color),
        jnp.asarray(dt), jnp.ones((n, k), bool))
    ds_ref, dc_ref = adjoint_oracle(g, sigma, color, dt)
    np.testing.assert_allclose(np.asarray(d_sigma), ds_ref,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_color), dc_ref,
                               rtol=1e-4, atol=1e-6)


def test_per_sample_grads_finite_difference():
    """FD referee (hp_runner.cpp:1867-1953 analogue; float32 FD noise bounds
    the achievable tolerance, so gate rel 1e-2 / abs 1e-4)."""
    rng = np.random.default_rng(1)
    n, k = 4, 12
    sigma = jnp.asarray(rng.uniform(0.2, 3.0, (n, k)), jnp.float32)
    color = jnp.asarray(rng.uniform(0, 1, (n, k, 3)), jnp.float32)
    dt = jnp.full((n, k), 0.05, jnp.float32)
    mask = jnp.ones((n, k), bool)
    g = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)

    d_sigma, d_color = diff_ops.per_sample_grads(g, sigma, color, dt, mask)

    def loss(s, c):
        return float(jnp.vdot(radiance_only(s, c, dt, mask), g))

    eps = 1e-3
    for (r, i) in [(0, 0), (1, 5), (2, 11), (3, 7)]:
        e = jnp.zeros_like(sigma).at[r, i].set(eps)
        fd = (loss(sigma + e, color) - loss(sigma - e, color)) / (2 * eps)
        got = float(d_sigma[r, i])
        assert rel_err(got, fd) < 1e-2 or abs(got - fd) < 1e-4, (r, i)
    for (r, i, c) in [(0, 2, 0), (2, 8, 1), (3, 3, 2)]:
        e = jnp.zeros_like(color).at[r, i, c].set(eps)
        fd = (loss(sigma, color + e) - loss(sigma, color - e)) / (2 * eps)
        got = float(d_color[r, i, c])
        assert rel_err(got, fd) < 1e-2 or abs(got - fd) < 1e-4, (r, i, c)


def test_per_sample_color_grad_is_g_dot_weight():
    """dL/dc_k == g * w_k exactly (diff_cpu.cpp:183-185)."""
    rng = np.random.default_rng(2)
    n, k = 3, 8
    sigma = jnp.asarray(rng.uniform(0.2, 3.0, (n, k)), jnp.float32)
    color = jnp.asarray(rng.uniform(0, 1, (n, k, 3)), jnp.float32)
    dt = jnp.full((n, k), 0.07, jnp.float32)
    mask = jnp.ones((n, k), bool)
    g = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    _, d_color = diff_ops.per_sample_grads(g, sigma, color, dt, mask)

    from dvren_tpu.ops.integrate import integrate
    out = integrate(sigma, color, dt, mask, 0.0, float(0.07 * k))
    w = np.asarray(out.aux[..., 1])
    np.testing.assert_allclose(
        np.asarray(d_color), w[..., None] * np.asarray(g)[:, None, :],
        rtol=1e-5, atol=1e-7)


def test_voxel_grid_grads_finite_difference():
    """End-to-end dL/d(voxel sigma/color) vs central FD through the full
    pipeline (test_core.cpp gradient parity analogue)."""
    plan, field = make_scene()
    g_img = np.random.default_rng(3).uniform(
        -1, 1, (plan.ray_count, 3)).astype(np.float32)

    r = Renderer(Context.create(), plan)
    r.forward(field)
    br = r.backward(field, g_img)
    d_sigma_grid = br.sigma.reshape(field.sigma.shape)
    d_color_grid = br.color.reshape(field.color.shape)
    assert np.abs(d_sigma_grid).sum() > 0  # positive gradient mass

    g_dev = jnp.asarray(g_img)

    @jax.jit
    def loss_jit(field2):
        out = render(plan, field2)
        return jnp.vdot(out.intl.radiance, g_dev)

    def loss_for(field2):
        return float(loss_jit(field2))

    eps = 1e-3
    sig = np.asarray(field.sigma)
    # probe the largest-gradient voxels (sparse FD, like the reference)
    flat = np.abs(d_sigma_grid).reshape(-1)
    probes = np.argsort(flat)[-4:]
    for p in probes:
        iz, iy, ix = np.unravel_index(p, field.sigma.shape)
        e = np.zeros_like(sig)
        e[iz, iy, ix] = eps
        fp = loss_for(field.with_params(jnp.asarray(sig + e), field.color))
        fm = loss_for(field.with_params(jnp.asarray(sig - e), field.color))
        fd = (fp - fm) / (2 * eps)
        assert rel_err(float(d_sigma_grid[iz, iy, ix]), fd) < 2e-2, (iz, iy, ix)

    col = np.asarray(field.color)
    flatc = np.abs(d_color_grid).reshape(-1)
    for p in np.argsort(flatc)[-3:]:
        iz, iy, ix, c = np.unravel_index(p, field.color.shape)
        e = np.zeros_like(col)
        e[iz, iy, ix, c] = eps
        fp = loss_for(field.with_params(field.sigma, jnp.asarray(col + e)))
        fm = loss_for(field.with_params(field.sigma, jnp.asarray(col - e)))
        fd = (fp - fm) / (2 * eps)
        assert rel_err(float(d_color_grid[iz, iy, ix, c]), fd) < 2e-2


def test_camera_grads_finite_difference():
    """Real dL/d(c2w) (reference stub is always zero; spec gate 2e-3)."""
    plan, field = make_scene(seed=4)
    g_img = np.random.default_rng(5).uniform(
        -1, 1, (plan.ray_count, 3)).astype(np.float32)
    cam = diff_ops.camera_grads(plan, field, jnp.asarray(g_img))
    dc2w = np.asarray(cam["c2w"])
    assert np.abs(dc2w).sum() > 0

    g_dev = jnp.asarray(g_img)

    @jax.jit
    def loss_jit(c2w):
        out = render(plan, field, c2w=c2w)
        return jnp.vdot(out.intl.radiance, g_dev)

    def loss_for(c2w_flat):
        return float(loss_jit(
            jnp.asarray(c2w_flat, jnp.float32).reshape(3, 4)))

    base = np.asarray(plan.camera.c2w, np.float64)
    eps = 1e-3
    for idx in (3, 7, 11, 0, 5):  # translations + rotation entries
        e = np.zeros(12)
        e[idx] = eps
        fd = (loss_for(base + e) - loss_for(base - e)) / (2 * eps)
        got = float(dc2w.reshape(-1)[idx])
        assert rel_err(got, fd) < 2e-2, idx


def test_backward_requires_forward():
    plan, field = make_scene()
    r = Renderer(Context.create(), plan)
    with pytest.raises(Exception):
        r.backward(field, np.zeros(plan.ray_count * 3, np.float32))


def test_backward_validates_grad_size():
    plan, field = make_scene()
    r = Renderer(Context.create(), plan)
    r.forward(field)
    with pytest.raises(Exception):
        r.backward(field, np.zeros(7, np.float32))


def test_packed_per_sample_grads_shape():
    plan, field = make_scene()
    r = Renderer(Context.create(), plan)
    fr = r.forward(field)
    dl = np.ones((plan.ray_count, 3), np.float32)
    ds, dc = r.per_sample_gradients(dl)
    assert ds.shape == (fr.sample_count,)
    assert dc.shape == (fr.sample_count, 3)
