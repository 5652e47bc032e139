"""Tiled streaming render == whole-frame render (the fixed-workspace
production path; parity analogue of the reference's staged/fused/graph
three-way test, tests/core/test_core.cpp:27-167)."""

import numpy as np
import jax
import jax.numpy as jnp

from dvren_tpu import (
    CameraConfig, DenseGridConfig, DenseGridField, Plan, PlanConfig,
    SamplingConfig, SamplingMode,
)
from dvren_tpu.render.pipeline import default_ray_tile, render, render_streamed


def scene(mode=SamplingMode.FIXED, width=20, height=14):
    rng = np.random.default_rng(0)
    n = 8
    plan = Plan.create(PlanConfig(
        width=width, height=height, t_near=0.3, t_far=2.3, seed=11,
        camera=CameraConfig(
            k=(width * 1.3, 0, width / 2, 0, width * 1.3, height / 2,
               0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=0.08, max_steps=26, mode=mode)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 6.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3)))
    return plan, field


def assert_planes_match(a, b, tol=1e-6):
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(a.transmittance),
                               np.asarray(b.transmittance), atol=tol)
    np.testing.assert_allclose(np.asarray(a.opacity),
                               np.asarray(b.opacity), atol=tol)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.hitmask),
                                  np.asarray(b.hitmask))


def test_streamed_matches_whole_frame_divisible():
    plan, field = scene()
    whole = render(plan, field).planes
    tiled = render_streamed(plan, field, ray_tile=70)  # 280 rays / 70
    assert_planes_match(tiled, whole)


def test_streamed_matches_with_padding_tile():
    plan, field = scene()
    tiled = render_streamed(plan, field, ray_tile=96)  # 280 = 2*96 + 88
    whole = render(plan, field).planes
    assert_planes_match(tiled, whole)


def test_streamed_stratified_jitter_parity():
    """Tiling must not change the stratified sample positions (jitter keyed
    on global ray index, samp_cpu.cpp:233)."""
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    whole = render(plan, field).planes
    tiled = render_streamed(plan, field, ray_tile=50)
    assert_planes_match(tiled, whole)


def test_streamed_gradients_match():
    plan, field = scene()
    target = jnp.zeros((plan.height, plan.width, 3))

    def loss_whole(params):
        f = field.with_params(*params)
        return jnp.mean((render(plan, f).planes.image - target) ** 2)

    def loss_tiled(params):
        f = field.with_params(*params)
        img = render_streamed(plan, f, ray_tile=64).image
        return jnp.mean((img - target) ** 2)

    params = (field.sigma, field.color)
    g_whole = jax.grad(loss_whole)(params)
    g_tiled = jax.grad(loss_tiled)(params)
    np.testing.assert_allclose(np.asarray(g_tiled[0]),
                               np.asarray(g_whole[0]), rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_tiled[1]),
                               np.asarray(g_whole[1]), rtol=1e-4, atol=1e-8)


def test_default_ray_tile_bounds():
    plan, _ = scene()
    tile = default_ray_tile(plan)
    assert 1 <= tile <= plan.ray_count
    big = Plan.create(PlanConfig(
        width=512, height=512, t_near=0.0, t_far=2.0,
        sampling=SamplingConfig(dt=0.02, max_steps=128)))
    assert default_ray_tile(big) * 128 <= (1 << 22)
