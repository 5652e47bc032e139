"""Ray generation contracts (hp_runner ray_cpu_basic / ray_cpu_roi /
ray_cpu_override analogues; hp_runner.cpp:266-312)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvren_tpu import CameraConfig, CameraModel, Plan, PlanConfig, Roi, SamplingConfig
from dvren_tpu.ops.raygen import Rays, generate_rays, validate_override
from tests import oracle


def make_plan(**kw):
    cfg = dict(width=8, height=6, t_near=0.5, t_far=2.0,
               sampling=SamplingConfig(dt=0.1, max_steps=8))
    cfg.update(kw)
    return Plan.create(PlanConfig(**cfg))


def test_directions_unit_norm():
    rays = generate_rays(make_plan())
    norms = np.linalg.norm(np.asarray(rays.directions), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_counts_tnear_tfar_pixel_ids():
    plan = make_plan()
    rays = generate_rays(plan)
    assert rays.count == 48
    np.testing.assert_allclose(np.asarray(rays.t_near), 0.5)
    np.testing.assert_allclose(np.asarray(rays.t_far), 2.0)
    pids = np.asarray(rays.pixel_ids)
    assert pids[0] == 0 and pids[-1] == 8 * 6 - 1
    assert len(set(pids.tolist())) == 48


def test_matches_scalar_oracle():
    k = (100.0, 0, 4.0, 0, 90.0, 3.0, 0, 0, 1.0)
    c2w = (0.0, -1.0, 0.0, 0.3,
           1.0, 0.0, 0.0, -0.2,
           0.0, 0.0, 1.0, 0.7)
    plan = make_plan(camera=CameraConfig(k=k, c2w=c2w))
    rays = generate_rays(plan)
    origins = np.asarray(rays.origins)
    dirs = np.asarray(rays.directions)
    K = np.array(k).reshape(3, 3)
    for py in (0, 3, 5):
        for px in (0, 4, 7):
            idx = py * 8 + px
            o, d = oracle.pinhole_ray(px, py, K, c2w)
            np.testing.assert_allclose(origins[idx], o, atol=1e-6)
            np.testing.assert_allclose(dirs[idx], d, atol=1e-6)


def test_roi_window():
    plan = make_plan(roi=Roi(x=2, y=1, width=3, height=2))
    rays = generate_rays(plan)
    assert rays.count == 6
    pids = np.asarray(rays.pixel_ids)
    expect = [1 * 8 + 2, 1 * 8 + 3, 1 * 8 + 4,
              2 * 8 + 2, 2 * 8 + 3, 2 * 8 + 4]
    np.testing.assert_array_equal(pids, expect)


def test_orthographic_parallel_rays_with_plane_offsets():
    cam = CameraConfig(model=CameraModel.ORTHOGRAPHIC,
                       k=(1.0, 0, 4.0, 0, 1.0, 3.0, 0, 0, 1.0),
                       ortho_scale=0.25)
    plan = make_plan(camera=cam)
    rays = generate_rays(plan)
    dirs = np.asarray(rays.directions)
    np.testing.assert_allclose(
        dirs, np.broadcast_to(dirs[0:1], dirs.shape), atol=1e-7)  # parallel
    np.testing.assert_allclose(dirs[0], [0, 0, 1], atol=1e-7)
    origins = np.asarray(rays.origins)
    # ray_cuda.cu:75-84: origin offset (px - cx) * scale in the camera plane
    idx = 3 * 8 + 5  # px=5, py=3
    np.testing.assert_allclose(
        origins[idx], [(5 - 4.0) * 0.25, (3 - 3.0) * 0.25, 0.0], atol=1e-6)
    assert not np.allclose(origins[0], origins[-1])


def test_override_validation():
    plan = make_plan()
    n = 5
    rays = Rays(
        origins=jnp.zeros((n, 3)), directions=jnp.ones((n, 3)),
        t_near=jnp.zeros((n,)), t_far=jnp.ones((n,)),
        pixel_ids=jnp.arange(n, dtype=jnp.int32))
    assert validate_override(plan, rays) is rays
    bad = Rays(
        origins=jnp.zeros((n, 2)), directions=jnp.ones((n, 3)),
        t_near=jnp.zeros((n,)), t_far=jnp.ones((n,)),
        pixel_ids=jnp.arange(n, dtype=jnp.int32))
    with pytest.raises(ValueError):
        validate_override(plan, bad)


def test_camera_gradients_flow():
    """dL/d(c2w) is nonzero through raygen (reference dCam is a zero stub)."""
    import jax
    plan = make_plan()

    def loss(c2w):
        rays = generate_rays(plan, c2w=c2w)
        return jnp.sum(rays.directions[:, 0] ** 2)

    g = jax.grad(loss)(jnp.asarray(plan.camera.c2w).reshape(3, 4))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
