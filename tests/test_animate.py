"""Camera-stable moving-camera rendering (render/animate.py).

The reference's animation workload re-captures its pipeline per frame
(tests/render/test_smoke_animation.cpp:211); the TPU analogue must not
recompile per pose. MovingCameraRenderer pins the schedule's shape
class (uniform_shape + all_tiles) and canonicalizes the static stats so
every camera replays ONE jitted executable, bit-exact vs the per-pose
rebuilt schedule."""

from __future__ import annotations

import numpy as np
import pytest

from dvren_tpu import (CameraConfig, DenseGridConfig, DenseGridField, Plan,
                       PlanConfig, SamplingConfig, SamplingMode)
from dvren_tpu.core.status import DvrenError
from dvren_tpu.render.animate import MovingCameraRenderer, canonical_stats
from dvren_tpu.render.pipeline import plan_jitter_table
from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled

G, W, STEPS = 8, 64, 32


def _field():
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, G)] * 3), indexing="ij")
    sigma = (12 * np.exp(-((xs - .5) ** 2 + (ys - .5) ** 2
                           + (zs - .45) ** 2) / .05)).astype(np.float32)
    color = np.stack([xs, ys, 1 - zs], -1).astype(np.float32)
    return DenseGridField.create(DenseGridConfig(
        resolution=(G,) * 3, sigma=sigma.reshape(-1),
        color=color.reshape(-1)))


def _plan(tx, ty, steps=STEPS):
    return Plan.create(PlanConfig(
        width=W, height=W, t_near=0.2, t_far=2.2, seed=3,
        camera=CameraConfig(
            k=(W * 1.2, 0, W / 2, 0, W * 1.2, W / 2, 0, 0, 1),
            c2w=(1, 0, 0, tx, 0, 1, 0, ty, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=2.0 / steps, max_steps=steps,
                                mode=SamplingMode.STRATIFIED)))


def test_moving_camera_bit_exact_one_executable():
    field = _field()
    r = MovingCameraRenderer(_plan(0.5, 0.5), field)
    # the third pose pushes part of the frame OFF the bbox (dead tiles:
    # the all_tiles group must still carry them, masked, bit-exactly)
    poses = [(0.5, 0.5), (0.55, 0.48), (1.05, 0.6)]
    for tx, ty in poses:
        p = _plan(tx, ty)
        got = r.render(p, field)
        ref = render_tiled(p, field, build_tiled_schedule(
            p, field, jitter=plan_jitter_table(p)))
        np.testing.assert_array_equal(np.asarray(got.image),
                                      np.asarray(ref.image))
        np.testing.assert_array_equal(np.asarray(got.depth),
                                      np.asarray(ref.depth))
        np.testing.assert_array_equal(np.asarray(got.transmittance),
                                      np.asarray(ref.transmittance))
    assert r.cache_size() == 1, "recompiled across cameras"


def test_moving_camera_field_update_shares_executable():
    field = _field()
    r = MovingCameraRenderer(_plan(0.5, 0.5), field)
    f2 = field.with_params(field.sigma * 1.3, field.color)
    a = r.render(_plan(0.5, 0.5), field)
    b = r.render(_plan(0.52, 0.47), f2)
    assert float(np.abs(np.asarray(a.image)
                        - np.asarray(b.image)).max()) > 0
    assert r.cache_size() == 1


def test_moving_camera_rejects_geometry_change():
    field = _field()
    r = MovingCameraRenderer(_plan(0.5, 0.5), field)
    with pytest.raises(DvrenError):
        r.render(_plan(0.5, 0.5, steps=16), field)


def test_canonical_stats_strips_variation():
    field = _field()
    import jax
    tds = []
    for tx in (0.5, 0.62):
        p = _plan(tx, 0.5)
        s = build_tiled_schedule(p, field, jitter=plan_jitter_table(p),
                                 quantize="uniform", uniform_shape=(4, 3),
                                 all_tiles=True, device=False)
        tds.append(jax.tree_util.tree_structure(canonical_stats(s)))
    assert tds[0] == tds[1]
