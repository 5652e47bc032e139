"""Device-built pose schedules (render/posed.py): parity, determinism,
pin guards.

The PosedRenderer builds the tile schedule ON DEVICE (sliced-box lane
assignment) - these tests gate it against the independent windowed
reference and the host-built tiled schedule at f32-ulp tolerance, across
oblique orbit poses (the sliced-box scheme's hard case), plus the
deterministic-sampling path and the pin-violation guards.
"""

import math

import numpy as np
import pytest

from dvren_tpu import (CameraConfig, DenseGridConfig, DenseGridField,
                       DvrenError, Plan, PlanConfig, SamplingConfig,
                       SamplingMode)
from dvren_tpu.render.pipeline import plan_jitter_table
from dvren_tpu.render.posed import PosedRenderer
from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled
from dvren_tpu.render.windowed import build_schedule, render_windowed_traced

G, W, H, STEPS = 16, 128, 128, 32


def _field():
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, G)] * 3), indexing="ij")
    sigma = (10.0 * np.exp(
        -((xs - 0.5) ** 2 + (ys - 0.5) ** 2 + (zs - 0.45) ** 2) / 0.06)
    ).astype(np.float32)
    color = np.stack([xs, ys, 1 - zs], -1).astype(np.float32)
    return DenseGridField.create(DenseGridConfig(
        resolution=(G,) * 3, sigma=sigma.reshape(-1),
        color=color.reshape(-1)))


def _lookat(eye, ctr=(0.5, 0.5, 0.5), up=(0, 1, 0)):
    eye, ctr, up = (np.array(v, float) for v in (eye, ctr, up))
    f = ctr - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, up)
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    m = np.stack([r, u, f], 1)
    return tuple(np.concatenate([m, eye[:, None]], 1).reshape(-1))


def _plan(c2w, mode=SamplingMode.STRATIFIED):
    return Plan.create(PlanConfig(
        width=W, height=H, t_near=0.2, t_far=2.2, seed=3,
        camera=CameraConfig(
            k=(W * 1.2, 0, W / 2, 0, W * 1.2, H / 2, 0, 0, 1), c2w=c2w),
        sampling=SamplingConfig(dt=2.0 / STEPS, max_steps=STEPS,
                                mode=mode)))


BASE_C2W = (1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)
ORBIT = [_lookat((1.6, 0.8, 0.3)), _lookat((-0.6, 0.2, 1.3)),
         _lookat((0.5, 1.7, 0.45))]


@pytest.fixture(scope="module")
def posed():
    field = _field()
    return PosedRenderer(_plan(BASE_C2W), field, use_kernel=False), field


def test_posed_matches_windowed_over_orbit(posed):
    pr, field = posed
    for c2w in [BASE_C2W] + ORBIT:
        p = _plan(c2w)
        img_p = np.asarray(pr.render(p, field).image)
        jt = plan_jitter_table(p)
        ws = build_schedule(p, field.bbox_min, field.bbox_max, jitter=jt)
        img_w = np.asarray(render_windowed_traced(p, field, ws).image)
        assert np.abs(img_p - img_w).max() < 1e-5, c2w
        assert img_p.mean() > 0.05  # scene actually visible


def test_posed_matches_host_tiled(posed):
    pr, field = posed
    p = _plan(ORBIT[0])
    img_p = np.asarray(pr.render(p, field).image)
    ts = build_tiled_schedule(p, field, jitter=plan_jitter_table(p))
    img_t = np.asarray(render_tiled(p, field, ts,
                                    use_kernel=False).image)
    assert np.abs(img_p - img_t).max() < 1e-5


def test_posed_deterministic(posed):
    pr, field = posed
    p = _plan(ORBIT[1])
    a = np.asarray(pr.render(p, field).image)
    b = np.asarray(pr.render(p, field).image)
    assert (a == b).all()


def test_posed_fixed_mode():
    field = _field()
    base = _plan(BASE_C2W, mode=SamplingMode.FIXED)
    pr = PosedRenderer(base, field, use_kernel=False)
    p = _plan(ORBIT[2], mode=SamplingMode.FIXED)
    img_p = np.asarray(pr.render(p, field).image)
    ws = build_schedule(p, field.bbox_min, field.bbox_max, jitter=None)
    img_w = np.asarray(render_windowed_traced(p, field, ws).image)
    assert np.abs(img_p - img_w).max() < 1e-5


def test_posed_pin_guards(posed):
    pr, field = posed
    # a renderer pinned below the pose's needs must raise on the diag
    tiny = PosedRenderer(_plan(BASE_C2W), field, nc_pin=pr.nc_pin,
                         nb_pin=1, ez_pin=pr.ez_pin, use_kernel=False)
    with pytest.raises(DvrenError):
        tiny.render(_plan(BASE_C2W), field)
    # plan-geometry drift raises immediately
    other = Plan.create(PlanConfig(
        width=W, height=H, t_near=0.25, t_far=2.2, seed=3,
        camera=CameraConfig(
            k=(W * 1.2, 0, W / 2, 0, W * 1.2, H / 2, 0, 0, 1),
            c2w=BASE_C2W),
        sampling=SamplingConfig(dt=2.0 / STEPS, max_steps=STEPS,
                                mode=SamplingMode.STRATIFIED)))
    with pytest.raises(DvrenError):
        pr.render(other, field)


def test_posed_schedule_structure(posed):
    pr, field = posed
    sched = pr.schedule_for(_plan(ORBIT[0]))
    (g,) = sched.groups
    assert g.n_chunks == pr.nc_pin and g.banks == pr.nb_pin
    hm = np.asarray(sched.hostmap_all)
    assert hm.min() >= 0 and hm.max() < G ** 3
    samp = np.asarray(g.samp)
    lanes = (samp[:, :, 2].astype(np.int32) & 0x7FFF).reshape(
        g.n_tiles, g.n_chunks, -1)
    assert lanes.max() < g.banks * 128
