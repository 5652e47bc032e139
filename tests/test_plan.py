"""Plan validation/defaulting parity with hp_plan_create
(hotpath/src/runtime/hp_runtime.cpp:45-146)."""

import pytest

from dvren_tpu import (
    CameraConfig, CameraModel, DvrenError, Plan, PlanConfig, Roi,
    SamplingConfig, SamplingMode,
)


def base_config(**kw):
    defaults = dict(width=64, height=48, t_near=0.0, t_far=1.0)
    defaults.update(kw)
    return PlanConfig(**defaults)


def test_rejects_zero_dims():
    with pytest.raises(DvrenError):
        Plan.create(base_config(width=0))
    with pytest.raises(DvrenError):
        Plan.create(base_config(height=0))


def test_rejects_bad_range():
    with pytest.raises(DvrenError):
        Plan.create(base_config(t_near=1.0, t_far=1.0))
    with pytest.raises(DvrenError):
        Plan.create(base_config(t_near=2.0, t_far=1.0))


def test_default_intrinsics_center():
    plan = Plan.create(base_config())
    k = plan.camera.k
    assert k[0] == 1.0 and k[4] == 1.0 and k[8] == 1.0
    assert k[2] == 32.0 and k[5] == 24.0  # cx=W/2, cy=H/2


def test_zero_focal_defaults_to_one():
    cam = CameraConfig(k=(0.0, 0, 100.0, 0, 0.0, 50.0, 0, 0, 1.0))
    plan = Plan.create(base_config(camera=cam))
    assert plan.camera.k[0] == 1.0 and plan.camera.k[4] == 1.0
    assert plan.camera.k[2] == 100.0  # explicit cx preserved


def test_default_c2w_identity():
    plan = Plan.create(base_config())
    c2w = plan.camera.c2w
    assert c2w[0] == 1.0 and c2w[5] == 1.0 and c2w[10] == 1.0
    assert c2w[3] == 0.0 and c2w[7] == 0.0 and c2w[11] == 0.0


def test_ortho_scale_default():
    cam = CameraConfig(model=CameraModel.ORTHOGRAPHIC, ortho_scale=0.0)
    plan = Plan.create(base_config(camera=cam))
    assert plan.camera.ortho_scale == 1.0


def test_roi_defaults_full_frame():
    plan = Plan.create(base_config())
    assert (plan.roi.x, plan.roi.y) == (0, 0)
    assert (plan.roi.width, plan.roi.height) == (64, 48)
    assert plan.ray_count == 64 * 48


def test_roi_must_fit():
    with pytest.raises(DvrenError):
        Plan.create(base_config(roi=Roi(x=60, y=0, width=8, height=8)))


def test_max_rays_defaults_to_roi_area():
    plan = Plan.create(base_config(roi=Roi(x=2, y=2, width=8, height=4)))
    assert plan.max_rays == 32


def test_roi_exceeding_max_rays_rejected():
    with pytest.raises(DvrenError):
        Plan.create(base_config(max_rays=10))


def test_sampling_defaults():
    plan = Plan.create(base_config(t_near=1.0, t_far=3.0))
    assert plan.sampling.dt == pytest.approx(2.0 / 64.0)
    assert plan.sampling.max_steps == 64
    assert plan.sampling.mode == SamplingMode.FIXED


def test_max_samples_default_and_guard():
    plan = Plan.create(base_config(
        sampling=SamplingConfig(dt=0.1, max_steps=16)))
    assert plan.max_samples == plan.max_rays * 16
    with pytest.raises(DvrenError):
        Plan.create(base_config(max_samples=5))  # < max_rays


def test_plan_is_hashable_cache_key():
    a = Plan.create(base_config())
    b = Plan.create(base_config())
    assert a == b and hash(a) == hash(b)
    c = Plan.create(base_config(seed=7))
    assert c != a


def test_descriptor_roundtrip():
    plan = Plan.create(base_config())
    again = Plan.create(plan.descriptor())
    assert again == plan
