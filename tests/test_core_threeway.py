"""Three-way Forward+Backward parity: staged / fused / graph(AOT).

The analogue of the reference's core integration test
(``tests/core/test_core.cpp:27-167``): run the full Forward + Backward
through all execution paths and assert image and gradient parity
(reference gate <= 1e-4; we hold tighter), positive sigma-gradient mass,
and non-zero workspace accounting.
"""

import numpy as np
import pytest

from dvren_tpu import (
    CameraConfig, Context, DenseGridConfig, DenseGridField, Plan, PlanConfig,
    Renderer, RenderOptions, SamplingConfig, SamplingMode,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    n = 6
    plan = Plan.create(PlanConfig(
        width=10, height=8, t_near=0.3, t_far=2.1, seed=9,
        camera=CameraConfig(
            k=(12.0, 0, 5.0, 0, 12.0, 4.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -0.9)),
        sampling=SamplingConfig(dt=0.06, max_steps=32,
                                mode=SamplingMode.STRATIFIED)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 6.0, n ** 3),
        color=rng.uniform(0.1, 1.0, 3 * n ** 3)))
    dl = rng.uniform(-1, 1, (plan.ray_count, 3)).astype(np.float32)
    return plan, field, dl


def run_path(scene, **opts):
    plan, field, dl = scene
    r = Renderer(Context.create(), plan, RenderOptions(**opts))
    fwd = r.forward(field)
    bwd = r.backward(field, dl)
    return fwd, bwd, r


def test_three_way_parity(scene):
    fwd_s, bwd_s, r_s = run_path(scene, use_fused_path=False)
    fwd_f, bwd_f, _ = run_path(scene, use_fused_path=True)
    fwd_g, bwd_g, _ = run_path(scene, use_fused_path=True, enable_graph=True)

    for a, b, label in ((fwd_f, fwd_s, "fused-vs-staged"),
                        (fwd_g, fwd_s, "graph-vs-staged")):
        assert np.abs(a.image - b.image).max() <= 1e-4, label
        assert np.abs(a.transmittance - b.transmittance).max() <= 1e-4
        assert np.abs(a.depth - b.depth).max() <= 1e-4
        assert a.sample_count == b.sample_count

    for a, b, label in ((bwd_f, bwd_s, "fused-vs-staged"),
                        (bwd_g, bwd_s, "graph-vs-staged")):
        assert np.abs(a.sigma - b.sigma).max() <= 1e-4, label
        assert np.abs(a.color - b.color).max() <= 1e-4, label
        assert np.abs(a.camera - b.camera).max() <= 1e-4, label

    # positive gradient mass (test_core.cpp analogue)
    assert np.abs(bwd_s.sigma).sum() > 0
    assert np.abs(bwd_s.color).sum() > 0
    assert np.abs(bwd_s.camera).sum() > 0  # real camera grads (ref: zeros)

    info = r_s.workspace_info()
    assert info.total_bytes() > 0
    assert info.sample_buffer_bytes > 0


def test_backward_result_shapes(scene):
    plan, field, dl = scene
    _, bwd, _ = run_path(scene, use_fused_path=True)
    assert bwd.sigma.shape == (field.voxel_count,)
    assert bwd.color.shape == (field.voxel_count * 3,)
    assert bwd.camera.shape == (3, 4)
    assert bwd.sample_count > 0


def test_packed_samples_parity_view(scene):
    """hp_samp_t packed-stream view over the dense lattice."""
    plan, field, dl = scene
    r = Renderer(Context.create(), plan)
    fr = r.forward(field)
    packed = r.packed_samples()
    m = fr.sample_count
    assert packed["positions"].shape == (m, 3)
    assert packed["dt"].shape == (m,)
    assert packed["sigma"].shape == (m,)
    assert packed["color"].shape == (m, 3)
    assert packed["ray_offset"].shape == (plan.ray_count + 1,)
    assert packed["ray_offset"][0] == 0
    assert packed["ray_offset"][-1] == m
    assert (np.diff(packed["ray_offset"].astype(np.int64)) >= 0).all()
    assert (packed["dt"] > 0).all()
