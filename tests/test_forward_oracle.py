"""Full forward vs the independent scalar oracle.

The analogue of the reference's smoke-forward integration test
(``tests/render/test_smoke_forward.cpp:270-437``): renders a procedural
smoke-plume-like volume through the full pipeline and compares every pixel
against the independent per-pixel integrator in ``tests/oracle.py``.
Reference gates: image/trans/opacity max-abs-diff 2e-3, depth 1e-2
(test_smoke_forward.cpp:237-254); we hold the same gates (and they pass far
tighter in practice since both sides are float32 CPU here).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dvren_tpu import (
    CameraConfig, Context, DenseGridConfig, DenseGridField, InterpMode,
    OobPolicy, Plan, PlanConfig, Renderer, RenderOptions, SamplingConfig,
    SamplingMode,
)
from dvren_tpu.ops.rng import stratified_jitter_py
from tests import oracle

W, H = 12, 10
K_INTR = (14.0, 0.0, 6.0,
          0.0, 14.0, 5.0,
          0.0, 0.0, 1.0)
C2W = (1.0, 0.0, 0.0, 0.5,
       0.0, 1.0, 0.0, 0.5,
       0.0, 0.0, 1.0, -1.2)


def smoke_volume(n=10):
    """Procedural plume: Gaussian blob density + coordinate-driven color."""
    zs, ys, xs = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n),
                             np.linspace(0, 1, n), indexing="ij")
    r2 = (xs - 0.5) ** 2 + (ys - 0.5) ** 2 + (zs - 0.4) ** 2
    sigma = 8.0 * np.exp(-r2 / 0.08).astype(np.float32)
    color = np.stack([xs, ys, 1.0 - zs], axis=-1).astype(np.float32)
    return sigma, color


def make_plan(mode=SamplingMode.FIXED, seed=0):
    return Plan.create(PlanConfig(
        width=W, height=H, t_near=0.4, t_far=2.4, seed=seed,
        camera=CameraConfig(k=K_INTR, c2w=C2W),
        sampling=SamplingConfig(dt=0.05, max_steps=48, mode=mode)))


def make_field(sigma, color, interp=InterpMode.LINEAR, oob=OobPolicy.ZERO):
    n = sigma.shape[0]
    return DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n), sigma=sigma.reshape(-1),
        color=color.reshape(-1), interp=interp, oob=oob))


def oracle_forward(plan, sigma, color, jitter_fn=None, interp="linear",
                   oob="zero"):
    return oracle.render_forward(
        plan.width, plan.height,
        np.asarray(plan.camera.k).reshape(3, 3),
        plan.camera.c2w, plan.t_near, plan.t_far,
        plan.sampling.dt, plan.sampling.max_steps,
        sigma, color, interp=interp, oob=oob, jitter_fn=jitter_fn)


@pytest.mark.parametrize("fused", [True, False])
def test_smoke_forward_matches_oracle(fused):
    sigma, color = smoke_volume()
    plan = make_plan()
    field = make_field(sigma, color)
    r = Renderer(Context.create(), plan, RenderOptions(use_fused_path=fused))
    fr = r.forward(field)

    exp = oracle_forward(plan, sigma, color)
    img = fr.image.reshape(H, W, 3)
    assert np.abs(img - exp["image"]).max() < 2e-3
    assert np.abs(fr.transmittance.reshape(H, W)
                  - exp["transmittance"]).max() < 2e-3
    assert np.abs(fr.opacity.reshape(H, W) - exp["opacity"]).max() < 2e-3
    assert np.abs(fr.depth.reshape(H, W) - exp["depth"]).max() < 1e-2
    np.testing.assert_array_equal(
        fr.hitmask.reshape(H, W), exp["hitmask"])
    # Scene sanity: image varies and something is visible.
    assert img.std() > 1e-3
    assert fr.opacity.max() > 0.5


def test_smoke_forward_stratified_matches_oracle():
    sigma, color = smoke_volume()
    plan = make_plan(mode=SamplingMode.STRATIFIED, seed=77)

    def jitter(ray_idx, step):
        return stratified_jitter_py(77, ray_idx, step)

    field = make_field(sigma, color)
    fr = Renderer(Context.create(), plan).forward(field)
    exp = oracle_forward(plan, sigma, color, jitter_fn=jitter)
    assert np.abs(fr.image.reshape(H, W, 3) - exp["image"]).max() < 2e-3
    assert np.abs(fr.transmittance.reshape(H, W)
                  - exp["transmittance"]).max() < 2e-3


def test_nearest_and_clamp_match_oracle():
    sigma, color = smoke_volume(6)
    plan = make_plan()
    field = make_field(sigma, color, interp=InterpMode.NEAREST,
                       oob=OobPolicy.CLAMP)
    fr = Renderer(Context.create(), plan).forward(field)
    exp = oracle_forward(plan, sigma, color, interp="nearest", oob="clamp")
    assert np.abs(fr.image.reshape(H, W, 3) - exp["image"]).max() < 2e-3


def test_staged_fused_parity():
    """Staged vs fused bitwise-level parity (fused_cpu_equivalence analogue,
    hp_runner.cpp:1737-1760; host gate <=1e-4, test_core.cpp:145-153)."""
    sigma, color = smoke_volume()
    plan = make_plan()
    field = make_field(sigma, color)
    ctx = Context.create()
    a = Renderer(ctx, plan, RenderOptions(use_fused_path=True)).forward(field)
    b = Renderer(ctx, plan, RenderOptions(use_fused_path=False)).forward(field)
    # Two differently-fused XLA executables re-associate FMA chains; the
    # budget is a few float32 ulps (the reference's host-level gate is 1e-4).
    assert np.abs(a.image - b.image).max() <= 1e-6
    assert np.abs(a.depth - b.depth).max() <= 1e-5
    assert a.sample_count == b.sample_count


def test_graph_replay_determinism():
    """AOT-compiled replay is deterministic (graph_cuda_determinism analogue,
    hp_runner.cpp:3082; tol 1e-6 per thresholds.yaml:5 - we get memcmp)."""
    sigma, color = smoke_volume()
    plan = make_plan()
    field = make_field(sigma, color)
    r = Renderer(Context.create(), plan,
                 RenderOptions(use_fused_path=True, enable_graph=True))
    a = r.forward(field)
    b = r.forward(field)
    assert a.image.tobytes() == b.image.tobytes()
    assert any(n.startswith("graph_captured") for n in a.stats.notes)
    assert "graph_executed" in b.stats.notes


def test_forward_stats_and_workspace():
    sigma, color = smoke_volume()
    plan = make_plan()
    field = make_field(sigma, color)
    r = Renderer(Context.create(), plan,
                 RenderOptions(use_fused_path=False, capture_stats=True))
    fr = r.forward(field)
    s = fr.stats
    assert s.total_ms > 0
    assert s.ray_ms >= 0 and s.sample_ms >= 0 and s.integrate_ms >= 0
    info = r.workspace_info()
    assert info.ray_buffer_bytes > 0
    assert info.sample_buffer_bytes > 0
    assert info.total_bytes() > 0
