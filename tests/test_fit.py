"""Grid-fitting training loop (BASELINE.json workload: fit a dense grid from
multi-view renders with Adam; checkpoint/resume roundtrip)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvren_tpu import (
    CameraConfig, DenseGridConfig, DenseGridField, Plan, PlanConfig,
    SamplingConfig,
)
from dvren_tpu.opt.fit import FitConfig, fit_dense_grid, psnr, render_views
from dvren_tpu.io.checkpoint import (
    load_dense_grid, save_dense_grid, save_train_state, load_train_state)

N = 8
W = H = 12


def make_plan():
    return Plan.create(PlanConfig(
        width=W, height=H, t_near=0.3, t_far=2.3,
        camera=CameraConfig(k=(14.0, 0, W / 2, 0, 14.0, H / 2, 0, 0, 1)),
        sampling=SamplingConfig(dt=0.08, max_steps=25)))


def cameras():
    out = []
    for dx in (-0.15, 0.0, 0.15, 0.3):
        out.append(CameraConfig(
            c2w=(1, 0, 0, 0.5 + dx, 0, 1, 0, 0.5, 0, 0, 1, -1.0)))
    return out


def truth_field():
    rng = np.random.default_rng(0)
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, N)] * 3), indexing="ij")
    r2 = (xs - 0.5) ** 2 + (ys - 0.5) ** 2 + (zs - 0.5) ** 2
    sigma = (10.0 * np.exp(-r2 / 0.07)).astype(np.float32)
    color = rng.uniform(0.2, 0.9, (N, N, N, 3)).astype(np.float32)
    return DenseGridField.create(DenseGridConfig(
        resolution=(N, N, N), sigma=sigma.reshape(-1),
        color=color.reshape(-1)))


def test_fit_recovers_views():
    plan = make_plan()
    cams = cameras()
    truth = truth_field()
    targets = np.asarray(render_views(plan, truth, cams))

    init = truth.with_params(
        jnp.full_like(truth.sigma, 0.5), jnp.full_like(truth.color, 0.5))
    result = fit_dense_grid(
        plan, init, cams, targets,
        FitConfig(learning_rate=5e-2, steps=150, target_psnr=30.0))

    assert result.steps_run > 0
    assert result.psnr_history[-1] > result.psnr_history[0] + 5.0
    assert result.psnr_history[-1] > 28.0
    # density stays physical
    assert float(result.field.sigma.min()) >= 0.0
    assert float(result.field.color.max()) <= 1.0


def test_fit_blocked_sync_matches_per_step():
    """sync_every=K runs K optimizer steps per dispatch (lax.scan inside
    one jit); the per-step loss trajectory must match the per-step loop."""
    plan = make_plan()
    cams = cameras()
    truth = truth_field()
    targets = np.asarray(render_views(plan, truth, cams))
    init = truth.with_params(
        jnp.full_like(truth.sigma, 0.5), jnp.full_like(truth.color, 0.5))
    a = fit_dense_grid(plan, init, cams, targets,
                       FitConfig(learning_rate=5e-2, steps=12,
                                 target_psnr=None))
    b = fit_dense_grid(plan, init, cams, targets,
                       FitConfig(learning_rate=5e-2, steps=12,
                                 target_psnr=None, sync_every=4))
    assert b.steps_run == 12
    np.testing.assert_allclose(np.asarray(b.loss_history),
                               np.asarray(a.loss_history),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(b.field.sigma),
                               np.asarray(a.field.sigma),
                               rtol=1e-4, atol=1e-6)


def test_psnr_definition():
    assert float(psnr(jnp.asarray(1e-3))) == pytest.approx(30.0)


def test_checkpoint_roundtrip(tmp_path):
    truth = truth_field()
    p = tmp_path / "grid.npz"
    save_dense_grid(p, truth, extra={"step": 7})
    back, extra = load_dense_grid(p)
    assert extra["step"] == 7
    np.testing.assert_array_equal(np.asarray(back.sigma),
                                  np.asarray(truth.sigma))
    np.testing.assert_array_equal(np.asarray(back.color),
                                  np.asarray(truth.color))
    assert back.interp == truth.interp and back.bbox_max == truth.bbox_max


def test_train_state_roundtrip(tmp_path):
    import optax
    truth = truth_field()
    opt = optax.adam(1e-2)
    params = (truth.sigma, truth.color)
    state = (params, opt.init(params))
    p = tmp_path / "state.npz"
    save_train_state(p, state, header={"step": 3})
    restored, header = load_train_state(p, state)
    assert header["step"] == 3
    np.testing.assert_array_equal(
        np.asarray(restored[0][0]), np.asarray(params[0]))


def test_fit_blocked_sync_honors_step_budget():
    """steps not divisible by sync_every runs EXACTLY config.steps
    optimizer steps (a remainder block with its own static scan length),
    matching the per-step trajectory - not ceil(steps/k)*k steps."""
    plan = make_plan()
    cams = cameras()
    truth = truth_field()
    targets = np.asarray(render_views(plan, truth, cams))
    init = truth.with_params(
        jnp.full_like(truth.sigma, 0.5), jnp.full_like(truth.color, 0.5))
    a = fit_dense_grid(plan, init, cams, targets,
                       FitConfig(learning_rate=5e-2, steps=10,
                                 target_psnr=None))
    ckpts = []
    b = fit_dense_grid(plan, init, cams, targets,
                       FitConfig(learning_rate=5e-2, steps=10,
                                 target_psnr=None, sync_every=4,
                                 log_every=5),
                       checkpoint_cb=lambda f, s, p: ckpts.append(s))
    assert b.steps_run == 10
    assert len(b.loss_history) == 10
    # checkpoint cadence counts STEPS: fires at >=5 and >=10 boundaries
    assert ckpts == [8, 10]
    np.testing.assert_allclose(np.asarray(b.loss_history),
                               np.asarray(a.loss_history),
                               rtol=1e-5, atol=1e-8)
