"""Window-clipped render == full render for OOB_ZERO fields."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvren_tpu import (
    CameraConfig, DenseGridConfig, DenseGridField, DvrenError, OobPolicy,
    Plan, PlanConfig, SamplingConfig, SamplingMode,
)
from dvren_tpu.render.pipeline import plan_jitter_table, render
from dvren_tpu.render.windowed import (
    build_schedule, render_windowed, render_windowed_traced)


def scene(mode=SamplingMode.FIXED, bbox=((0.3, 0.3, 0.2), (0.8, 0.9, 0.7))):
    """A field occupying a sub-box of the marched range, so windows are
    much shorter than the full lattice."""
    rng = np.random.default_rng(3)
    n = 8
    plan = Plan.create(PlanConfig(
        width=24, height=18, t_near=0.1, t_far=3.1, seed=17,
        camera=CameraConfig(
            k=(30.0, 0, 12.0, 0, 30.0, 9.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.55, 0, 0, 1, -1.1)),
        sampling=SamplingConfig(dt=0.05, max_steps=60, mode=mode)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 8.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3),
        bbox_min=bbox[0], bbox_max=bbox[1]))
    return plan, field


def assert_planes_equal(a, b, tol=2e-6):
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


def test_windowed_matches_full_fixed():
    plan, field = scene()
    full = render(plan, field).planes
    win = render_windowed(plan, field)
    assert_planes_equal(win, full)


def test_windowed_matches_full_stratified():
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    full = render(plan, field, jitter=jnp.asarray(jitter)).planes
    win = render_windowed(plan, field, jitter=jitter)
    assert_planes_equal(win, full)


def test_windowed_stratified_prebuilt_schedule_replay():
    # The capture model: jitter rows are gathered into the schedule once
    # and replayed without consulting the host table again.
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    schedule = build_schedule(plan, field.bbox_min, field.bbox_max,
                              jitter=jitter)
    full = render(plan, field, jitter=jnp.asarray(jitter)).planes
    win = render_windowed(plan, field, schedule=schedule)
    assert_planes_equal(win, full)


def test_windowed_small_blocks_and_padding():
    plan, field = scene()
    schedule = build_schedule(plan, field.bbox_min, field.bbox_max, block=50)
    assert len(schedule.groups) >= 2
    full = render(plan, field).planes
    win = render_windowed(plan, field, schedule=schedule)
    assert_planes_equal(win, full)


def test_windowed_traced_single_jit_forward_and_grads():
    # The one-dispatch replay path: whole frame (all budget groups) under a
    # single caller jit, stratified, gradients through jax.grad.
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    schedule = build_schedule(plan, field.bbox_min, field.bbox_max,
                              jitter=jitter, block=50)
    assert len(schedule.groups) >= 2

    @jax.jit
    def fwd(f):
        return render_windowed_traced(plan, f, schedule)

    full = render(plan, field, jitter=jnp.asarray(jitter)).planes
    assert_planes_equal(fwd(field), full)

    target = jnp.zeros((plan.height, plan.width, 3))

    def loss_full(params):
        f = field.with_params(*params)
        img = render(plan, f, jitter=jnp.asarray(jitter)).planes.image
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def loss_win(params):
        f = field.with_params(*params)
        return jnp.mean(
            (render_windowed_traced(plan, f, schedule).image - target) ** 2)

    params = (field.sigma, field.color)
    g_full = jax.grad(loss_full)(params)
    g_win = jax.grad(loss_win)(params)
    np.testing.assert_allclose(np.asarray(g_win[0]), np.asarray(g_full[0]),
                               rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_win[1]), np.asarray(g_full[1]),
                               rtol=1e-4, atol=1e-8)


def test_schedule_actually_skips_work():
    plan, field = scene()
    schedule = build_schedule(plan, field.bbox_min, field.bbox_max)
    assert schedule.windowed_samples < schedule.full_lattice_samples * 0.8
    # rays that miss the tight bbox entirely are not rendered at all
    assert schedule.skipped_rays > 0


def test_windowed_rejects_clamp_fields():
    plan, field = scene()
    clamped = DenseGridField(
        sigma=field.sigma, color=field.color, bbox_min=field.bbox_min,
        bbox_max=field.bbox_max, interp=field.interp, oob=OobPolicy.CLAMP)
    with pytest.raises(DvrenError):
        render_windowed(plan, clamped)


def test_windowed_gradients_match_full():
    plan, field = scene()
    target = jnp.zeros((plan.height, plan.width, 3))
    schedule = build_schedule(plan, field.bbox_min, field.bbox_max)

    def loss_full(params):
        f = field.with_params(*params)
        return jnp.mean((render(plan, f).planes.image - target) ** 2)

    def loss_win(params):
        f = field.with_params(*params)
        img = render_windowed(plan, f, schedule=schedule).image
        return jnp.mean((img - target) ** 2)

    params = (field.sigma, field.color)
    g_full = jax.grad(loss_full)(params)
    g_win = jax.grad(loss_win)(params)
    np.testing.assert_allclose(np.asarray(g_win[0]), np.asarray(g_full[0]),
                               rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_win[1]), np.asarray(g_full[1]),
                               rtol=1e-4, atol=1e-8)


def test_windowed_roi_plan_matches_full():
    from dvren_tpu import Roi
    rng = np.random.default_rng(5)
    n = 8
    plan = Plan.create(PlanConfig(
        width=24, height=18, t_near=0.1, t_far=3.1, seed=2,
        roi=Roi(x=5, y=3, width=12, height=9),
        camera=CameraConfig(
            k=(30.0, 0, 12.0, 0, 30.0, 9.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.55, 0, 0, 1, -1.1)),
        sampling=SamplingConfig(dt=0.05, max_steps=60)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 8.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3),
        bbox_min=(0.3, 0.3, 0.2), bbox_max=(0.8, 0.9, 0.7)))
    full = render(plan, field).planes
    win = render_windowed(plan, field)
    assert_planes_equal(win, full)


def test_windowed_orthographic_matches_full():
    from dvren_tpu import CameraModel
    rng = np.random.default_rng(6)
    n = 8
    plan = Plan.create(PlanConfig(
        width=20, height=16, t_near=0.1, t_far=2.6, seed=4,
        camera=CameraConfig(
            model=CameraModel.ORTHOGRAPHIC, ortho_scale=0.08,
            k=(1.0, 0, 10.0, 0, 1.0, 8.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -0.8)),
        sampling=SamplingConfig(dt=0.05, max_steps=52)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 8.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3),
        bbox_min=(0.2, 0.25, 0.15), bbox_max=(0.85, 0.8, 0.75)))
    full = render(plan, field).planes
    win = render_windowed(plan, field)
    assert_planes_equal(win, full)


def test_windowed_stratified_schedule_without_jitter_rows():
    # Regression: a schedule built WITHOUT the table + jitter passed at
    # render time must gather the rows (not silently fall back to local-
    # index keyed emulation); and with no jitter at all the in-graph
    # emulation must key on global ray ids. Both must match the full render.
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    full = render(plan, field, jitter=jnp.asarray(jitter)).planes

    schedule = build_schedule(plan, field.bbox_min, field.bbox_max)  # no rows
    win = render_windowed(plan, field, schedule=schedule, jitter=jitter)
    assert_planes_equal(win, full)

    win_emu = render_windowed(plan, field, schedule=schedule)  # emulation
    assert_planes_equal(win_emu, full)


def _stack_scene(mode=SamplingMode.STRATIFIED):
    """Base plan + 3 orbiting-camera views over the windowed test field."""
    import math
    plan, field = scene(mode=mode)
    cams = []
    for i in range(3):
        ang = 2 * math.pi * i / 3
        cams.append(CameraConfig(
            k=plan.camera.k,
            c2w=(1, 0, 0, 0.5 + 0.2 * math.sin(ang),
                 0, 1, 0, 0.55 + 0.1 * math.cos(ang),
                 0, 0, 1, -1.1)))
    from dvren_tpu.opt.fit import view_plans
    return plan, field, cams, view_plans(plan, cams)


@pytest.mark.parametrize("mode", [SamplingMode.FIXED,
                                  SamplingMode.STRATIFIED])
def test_windowed_stack_bit_exact_vs_per_view(mode):
    """The merged multi-view schedule (render/windowed.py::
    build_stack_schedule + render_windowed_stack - one pipeline instance
    per 32k block across ALL views, one compose) must reproduce the
    per-view windowed renders BITWISE: budgets only extend windows with
    provably-zero OOB_ZERO samples, and jitter keying matches the
    per-view builder (shared table, row = id % N)."""
    from dvren_tpu.render.windowed import (build_stack_schedule,
                                           render_windowed_stack)

    plan, field, cams, plans = _stack_scene(mode=mode)
    jitter = (plan_jitter_table(plan)
              if mode == SamplingMode.STRATIFIED else None)
    sched = build_stack_schedule(plans, field.bbox_min, field.bbox_max,
                                 jitter=jitter)
    stack = np.asarray(render_windowed_stack(plan, field, sched))
    for v, p in enumerate(plans):
        ref = render_windowed_traced(
            p, field, build_schedule(p, field.bbox_min, field.bbox_max,
                                     jitter=jitter))
        np.testing.assert_array_equal(stack[v], np.asarray(ref.image))


def test_windowed_stack_gradients_match_per_view():
    """d(params) of an MSE over the merged stack == the per-view loop's
    gradient (same math, one pipeline)."""
    from dvren_tpu.render.windowed import (build_stack_schedule,
                                           render_windowed_stack)

    plan, field, cams, plans = _stack_scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    sched = build_stack_schedule(plans, field.bbox_min, field.bbox_max,
                                 jitter=jitter)
    per_view = tuple(build_schedule(p, field.bbox_min, field.bbox_max,
                                    jitter=jitter) for p in plans)
    target = jnp.zeros((len(plans), plan.height, plan.width, 3),
                       jnp.float32)

    def loss_stack(params):
        f = field.with_params(*params)
        return jnp.mean((render_windowed_stack(plan, f, sched)
                         - target) ** 2)

    def loss_loop(params):
        f = field.with_params(*params)
        imgs = jnp.stack([
            render_windowed_traced(plans[v], f, per_view[v]).image
            for v in range(len(plans))])
        return jnp.mean((imgs - target) ** 2)

    params = (field.sigma, field.color)
    g_a = jax.grad(loss_stack)(params)
    g_b = jax.grad(loss_loop)(params)
    for a, b in zip(g_a, g_b):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-12)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6 * scale)
