"""Round-2 review fixes: windowed slab edge cases, Renderer ray override,
windowed-schedule backward, camera-grad jitter threading, checkpoint
structure validation, gate skipping."""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvren_tpu import (
    CameraConfig, CameraModel, Context, DenseGridConfig, DenseGridField,
    DvrenError, Plan, PlanConfig, SamplingConfig, SamplingMode,
)
from dvren_tpu.ops.raygen import Rays
from dvren_tpu.render.pipeline import plan_jitter_table, render
from dvren_tpu.render.renderer import Renderer, RenderOptions
from dvren_tpu.render.windowed import build_schedule, render_windowed
from tests import oracle


def _grid(n=8, seed=3, bbox=((0.3, 0.3, 0.2), (0.8, 0.9, 0.7))):
    rng = np.random.default_rng(seed)
    return DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 8.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3),
        bbox_min=bbox[0], bbox_max=bbox[1]))


# ---------------------------------------------------------------- windowed

def test_windowed_face_coplanar_ortho_column():
    """A ray with d == 0 on an axis and origin exactly on that bbox face
    must be marched (local == 0.0 is inside), not NaN-dropped; the schedule
    build must not raise RuntimeWarnings either."""
    # ortho rays along +z; pixel column px=2 has origin x == bbox_min x.
    plan = Plan.create(PlanConfig(
        width=8, height=6, t_near=0.1, t_far=2.1, seed=1,
        camera=CameraConfig(
            model=CameraModel.ORTHOGRAPHIC, ortho_scale=0.1,
            k=(1.0, 0, 0.0, 0, 1.0, 0.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.0, 0, 1, 0, 0.0, 0, 0, 1, -0.5)),
        sampling=SamplingConfig(dt=0.05, max_steps=50)))
    field = _grid(bbox=((0.2, 0.1, 0.2), (0.7, 0.55, 0.8)))
    full = render(plan, field).planes
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        schedule = build_schedule(plan, field.bbox_min, field.bbox_max)
    win = render_windowed(plan, field, schedule=schedule)
    np.testing.assert_allclose(np.asarray(win.image),
                               np.asarray(full.image), atol=2e-6)
    np.testing.assert_allclose(np.asarray(win.transmittance),
                               np.asarray(full.transmittance), atol=2e-6)
    # the face-coplanar column must actually have content
    col = np.asarray(full.image)[:, 2, :]
    assert np.abs(col).max() > 0


def test_windowed_all_miss_renders_background():
    """A bbox behind the marched range: empty schedule -> background frame
    (the full render's result), not a concatenate crash."""
    plan = Plan.create(PlanConfig(
        width=10, height=8, t_near=0.1, t_far=0.5, seed=1,
        camera=CameraConfig(
            k=(12.0, 0, 5.0, 0, 12.0, 4.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -2.0)),
        sampling=SamplingConfig(dt=0.05, max_steps=8)))
    field = _grid()  # bbox z starts at 0.2; rays stop at t=0.5 (z=-1.5)
    schedule = build_schedule(plan, field.bbox_min, field.bbox_max)
    assert len(schedule.groups) == 0
    full = render(plan, field).planes
    win = render_windowed(plan, field, schedule=schedule)
    np.testing.assert_allclose(np.asarray(win.image),
                               np.asarray(full.image), atol=0)
    np.testing.assert_allclose(np.asarray(win.depth),
                               np.asarray(full.depth), atol=0)


# ----------------------------------------------------------- ray override

def _small_plan(mode=SamplingMode.FIXED):
    return Plan.create(PlanConfig(
        width=6, height=5, t_near=0.1, t_far=2.1, seed=9,
        camera=CameraConfig(
            k=(8.0, 0, 3.0, 0, 8.0, 2.5, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=0.05, max_steps=40, mode=mode)))


def test_renderer_forward_ray_override_colliding_pixels():
    """Renderer.forward(field, rays=...) with two rays landing on ONE pixel:
    compose must accumulate (image +=, T *=, depth = min) per
    img_cpu.cpp:161-185, verified against the scalar oracle."""
    plan = _small_plan()
    field = _grid(seed=11)
    o = np.array([[0.5, 0.45, -1.0], [0.62, 0.5, -1.0], [0.4, 0.6, -1.0]],
                 np.float32)
    d = np.array([[0.0, 0.0, 1.0], [-0.05, 0.02, 1.0], [0.1, -0.04, 1.0]],
                 np.float32)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    pix = np.array([8, 8, 14], np.int32)  # rays 0 and 1 collide on pixel 8
    rays = Rays(
        origins=jnp.asarray(o), directions=jnp.asarray(d),
        t_near=jnp.full((3,), plan.t_near, jnp.float32),
        t_far=jnp.full((3,), plan.t_far, jnp.float32),
        pixel_ids=jnp.asarray(pix))

    r = Renderer(Context.create(), plan)
    fr = r.forward(field, rays=rays)
    assert fr.ray_count == 3

    per_ray = [oracle.integrate_pixel(
        o[i], d[i], plan.t_near, plan.t_far, plan.sampling.dt,
        plan.sampling.max_steps, np.asarray(field.sigma),
        np.asarray(field.color), field.bbox_min, field.bbox_max)
        for i in range(3)]
    img = fr.image.reshape(plan.height, plan.width, 3)
    trans = fr.transmittance.reshape(plan.height, plan.width)
    opac = fr.opacity.reshape(plan.height, plan.width)
    dep = fr.depth.reshape(plan.height, plan.width)
    py, px = 8 // plan.width, 8 % plan.width
    np.testing.assert_allclose(
        img[py, px], per_ray[0]["radiance"] + per_ray[1]["radiance"],
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        trans[py, px],
        per_ray[0]["transmittance"] * per_ray[1]["transmittance"],
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        opac[py, px],
        1.0 - per_ray[0]["transmittance"] * per_ray[1]["transmittance"],
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        dep[py, px], min(per_ray[0]["depth"], per_ray[1]["depth"]),
        rtol=1e-5)
    # the solo ray keeps single-ray (first-write) semantics
    py2, px2 = 14 // plan.width, 14 % plan.width
    np.testing.assert_allclose(img[py2, px2], per_ray[2]["radiance"],
                               rtol=1e-5, atol=1e-6)
    # untouched pixels keep the background
    assert trans[0, 0] == 1.0 and dep[0, 0] == np.float32(plan.t_far)

    # backward after an override forward: field grads flow, camera grads
    # are the documented zero stub (no generating camera).
    br = r.backward(field, np.ones(3 * 3, np.float32))
    assert np.abs(br.sigma).sum() > 0
    assert np.all(br.camera == 0.0)


def test_renderer_override_stratified_keys_on_bundle_index():
    """Stratified override jitter hashes (seed, bundle_idx, step) - the
    reference keying (samp_cpu.cpp:233)."""
    plan = _small_plan(mode=SamplingMode.STRATIFIED)
    field = _grid(seed=11)
    o = np.array([[0.5, 0.45, -1.0], [0.62, 0.5, -1.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0], [-0.05, 0.02, 1.0]], np.float32)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(
        origins=jnp.asarray(o), directions=jnp.asarray(d),
        t_near=jnp.full((2,), plan.t_near, jnp.float32),
        t_far=jnp.full((2,), plan.t_far, jnp.float32),
        pixel_ids=jnp.asarray(np.array([3, 9], np.int32)))
    r = Renderer(Context.create(), plan)
    fr = r.forward(field, rays=rays)

    from dvren_tpu.ops import rng as rng_mod
    jit_table = rng_mod.jitter_table(plan.seed, 2, plan.sampling.max_steps)
    for i in range(2):
        want = oracle.integrate_pixel(
            o[i], d[i], plan.t_near, plan.t_far, plan.sampling.dt,
            plan.sampling.max_steps, np.asarray(field.sigma),
            np.asarray(field.color), field.bbox_min, field.bbox_max,
            jitter_fn=lambda step, _i=i: float(jit_table[_i, step]))
        pid = int(np.asarray(rays.pixel_ids)[i])
        got = fr.image.reshape(-1, 3)[pid]
        np.testing.assert_allclose(got, want["radiance"], rtol=1e-5,
                                   atol=1e-6)


# ------------------------------------------------ windowed-schedule backward

def test_renderer_windowed_backward_uses_schedule_and_matches_full():
    plan = Plan.create(PlanConfig(
        width=24, height=18, t_near=0.1, t_far=3.1, seed=17,
        camera=CameraConfig(
            k=(30.0, 0, 12.0, 0, 30.0, 9.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.55, 0, 0, 1, -1.1)),
        sampling=SamplingConfig(dt=0.05, max_steps=60,
                                mode=SamplingMode.STRATIFIED)))
    field = _grid(seed=3)
    dl = np.ones(plan.ray_count * 3, np.float32)

    r_win = Renderer(Context.create(), plan,
                     RenderOptions(use_window=True))
    r_win.forward(field)
    br_win = r_win.backward(field, dl)

    # reference gradients: full-lattice loss sum(image * 1)
    jitter = jnp.asarray(plan_jitter_table(plan))

    def loss(params, c2w, k_mat):
        f = field.with_params(*params)
        out = render(plan, f, k=k_mat, c2w=c2w, jitter=jitter)
        return jnp.sum(out.planes.image)

    (g_sigma, g_color), g_c2w, g_k = jax.grad(loss, argnums=(0, 1, 2))(
        (field.sigma, field.color),
        jnp.asarray(plan.camera.c2w, jnp.float32).reshape(3, 4),
        jnp.asarray(plan.camera.k, jnp.float32).reshape(3, 3))

    np.testing.assert_allclose(br_win.sigma, np.asarray(g_sigma).reshape(-1),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(br_win.color, np.asarray(g_color).reshape(-1),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(br_win.camera, np.asarray(g_c2w),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(br_win.camera_k, np.asarray(g_k),
                               rtol=1e-3, atol=1e-5)


def test_streamed_backward_rebuilds_on_field_meta_change():
    """A second backward with different field METADATA (same shapes) must
    not reuse the first field's compiled closure."""
    plan = _small_plan()
    field_a = _grid(seed=3, bbox=((0.3, 0.3, 0.2), (0.8, 0.9, 0.7)))
    field_b = DenseGridField(
        sigma=field_a.sigma, color=field_a.color,
        bbox_min=(0.1, 0.1, 0.1), bbox_max=(0.9, 0.9, 0.9),
        interp=field_a.interp, oob=field_a.oob)
    dl = np.ones(plan.ray_count * 3, np.float32)

    r = Renderer(Context.create(), plan, RenderOptions(streaming=True))
    r.forward(field_a)
    r.backward(field_a, dl)          # caches the bbox-A closure
    r.forward(field_b)
    br_b = r.backward(field_b, dl)   # must rebuild for bbox B

    r_fresh = Renderer(Context.create(), plan,
                       RenderOptions(streaming=True))
    r_fresh.forward(field_b)
    br_fresh = r_fresh.backward(field_b, dl)
    np.testing.assert_array_equal(br_b.sigma, br_fresh.sigma)
    np.testing.assert_array_equal(br_b.color, br_fresh.color)


# --------------------------------------------------- camera grads + jitter

def test_camera_grads_use_jitter_table_not_emulation():
    from dvren_tpu.ops import diff as diff_ops

    plan = _small_plan(mode=SamplingMode.STRATIFIED)
    field = _grid(seed=5)
    # zero the boundary voxel shell: OOB_ZERO is then continuous across the
    # bbox faces, so central differences see a smooth loss
    sig = np.asarray(field.sigma).copy()
    sig[0, :, :] = sig[-1, :, :] = 0
    sig[:, 0, :] = sig[:, -1, :] = 0
    sig[:, :, 0] = sig[:, :, -1] = 0
    field = field.with_params(jnp.asarray(sig), field.color)
    table = jnp.asarray(plan_jitter_table(plan))
    dl = jnp.ones((plan.ray_count, 3), jnp.float32)

    # The compiled gradient program must contain no uint32 hash emulation
    # (CLAUDE.md invariant: stratified jitter comes from the host table).
    jaxpr = jax.make_jaxpr(
        lambda f, g, j: diff_ops.camera_grads(plan, f, g, jitter=j))(
            field, dl, table)
    text = str(jaxpr)
    for op in ("shift_right_logical", "shift_left", "xor"):
        assert op not in text, f"hash emulation op {op} in camera grads"

    # and the table-threaded gradient agrees with the emulation-keyed one
    # analytically (identical jitter values => identical sample set; FD
    # referees for camera grads live in test_backward_fd).
    cam = diff_ops.camera_grads(plan, field, dl, jitter=table)
    cam_emu = diff_ops.camera_grads(plan, field, dl)
    assert np.abs(np.asarray(cam["c2w"])).sum() > 0
    np.testing.assert_allclose(np.asarray(cam["c2w"]),
                               np.asarray(cam_emu["c2w"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam["k"]),
                               np.asarray(cam_emu["k"]),
                               rtol=1e-4, atol=1e-6)


# ------------------------------------------------------------- checkpoint

def test_train_state_structure_mismatch_raises(tmp_path):
    from dvren_tpu.io import checkpoint as ckpt

    state = {"a": jnp.ones((3,)), "b": (jnp.zeros((2,)), jnp.ones((2,)))}
    path = tmp_path / "state.npz"
    ckpt.save_train_state(path, state, header={"step": 1})

    restored, hdr = ckpt.load_train_state(path, state)
    assert hdr["step"] == 1
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.ones(3))

    wrong_structure = {"a": (jnp.ones((3,)), jnp.zeros((2,))),
                       "b": jnp.ones((2,))}
    with pytest.raises(DvrenError):
        ckpt.load_train_state(path, wrong_structure)

    wrong_shape = {"a": jnp.ones((4,)),
                   "b": (jnp.zeros((2,)), jnp.ones((2,)))}
    with pytest.raises(DvrenError):
        ckpt.load_train_state(path, wrong_shape)


# ------------------------------------------------------------------ gates

def test_performance_gate_skips_without_bench():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "validate_gates", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "validate_gates.py"))
    vg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vg)

    names = sorted({n for gate in vg.GATE_CASES.values() for n in gate})
    cases = [{"name": n, "status": "pass", "message": ""} for n in names]
    scoreboard = {"cases": cases,
                  "summary": {"pass": len(cases), "fail": 0, "skip": 0}}
    thresholds = {"bench_min_fwd_mrays": 1.7, "bench_min_fwdbwd_mrays": 0.46}

    report = vg.validate(scoreboard, None, thresholds)
    assert report["gates"]["performance"]["pass"]
    assert "skipped" in report["gates"]["performance"]
    assert report["all_pass"]

    bench = {"value": 2.21, "extra": {"fwdbwd_Mrays_per_s": 0.59}}
    report2 = vg.validate(scoreboard, bench, thresholds)
    assert report2["gates"]["performance"]["pass"]
    bench_bad = {"value": 0.5, "extra": {"fwdbwd_Mrays_per_s": 0.1}}
    report3 = vg.validate(scoreboard, bench_bad, thresholds)
    assert not report3["gates"]["performance"]["pass"]
    assert not report3["all_pass"]
