"""Fused tile Pallas kernel == pure-jnp tile consumer (interpret mode on CPU).

The jnp consumer (render/tiled.py::_group_outputs_reference) is itself gated
against the full render (test_tiled.py); these tests pin the kernel to it,
including the custom-VJP backward through every output head, and the
Renderer integration (use_tiles mode incl. backward routing).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvren_tpu import (
    CameraConfig, CameraModel, Context, DenseGridConfig, DenseGridField,
    Plan, PlanConfig, Renderer, RenderOptions, Roi, SamplingConfig,
    SamplingMode,
)
from dvren_tpu.core.status import DvrenError
from dvren_tpu.render.pipeline import plan_jitter_table, render
from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled
from tests.test_tiled import assert_planes_close, scene


def kernel_vs_reference(plan, field, schedule, tol=5e-6):
    ref = render_tiled(plan, field, schedule, use_kernel=False)
    out = render_tiled(plan, field, schedule, use_kernel=True)
    assert_planes_close(out, ref, tol=tol)


def test_kernel_matches_reference_fixed():
    plan, field = scene()
    kernel_vs_reference(plan, field, build_tiled_schedule(plan, field))


def test_kernel_matches_reference_stratified():
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    kernel_vs_reference(plan, field,
                        build_tiled_schedule(plan, field, jitter=jitter))


def test_kernel_matches_reference_roi():
    plan, field = scene(width=50, height=38,
                        roi=Roi(x=3, y=5, width=41, height=27))
    kernel_vs_reference(plan, field, build_tiled_schedule(plan, field))


@pytest.mark.parametrize("dtype", ["bfloat16", "float16"])
def test_kernel_16bit_tables_close(dtype):
    """The 16-bit packed-table perf modes render through the tiled kernel
    within the documented ~1e-3 field precision (schedules are dtype-
    independent; only the gathered values quantize)."""
    import dataclasses
    plan, field = scene()
    schedule = build_tiled_schedule(plan, field)
    f16 = dataclasses.replace(field, packed_dtype=dtype)
    a = render_tiled(plan, f16, schedule, use_kernel=True)
    b = render_tiled(plan, field, schedule, use_kernel=True)
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(a.opacity),
                               np.asarray(b.opacity), atol=5e-3)


@pytest.mark.parametrize("reduce", ["mxu3", "roll"])
def test_kernel_reduce_variants_match(reduce):
    """The alternate group-reduction strategies (3-pass bf16-split mask
    matmuls; VPU roll butterflies) compute the same integration results as
    the HIGHEST-precision mask matmuls (all are exact-product schemes; only
    the final f32 reassociation differs)."""
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    schedule = build_tiled_schedule(plan, field, jitter=jitter)
    ref = render_tiled(plan, field, schedule, use_kernel=True, reduce="mxu")
    out = render_tiled(plan, field, schedule, use_kernel=True, reduce=reduce)
    assert_planes_close(out, ref, tol=1e-6)


def test_kernel_matches_full_render():
    """Transitively: kernel == full dense-lattice render."""
    plan, field = scene()
    schedule = build_tiled_schedule(plan, field)
    full = render(plan, field).planes
    out = render_tiled(plan, field, schedule, use_kernel=True)
    assert_planes_close(out, full, tol=5e-6)


def test_kernel_gradients_all_heads():
    """Custom VJP == jax.grad of the jnp consumer, with cotangents flowing
    through radiance, transmittance, opacity AND depth."""
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    schedule = build_tiled_schedule(plan, field, jitter=jitter)
    target = jnp.zeros((plan.height, plan.width, 3))

    def loss(params, use_kernel):
        f = field.with_params(*params)
        pls = render_tiled(plan, f, schedule, use_kernel=use_kernel)
        return (jnp.mean((pls.image - target) ** 2)
                + 0.1 * jnp.mean(pls.opacity)
                + 0.01 * jnp.mean(pls.depth)
                + 0.01 * jnp.mean(pls.transmittance))

    params = (field.sigma, field.color)
    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_ker = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(g_ker, g_ref):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-12)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6 * scale)


def test_kernel_reduce_mxu3_backward_matches():
    """reduce="mxu3" also swaps the backward's one-hot scatter dots to
    3-pass bf16-split matmuls; gradients must match the HIGHEST path
    (exact partial products, only f32 reassociation differs)."""
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    schedule = build_tiled_schedule(plan, field, jitter=jitter)
    target = jnp.zeros((plan.height, plan.width, 3))

    def loss(params, reduce):
        f = field.with_params(*params)
        pls = render_tiled(plan, f, schedule, use_kernel=True,
                           reduce=reduce)
        return (jnp.mean((pls.image - target) ** 2)
                + 0.1 * jnp.mean(pls.opacity)
                + 0.01 * jnp.mean(pls.depth))

    params = (field.sigma, field.color)
    g_ref = jax.grad(lambda p: loss(p, "mxu"))(params)
    g_out = jax.grad(lambda p: loss(p, "mxu3"))(params)
    for a, b in zip(g_out, g_ref):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-12)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6 * scale)


def test_kernel_early_termination_thick():
    """Optically thick scene exercises the processed-prefix early-out."""
    plan, field = scene()
    thick = field.with_params(field.sigma * 400.0, field.color)
    schedule = build_tiled_schedule(plan, thick)
    full = render(plan, thick).planes
    out = render_tiled(plan, thick, schedule, use_kernel=True)
    assert_planes_close(out, full, tol=5e-6)


def test_renderer_use_tiles_forward_backward():
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    ctx = Context.create()
    r_tiles = Renderer(ctx, plan, RenderOptions(use_tiles=True))
    r_full = Renderer(ctx, plan, RenderOptions())
    a = r_tiles.forward(field)
    b = r_full.forward(field)
    assert "tiled_path" in " ".join(a.stats.notes)
    np.testing.assert_allclose(a.image, b.image, atol=5e-6)
    np.testing.assert_allclose(a.depth, b.depth, atol=1e-4)

    dl = np.full((plan.ray_count, 3), 0.5, np.float32)
    ga = r_tiles.backward(field, dl)
    gb = r_full.backward(field, dl)
    scale = max(float(np.abs(gb.sigma).max()), 1e-12)
    np.testing.assert_allclose(ga.sigma, gb.sigma, atol=2e-6 * scale)
    scale = max(float(np.abs(gb.color).max()), 1e-12)
    np.testing.assert_allclose(ga.color, gb.color, atol=2e-6 * scale)
    # round 3: tiled mode emits REAL camera gradients (kernel ray-plane
    # adjoint) - they must agree with the full path's camera_grads
    assert np.abs(ga.camera).sum() > 0
    np.testing.assert_allclose(ga.camera, gb.camera, rtol=2e-3, atol=1e-4)

    # Parity views stream the full lattice in tiled mode and must match
    # the in-memory views exactly (same lattice, same math).
    ds_t, dc_t = r_tiles.per_sample_gradients(dl)
    ds_f, dc_f = r_full.per_sample_gradients(dl)
    np.testing.assert_array_equal(ds_t, ds_f)
    np.testing.assert_array_equal(dc_t, dc_f)


def test_renderer_use_tiles_rejects_nearest():
    from dvren_tpu.core.plan import InterpMode
    plan, field = scene()
    nearest = DenseGridField(
        sigma=field.sigma, color=field.color, bbox_min=field.bbox_min,
        bbox_max=field.bbox_max, interp=InterpMode.NEAREST, oob=field.oob)
    ctx = Context.create()
    r = Renderer(ctx, plan, RenderOptions(use_tiles=True))
    with pytest.raises(DvrenError):
        r.forward(nearest)


def test_renderer_use_tiles_graph_replay_deterministic():
    plan, field = scene()
    ctx = Context.create()
    r = Renderer(ctx, plan,
                 RenderOptions(use_tiles=True, enable_graph=True))
    a = r.forward(field)
    b = r.forward(field)
    assert "graph_executed" in " ".join(b.stats.notes)
    np.testing.assert_array_equal(a.image, b.image)


def test_camera_gradients_fd_and_windowed_parity():
    """Round-3: the kernel's pass 2 emits the ray-plane adjoint, chained
    through traced ray generation to dC2W/dK (the reference's dCam is a
    permanent zero stub, diff_cpu.cpp:41-47,74). Referee 1: central finite
    differences of the SAME fixed-schedule loss (valid regardless of
    schedule staleness). Referee 2: the windowed path's camera gradient of
    the equivalent render (both are a.e. exact at the baked camera)."""
    plan, field = scene()
    schedule = build_tiled_schedule(plan, field)
    k0 = jnp.asarray(plan.camera.k, jnp.float32).reshape(3, 3)
    c2w0 = jnp.asarray(plan.camera.c2w, jnp.float32).reshape(3, 4)
    dl = jnp.asarray(np.random.default_rng(7).uniform(
        -1, 1, (plan.height, plan.width, 3)).astype(np.float32))

    @jax.jit
    def loss(c2w, k):
        img = render_tiled(plan, field, schedule, k=k, c2w=c2w).image
        return jnp.sum(img * dl)

    g_c2w, g_k = jax.jit(jax.grad(loss, argnums=(0, 1)))(c2w0, k0)
    g_c2w = np.asarray(g_c2w)
    assert np.abs(g_c2w).sum() > 0

    rel = lambda a, b: abs(a - b) / max(abs(a), abs(b), 1e-6)
    base = np.asarray(plan.camera.c2w, np.float64)
    eps = 1e-3
    for idx in (3, 7, 11, 0, 5):  # translations + rotation entries
        e = np.zeros(12)
        e[idx] = eps
        fp = float(loss(jnp.asarray((base + e).reshape(3, 4),
                                    jnp.float32), k0))
        fm = float(loss(jnp.asarray((base - e).reshape(3, 4),
                                    jnp.float32), k0))
        fd = (fp - fm) / (2 * eps)
        assert rel(float(g_c2w.reshape(-1)[idx]), fd) < 2e-2, idx

    # focal-length gradient (dK) against FD
    kbase = np.asarray(plan.camera.k, np.float64).reshape(3, 3)
    e = np.zeros((3, 3)); e[0, 0] = 1e-2
    fp = float(loss(c2w0, jnp.asarray(kbase + e, jnp.float32)))
    fm = float(loss(c2w0, jnp.asarray(kbase - e, jnp.float32)))
    fd = (fp - fm) / 2e-2
    assert rel(float(np.asarray(g_k)[0, 0]), fd) < 2e-2

    # referee 2: windowed-path camera gradient of the equivalent loss
    from dvren_tpu.render.windowed import (build_schedule,
                                           render_windowed_traced)
    wsched = build_schedule(plan, field.bbox_min, field.bbox_max)

    @jax.jit
    def loss_w(c2w, k):
        img = render_windowed_traced(plan, field, wsched,
                                     k=k, c2w=c2w).image
        return jnp.sum(img * dl)

    gw_c2w, gw_k = jax.jit(jax.grad(loss_w, argnums=(0, 1)))(c2w0, k0)
    np.testing.assert_allclose(g_c2w, np.asarray(gw_c2w),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(gw_k),
                               rtol=2e-3, atol=1e-4)


def test_renderer_tiled_backward_camera_grads():
    """Renderer.backward in tiled mode returns REAL dCam (the round-2
    zero-dCam caveat is deleted)."""
    plan, field = scene()
    r = Renderer(Context.create(), plan,
                 RenderOptions(use_tiles=True))
    r.forward(field)
    dl = np.random.default_rng(3).uniform(
        -1, 1, plan.ray_count * 3).astype(np.float32)
    br = r.backward(field, dl)
    assert np.abs(br.camera).sum() > 0
    assert np.abs(br.camera_k).sum() > 0

    # must agree with the windowed-mode backward of the same scene
    rw = Renderer(Context.create(), plan,
                  RenderOptions(use_window=True, use_tiles=False))
    rw.forward(field)
    bw = rw.backward(field, dl)
    np.testing.assert_allclose(br.camera, bw.camera, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(br.camera_k, bw.camera_k,
                               rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_renderer_tile_pitch_bit_identical():
    """RenderOptions.tile_pitch=2 routes the tiled path through the
    cell-pair gather schedule; forward and backward are bit-identical to
    pitch 1 (only lane placement changes)."""
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    ctx = Context.create()
    r1 = Renderer(ctx, plan, RenderOptions(use_tiles=True))
    r2 = Renderer(ctx, plan, RenderOptions(use_tiles=True, tile_pitch=2))
    a = r1.forward(field)
    b = r2.forward(field)
    np.testing.assert_array_equal(a.image, b.image)
    np.testing.assert_array_equal(a.depth, b.depth)
    dl = np.full((plan.ray_count, 3), 0.5, np.float32)
    ga = r1.backward(field, dl)
    gb = r2.backward(field, dl)
    np.testing.assert_array_equal(np.asarray(ga.sigma),
                                  np.asarray(gb.sigma))
    np.testing.assert_array_equal(np.asarray(ga.color),
                                  np.asarray(gb.color))
    np.testing.assert_array_equal(np.asarray(ga.camera),
                                  np.asarray(gb.camera))
