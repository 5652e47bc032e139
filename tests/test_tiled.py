"""Tile-table schedule + fused-tile render == full render (OOB_ZERO)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvren_tpu import (
    CameraConfig, CameraModel, DenseGridConfig, DenseGridField, Plan,
    PlanConfig, Roi, SamplingConfig, SamplingMode,
)
from dvren_tpu.render.pipeline import plan_jitter_table, render
from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled


def scene(mode=SamplingMode.FIXED, width=48, height=32, n=8,
          bbox=((0.3, 0.3, 0.2), (0.8, 0.9, 0.7)), seed=3, **plan_kw):
    rng = np.random.default_rng(seed)
    plan = Plan.create(PlanConfig(
        width=width, height=height, t_near=0.1, t_far=3.1, seed=17,
        camera=CameraConfig(
            k=(width * 1.25, 0, width / 2, 0, width * 1.25, height / 2,
               0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.55, 0, 0, 1, -1.1)),
        sampling=SamplingConfig(dt=0.05, max_steps=60, mode=mode),
        **plan_kw))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 8.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3),
        bbox_min=bbox[0], bbox_max=bbox[1]))
    return plan, field


def assert_planes_close(a, b, tol=1e-5):
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(a.transmittance),
                               np.asarray(b.transmittance), atol=tol)
    np.testing.assert_allclose(np.asarray(a.opacity),
                               np.asarray(b.opacity), atol=tol)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a.hitmask),
                                  np.asarray(b.hitmask))


def test_tiled_reference_matches_full_fixed():
    plan, field = scene()
    schedule = build_tiled_schedule(plan, field)
    assert schedule.tiled_samples < schedule.full_lattice_samples
    full = render(plan, field).planes
    out = render_tiled(plan, field, schedule, use_kernel=False)
    assert_planes_close(out, full)


def test_tiled_reference_matches_full_stratified():
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    schedule = build_tiled_schedule(plan, field, jitter=jitter)
    full = render(plan, field, jitter=jnp.asarray(jitter)).planes
    out = render_tiled(plan, field, schedule, use_kernel=False)
    assert_planes_close(out, full)


def test_tiled_roi_and_nonmultiple_dims():
    # 50x38 image with an offset ROI: tiles pad past the ROI edge
    plan, field = scene(width=50, height=38,
                        roi=Roi(x=3, y=5, width=41, height=27))
    schedule = build_tiled_schedule(plan, field)
    full = render(plan, field).planes
    out = render_tiled(plan, field, schedule, use_kernel=False)
    assert_planes_close(out, full)


def test_tiled_orthographic():
    rng = np.random.default_rng(6)
    n = 8
    plan = Plan.create(PlanConfig(
        width=40, height=24, t_near=0.1, t_far=2.6, seed=4,
        camera=CameraConfig(
            model=CameraModel.ORTHOGRAPHIC, ortho_scale=0.05,
            k=(1.0, 0, 20.0, 0, 1.0, 12.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -0.8)),
        sampling=SamplingConfig(dt=0.05, max_steps=52)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 8.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3),
        bbox_min=(0.2, 0.25, 0.15), bbox_max=(0.85, 0.8, 0.75)))
    schedule = build_tiled_schedule(plan, field)
    full = render(plan, field).planes
    out = render_tiled(plan, field, schedule, use_kernel=False)
    assert_planes_close(out, full)


def test_tiled_gradients_match_full():
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    schedule = build_tiled_schedule(plan, field, jitter=jitter)
    target = jnp.zeros((plan.height, plan.width, 3))

    def loss_full(params):
        f = field.with_params(*params)
        img = render(plan, f, jitter=jnp.asarray(jitter)).planes.image
        return jnp.mean((img - target) ** 2)

    def loss_tiled(params):
        f = field.with_params(*params)
        img = render_tiled(plan, f, schedule, use_kernel=False).image
        return jnp.mean((img - target) ** 2)

    params = (field.sigma, field.color)
    g_full = jax.grad(loss_full)(params)
    g_tiled = jax.grad(loss_tiled)(params)
    np.testing.assert_allclose(np.asarray(g_tiled[0]), np.asarray(g_full[0]),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_tiled[1]), np.asarray(g_full[1]),
                               rtol=1e-4, atol=1e-7)


def test_tiled_all_miss_background():
    plan, field = scene()
    shifted = DenseGridField(
        sigma=field.sigma, color=field.color,
        bbox_min=(10.0, 10.0, 10.0), bbox_max=(11.0, 11.0, 11.0),
        interp=field.interp, oob=field.oob)
    schedule = build_tiled_schedule(plan, shifted)
    assert len(schedule.groups) == 0
    full = render(plan, shifted).planes
    out = render_tiled(plan, shifted, schedule, use_kernel=False)
    assert_planes_close(out, full)


def test_occupancy_trimming_exact_and_smaller():
    """Empty-space skipping: an SDF-shell field (exact zeros inside and
    outside the shell) renders bit-comparably with a much smaller tiled
    sample budget when occupancy trimming is on (VERDICT r1 item 2: the
    TPU-native superset of the reference's early termination)."""
    rng = np.random.default_rng(5)
    n = 16
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")
    r = np.sqrt((xs - 0.5) ** 2 + (ys - 0.5) ** 2 + (zs - 0.5) ** 2)
    sigma = np.where(np.abs(r - 0.33) < 0.08, 20.0, 0.0).astype(np.float32)
    color = rng.uniform(0, 1, (n, n, n, 3)).astype(np.float32)
    plan, _ = scene()
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n), sigma=sigma.reshape(-1),
        color=color.reshape(-1)))

    plain = build_tiled_schedule(plan, field)
    occ = build_tiled_schedule(plan, field, occupancy=True)
    budget = lambda s: sum(g.n_tiles * g.n_chunks * 2048 for g in s.groups)
    assert budget(occ) < 0.8 * budget(plain), (budget(occ), budget(plain))

    full = render(plan, field).planes
    out = render_tiled(plan, field, occ, use_kernel=False)
    assert_planes_close(out, full)
    out_k = render_tiled(plan, field, occ)
    assert_planes_close(out_k, full)


def test_empty_chunk_lanes_in_range():
    """Regression (round 3): a chunk whose samples are ALL masked has no
    unique cells; its lane offset must anchor at 0, not at the tile's
    running total (which can equal the bank-space size - an OOB bank read
    in the kernel, NaN fill in the jnp consumer's take_along_axis)."""
    rng = np.random.default_rng(3)
    n = 16
    plan = Plan.create(PlanConfig(
        width=64, height=64, t_near=0.2, t_far=2.2, seed=3,
        camera=CameraConfig(
            k=(64 * 1.2, 0, 32, 0, 64 * 1.2, 32, 0, 0, 1),
            c2w=(1, 0, 0, 0.6, 0, 0.96, -0.28, 0.55,
                 0, 0.28, 0.96, -0.9)),
        sampling=SamplingConfig(dt=2.0 / 64, max_steps=64)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 8.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3)))
    schedule = build_tiled_schedule(plan, field)
    saw_empty = False
    for g in schedule.groups:
        packed = np.asarray(g.samp)[:, :, 2].astype(np.int32)
        lidx = packed & 0x7FFF
        m = (packed >> 15) & 1
        lanes = g.banks * 128
        assert int(lidx.max()) < lanes, (int(lidx.max()), lanes)
        saw_empty |= bool(
            ((m > 0).sum(axis=(2, 3)) == 0).any())
    assert saw_empty, "scene no longer produces an empty chunk; adjust it"
    full = render(plan, field).planes
    out = render_tiled(plan, field, schedule, use_kernel=False)
    assert not np.isnan(np.asarray(out.image)).any()
    assert_planes_close(out, full)


def test_occupancy_all_empty_background():
    plan, field = scene()
    zero = field.with_params(jnp.zeros_like(field.sigma), field.color)
    sched = build_tiled_schedule(plan, zero, occupancy=True)
    assert len(sched.groups) == 0 and sched.fallback_rays == 0
    full = render(plan, zero).planes
    out = render_tiled(plan, zero, sched, use_kernel=False)
    assert_planes_close(out, full)


def test_subtiled_8px_matches_full():
    """Fine-grid mode (round 3): 8x8 sub-tiled schedules render
    identically to the full pipeline through BOTH consumers."""
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    schedule = build_tiled_schedule(plan, field, jitter=jitter, tile_px=8)
    assert schedule.tile_px == 8
    full = render(plan, field, jitter=jnp.asarray(jitter)).planes
    out = render_tiled(plan, field, schedule, use_kernel=False)
    assert_planes_close(out, full)
    out_k = render_tiled(plan, field, schedule, use_kernel=True)
    assert_planes_close(out_k, full)


def test_subtiled_rescues_fine_grid_overflow():
    """A grid fine enough that 16px tiles overflow their slot tables
    renders fully in-kernel with 8px sub-tiles (the reference's SDF
    scene class, test_sdf_sphere.cpp:130-346, is exactly this regime)."""
    rng = np.random.default_rng(9)
    n = 32
    w = 96
    plan = Plan.create(PlanConfig(
        width=w, height=w, t_near=0.2, t_far=2.2, seed=3,
        camera=CameraConfig(
            k=(w * 1.2, 0, w / 2, 0, w * 1.2, w / 2, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=2.0 / 64, max_steps=64)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 8.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3)))
    s16 = build_tiled_schedule(plan, field, tile_px=16)
    s8 = build_tiled_schedule(plan, field, tile_px=8)
    assert s16.fallback_rays > 0, "scene no longer overflows 16px tiles"
    assert s8.fallback_rays == 0, s8.fallback_rays

    full = render(plan, field).planes
    assert_planes_close(render_tiled(plan, field, s8, use_kernel=False),
                        full)
    assert_planes_close(render_tiled(plan, field, s8, use_kernel=True),
                        full)
    # the 16px schedule must also stay correct (partial sub-tile fallback)
    assert_planes_close(render_tiled(plan, field, s16, use_kernel=False),
                        full)


@pytest.mark.slow
def test_subtiled_4px_rescues_2px_per_cell():
    """~2 px/cell (the 256^3-under-512^2 class scaled down: 48^3 under
    96^2): 8px sub-tiles still overflow, 4px (one block row per
    sub-tile) renders fully in-kernel."""
    rng = np.random.default_rng(11)
    n = 48
    w = 96
    plan = Plan.create(PlanConfig(
        width=w, height=w, t_near=0.2, t_far=2.2, seed=5,
        camera=CameraConfig(
            k=(w * 1.2, 0, w / 2, 0, w * 1.2, w / 2, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=2.0 / 96, max_steps=96)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 8.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3)))
    s8 = build_tiled_schedule(plan, field, tile_px=8)
    s4 = build_tiled_schedule(plan, field, tile_px=4)
    assert s8.fallback_rays > 0, "scene no longer overflows 8px tiles"
    assert s4.fallback_rays == 0, s4.fallback_rays
    full = render(plan, field).planes
    assert_planes_close(render_tiled(plan, field, s4, use_kernel=False),
                        full)
    assert_planes_close(render_tiled(plan, field, s4, use_kernel=True),
                        full)


def test_subtiled_partial_fallback():
    """8px blocks where SOME sub-tiles overflow: the overflowed subs'
    rays ride the windowed fallback while the live subs stay in-kernel.
    Regression: bad-sub rows used to clobber hostmap lane 0 (their
    offsets are zeroed), corrupting every live sub-tile in the block."""
    rng = np.random.default_rng(2)
    n = 20
    w = 32
    plan = Plan.create(PlanConfig(
        width=w, height=w, t_near=0.2, t_far=2.6,
        camera=CameraConfig(
            k=(w * 1.25, 0, w / 2, 0, w * 1.25, w / 2, 0, 0, 1),
            c2w=(1, 0, 0, 0.3, 0, 1, 0, 0.3, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=0.04, max_steps=60)))
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")
    r2 = (xs - 0.3) ** 2 + (ys - 0.3) ** 2 + (zs - 0.3) ** 2
    sigma = 15.0 * np.exp(-r2 / 0.1)
    sigma[sigma < 1e-3] = 0.0
    color = np.stack([xs, ys, zs], axis=-1)
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n), sigma=sigma.astype(np.float32).reshape(-1),
        color=color.astype(np.float32).reshape(-1)))
    s8 = build_tiled_schedule(plan, field, tile_px=8)
    assert s8.fallback_rays > 0, "scene no longer partially overflows"
    assert s8.fallback_rays < s8.total_rays
    full = render(plan, field).planes
    assert_planes_close(render_tiled(plan, field, s8, use_kernel=False),
                        full)
    assert_planes_close(render_tiled(plan, field, s8, use_kernel=True),
                        full)


def test_subtiled_gradients_match_full():
    plan, field = scene()
    schedule = build_tiled_schedule(plan, field, tile_px=8)
    target = jnp.zeros((plan.height, plan.width, 3))

    def loss_full(params):
        f = field.with_params(*params)
        return jnp.mean((render(plan, f).planes.image - target) ** 2)

    def loss_tiled(params):
        f = field.with_params(*params)
        img = render_tiled(plan, f, schedule, use_kernel=True).image
        return jnp.mean((img - target) ** 2)

    params = (field.sigma, field.color)
    g_full = jax.grad(loss_full)(params)
    g_tiled = jax.grad(loss_tiled)(params)
    np.testing.assert_allclose(np.asarray(g_tiled[0]),
                               np.asarray(g_full[0]),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_tiled[1]),
                               np.asarray(g_full[1]),
                               rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_quantized_schedule_bit_identical():
    """Kernel-variant quantization (round 3): rounding group (nc, nb)
    shapes up to the _QUANT series pads only fully-masked chunks and
    never-indexed banks, so images AND gradients are bit-identical while
    multi-view training shares a bounded set of Pallas kernel variants
    (measured: ~100 distinct shapes -> 15 across 8 fit views)."""
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    for px in (16, 8):
        se = build_tiled_schedule(plan, field, jitter=jitter, tile_px=px)
        sq = build_tiled_schedule(plan, field, jitter=jitter, tile_px=px,
                                  quantize=True)
        ie = render_tiled(plan, field, se, use_kernel=True).image
        iq = render_tiled(plan, field, sq, use_kernel=True).image
        np.testing.assert_array_equal(np.asarray(ie), np.asarray(iq))

    sq = build_tiled_schedule(plan, field, jitter=jitter, tile_px=8,
                              quantize=True)
    se = build_tiled_schedule(plan, field, jitter=jitter, tile_px=8)

    def loss(params, sched):
        f = field.with_params(*params)
        return (render_tiled(plan, f, sched, use_kernel=True).image ** 2).sum()

    params = (field.sigma, field.color)
    ge = jax.grad(loss)(params, se)
    gq = jax.grad(loss)(params, sq)
    np.testing.assert_array_equal(np.asarray(ge[0]), np.asarray(gq[0]))
    np.testing.assert_array_equal(np.asarray(ge[1]), np.asarray(gq[1]))


@pytest.mark.slow
def test_merged_view_schedule_matches_per_view():
    """Multi-view merge (round 3): tiles from different views sharing a
    (nc, nb) class render through ONE kernel call; the (V, H, W, 3) stack
    is bit-identical to per-view render_tiled, gradients included. This
    is the fit path's step structure (opt/fit.py::_scheduled_views)."""
    from dvren_tpu.opt.fit import view_plans
    from dvren_tpu.render.tiled import (merge_view_schedules,
                                        render_tiled_stack)

    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    cams = [CameraConfig(c2w=(1, 0, 0, 0.5 + dx, 0, 1, 0, 0.5,
                              0, 0, 1, -1.0)) for dx in (0.0, 0.1)]
    plans = view_plans(plan, cams)
    scheds = [build_tiled_schedule(p, field, jitter=jitter, tile_px=8,
                                   quantize=True) for p in plans]
    merged = merge_view_schedules(scheds)
    stack = render_tiled_stack(plan, field, merged)
    for v, p in enumerate(plans):
        single = render_tiled(p, field, scheds[v]).image
        np.testing.assert_array_equal(np.asarray(stack[v]),
                                      np.asarray(single))

    def loss_merged(params):
        f = field.with_params(*params)
        return (render_tiled_stack(plan, f, merged) ** 2).sum()

    def loss_per_view(params):
        f = field.with_params(*params)
        return sum((render_tiled(p, f, scheds[v]).image ** 2).sum()
                   for v, p in enumerate(plans))

    params = (field.sigma, field.color)
    gm = jax.grad(loss_merged)(params)
    gp = jax.grad(loss_per_view)(params)
    # Gradients agree to f32 reassociation: the merged gather plan reduces
    # each cell's slot rows across ALL views in one count-class sum, the
    # per-view path sums per view then adds (measured max rel 1.6e-7).
    np.testing.assert_allclose(np.asarray(gm[0]), np.asarray(gp[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gm[1]), np.asarray(gp[1]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_pair_pitch_bit_identical():
    """pitch=2 packs runs at cell-PAIR granularity so the forward table
    gather fetches two consecutive packed rows per start (half the
    starts, the measured gather ceiling being start-paced). Only lane
    PLACEMENT changes - images, aux heads and gradients are bit-identical
    to pitch=1 through both consumers."""
    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    s1 = build_tiled_schedule(plan, field, jitter=jitter)
    s2 = build_tiled_schedule(plan, field, jitter=jitter, pitch=2)
    assert s2.pitch == 2
    assert s2.gathermap_all.size * 2 == s2.hostmap_all.size
    # untouched partner lanes are -1 in hostmap (excluded from the
    # backward's gather plan) but their pair slot is still gathered
    assert int((np.asarray(s2.hostmap_all) >= 0).sum()) \
        >= int((np.asarray(s1.hostmap_all) >= 0).sum())
    for uk in (False, True):
        a = render_tiled(plan, field, s1, use_kernel=uk)
        b = render_tiled(plan, field, s2, use_kernel=uk)
        np.testing.assert_array_equal(np.asarray(a.image),
                                      np.asarray(b.image))
        np.testing.assert_array_equal(np.asarray(a.depth),
                                      np.asarray(b.depth))
        np.testing.assert_array_equal(np.asarray(a.transmittance),
                                      np.asarray(b.transmittance))

    def loss(params, sched):
        f = field.with_params(*params)
        return (render_tiled(plan, f, sched).image ** 2).sum()

    params = (field.sigma, field.color)
    g1 = jax.grad(loss)(params, s1)
    g2 = jax.grad(loss)(params, s2)
    np.testing.assert_array_equal(np.asarray(g1[0]), np.asarray(g2[0]))
    np.testing.assert_array_equal(np.asarray(g1[1]), np.asarray(g2[1]))


@pytest.mark.slow
def test_pair_pitch_subtiled_and_merged():
    """pitch=2 composes with the fine-grid sub-tiled windows, shape
    quantization and the multi-view merge (the fit path). 4px sub-tiles
    can NEVER overflow at pitch 2 (a run holds <= 128 samples -> <= 128
    pairs = 256 lanes, exactly the 2-bank window); at 8px, pair-lane
    inflation can push runs past the cap - those sub-tiles demote to the
    windowed fallback honestly (counted, not silently wrong)."""
    from dvren_tpu.opt.fit import view_plans
    from dvren_tpu.render.tiled import (merge_view_schedules,
                                        render_tiled_stack)

    plan, field = scene(mode=SamplingMode.STRATIFIED, n=24)
    jitter = plan_jitter_table(plan)
    s8_1 = build_tiled_schedule(plan, field, jitter=jitter, tile_px=8)
    s8_2 = build_tiled_schedule(plan, field, jitter=jitter, tile_px=8,
                                pitch=2)
    assert s8_2.fallback_rays >= s8_1.fallback_rays  # inflation demotes
    s1 = build_tiled_schedule(plan, field, jitter=jitter, tile_px=4)
    s2 = build_tiled_schedule(plan, field, jitter=jitter, tile_px=4,
                              pitch=2)
    assert s2.fallback_rays == s1.fallback_rays == 0
    a = render_tiled(plan, field, s1)
    b = render_tiled(plan, field, s2)
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))

    cams = [CameraConfig(c2w=(1, 0, 0, 0.5 + dx, 0, 1, 0, 0.5,
                              0, 0, 1, -1.0)) for dx in (0.0, 0.1)]
    plans = view_plans(plan, cams)
    merged2 = merge_view_schedules(
        [build_tiled_schedule(p, field, jitter=jitter, tile_px=4,
                              quantize=True, pitch=2) for p in plans])
    merged1 = merge_view_schedules(
        [build_tiled_schedule(p, field, jitter=jitter, tile_px=4,
                              quantize=True) for p in plans])
    np.testing.assert_array_equal(
        np.asarray(render_tiled_stack(plan, field, merged2)),
        np.asarray(render_tiled_stack(plan, field, merged1)))


@pytest.mark.slow
def test_bwd_split_pallas_bit_identical(monkeypatch):
    """The Pallas bank-block -> u16 slot-row cotangent relayout
    (ops/packed_transpose.py::banks_to_u16_rows) is pure integer
    plumbing: d(table) must match the XLA split+swapaxes path BITWISE,
    through the full kernel backward."""
    from dvren_tpu.render import tiled as tiled_mod

    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    schedule = build_tiled_schedule(plan, field, jitter=jitter)
    # the kernel quantum: every group's bank-block count must divide 8
    # (groups pad tile counts to multiples of 8) or the pallas branch
    # silently falls back and this test would vacuously pass
    for g in schedule.groups:
        assert (g.n_tiles * g.banks) % 8 == 0

    def loss(params):
        f = field.with_params(*params)
        return (render_tiled(plan, f, schedule).image ** 2).sum()

    params = (field.sigma, field.color)
    monkeypatch.setattr(tiled_mod, "BWD_SPLIT", "xla")
    g_xla = jax.grad(loss)(params)
    monkeypatch.setattr(tiled_mod, "BWD_SPLIT", "pallas")
    g_pal = jax.grad(loss)(params)
    np.testing.assert_array_equal(np.asarray(g_xla[0]), np.asarray(g_pal[0]))
    np.testing.assert_array_equal(np.asarray(g_xla[1]), np.asarray(g_pal[1]))


def test_params_to_banks_fused_bit_identical():
    """The fused params -> bank-tables custom VJP
    (render/tiled.py::bank_tables_from_params - the dense-f32 production
    route, which never materializes the lane-padded (R, 32) f32 table)
    must match the two-op chain (build_packed_stencil_fullpitch +
    _gather_bank_tables) BITWISE: forward bank tables AND d_sigma /
    d_color, at both gather pitches."""
    from dvren_tpu.ops import grid as grid_ops
    from dvren_tpu.render import tiled as tiled_mod

    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    params = (field.sigma, field.color)
    for pitch in (1, 2):
        sched = build_tiled_schedule(plan, field, jitter=jitter,
                                     pitch=pitch)
        static = (sched.pitch,
                  tuple((g.n_tiles, g.banks) for g in sched.groups))

        def tabs_new(p):
            return tiled_mod.bank_tables_from_params(
                p[0], p[1], sched.gathermap_all, sched.gather_plan,
                static)

        def tabs_old(p):
            flat = grid_ops.build_packed_stencil_fullpitch(p[0], p[1])
            return tiled_mod._gather_bank_tables(
                flat, sched.gathermap_all, sched.gather_plan, static)

        for a, b in zip(tabs_new(params), tabs_old(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        g_new = jax.grad(lambda p: sum((x ** 2).sum()
                                       for x in tabs_new(p)))(params)
        g_old = jax.grad(lambda p: sum((x ** 2).sum()
                                       for x in tabs_old(p)))(params)
        np.testing.assert_array_equal(np.asarray(g_new[0]),
                                      np.asarray(g_old[0]))
        np.testing.assert_array_equal(np.asarray(g_new[1]),
                                      np.asarray(g_old[1]))


def test_u16_transpose_kernels_bit_exact():
    """stack_to_u16_rows == _split_u16(stack_to_rows(.)) and
    u16_rows_to_stack == rows_to_stack(_u16_rows_to_f32(.)) - the fused
    build/adjoint kernels are pure integer plumbing."""
    from dvren_tpu.ops import grid as grid_ops
    from dvren_tpu.ops import packed_transpose as pt

    rng = np.random.default_rng(11)
    stack = jnp.asarray(
        rng.standard_normal((32, 4096)).astype(np.float32) * 100.0)
    fused = pt.stack_to_u16_rows(stack)
    ref = grid_ops._split_u16(pt.stack_to_rows(stack))
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))

    rows = jnp.asarray(
        rng.integers(0, 2 ** 16, (4096, 64)).astype(np.uint16))
    back = pt.u16_rows_to_stack(rows)
    ref_b = pt.rows_to_stack(grid_ops._u16_rows_to_f32(rows, 32))
    # compare bit patterns (random u16 halves can form NaN payloads)
    np.testing.assert_array_equal(np.asarray(back).view(np.uint32),
                                  np.asarray(ref_b).view(np.uint32))


@pytest.mark.slow
def test_groupset_merged_vjp_bit_identical(monkeypatch):
    """The merged params->output custom VJP (_groupset_from_params: the
    dense-f32 production route whose backward kernel emits u16 slot rows
    in-kernel, no bank->row relayout pass) must match the two-op chain
    BITWISE: forward image, d_sigma/d_color, and the camera gradients
    (d_c2w, d_k). The two-op comparator is forced by patching
    _dense_f32_route to False (the flat-table + _gather_bank_tables
    chain, itself bit-identical to bank_tables_from_params)."""
    from dvren_tpu.render import tiled as tiled_mod

    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    sched = build_tiled_schedule(plan, field, jitter=jitter)
    assert tiled_mod._dense_f32_route(field, sched)
    params = (field.sigma, field.color)
    k0 = jnp.asarray(plan.camera.k, jnp.float32).reshape(3, 3)
    c2w0 = jnp.asarray(plan.camera.c2w, jnp.float32).reshape(3, 4)

    def img(p):
        return render_tiled(plan, field.with_params(*p), sched).image

    def loss(p):
        return (img(p) ** 2).sum()

    def cam_loss(p, c2w, k_mat):
        f = field.with_params(*p)
        planes = render_tiled(plan, f, sched, k=k_mat, c2w=c2w)
        return (planes.image ** 2).sum()

    i_new = img(params)
    g_new = jax.grad(loss)(params)
    gc_new = jax.grad(cam_loss, argnums=(0, 1, 2))(params, c2w0, k0)

    monkeypatch.setattr(tiled_mod, "_dense_f32_route",
                        lambda *a, **kw: False)
    i_old = img(params)
    g_old = jax.grad(loss)(params)
    gc_old = jax.grad(cam_loss, argnums=(0, 1, 2))(params, c2w0, k0)

    np.testing.assert_array_equal(np.asarray(i_new), np.asarray(i_old))
    for a, b in zip(g_new, g_old):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(gc_new),
                    jax.tree_util.tree_leaves(gc_old)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merged_views_fallback_uses_view_camera():
    """A view whose tiles overflow the slot tables carries a windowed
    FALLBACK whose rays are regenerated at render time - they must use
    that view's camera, not the stack plan's (review repro: fallback
    pixels rendered + differentiated along the WRONG rays). Forces
    overflow with a fine grid under 16px tiles and checks the stack
    against per-view render_tiled (which always had the right plan)."""
    from dvren_tpu.opt.fit import view_plans
    from dvren_tpu.render.tiled import (merge_view_schedules,
                                        render_tiled_stack)

    plan, field = scene(mode=SamplingMode.STRATIFIED, n=32)
    jitter = plan_jitter_table(plan)
    cams = [CameraConfig(c2w=(1, 0, 0, 0.5 + dx, 0, 1, 0, 0.55,
                              0, 0, 1, -1.1)) for dx in (0.0, 0.15)]
    plans = view_plans(plan, cams)
    scheds = [build_tiled_schedule(p, field, jitter=jitter, tile_px=16,
                                   quantize=True) for p in plans]
    assert any(s.fallback_rays > 0 for s in scheds), \
        "fixture must force slot overflow"
    import pytest
    with pytest.raises(Exception, match="pass.*plans"):
        merge_view_schedules(scheds)
    merged = merge_view_schedules(scheds, plans=plans)
    stack = render_tiled_stack(plan, field, merged)
    for v, p in enumerate(plans):
        single = render_tiled(p, field, scheds[v]).image
        np.testing.assert_array_equal(np.asarray(stack[v]),
                                      np.asarray(single))


@pytest.mark.slow
def test_bank_aligned_scatter_bit_identical():
    """The ALIGNED bit (bank0 bit 30) routes the backward's one-hot
    scatter to a single-bank 128-slot contraction; both with the
    opportunistic flags on the default packing and with the fully
    bank-aligned packing (bank_aligned=True), images AND kernel
    gradients must be bit-identical to the two-bank path (same partial
    products in the same add order; render/tiled.py, fused_tiles.py)."""
    import dataclasses

    plan, field = scene(mode=SamplingMode.STRATIFIED)
    jitter = plan_jitter_table(plan)
    s_def = build_tiled_schedule(plan, field, jitter=jitter,
                                 device=False)
    s_al = build_tiled_schedule(plan, field, jitter=jitter, device=False,
                                bank_aligned=True)
    b0 = np.concatenate([np.asarray(g.bank0).reshape(-1)
                         for g in s_al.groups])
    assert ((b0 >> 30) & 1).any()   # flags actually present

    def strip(s):
        gs = tuple(dataclasses.replace(
            g, bank0=np.asarray(g.bank0) & 0x3FFF) for g in s.groups)
        return dataclasses.replace(s, groups=gs)

    def loss(params, s):
        f = field.with_params(*params)
        img = render_tiled(plan, f, s, use_kernel=True).image
        return jnp.sum(img * 0.001 + img ** 2 * 0.01)

    params = (field.sigma, field.color)
    imgs, grads = [], []
    for s in (s_def, strip(s_def), s_al, strip(s_al)):
        imgs.append(np.asarray(
            render_tiled(plan, field, s, use_kernel=True).image))
        grads.append(jax.grad(loss)(params, s))
    for i in (1, 2, 3):
        np.testing.assert_array_equal(imgs[i], imgs[0])
        np.testing.assert_array_equal(np.asarray(grads[i][0]),
                                      np.asarray(grads[0][0]))
        np.testing.assert_array_equal(np.asarray(grads[i][1]),
                                      np.asarray(grads[0][1]))
