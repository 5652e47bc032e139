"""Renderer streaming mode: parity with the in-memory paths + backward."""

import numpy as np
import pytest

from dvren_tpu import (
    CameraConfig, Context, DenseGridConfig, DenseGridField, DvrenError,
    Plan, PlanConfig, Renderer, RenderOptions, SamplingConfig, SamplingMode,
)
from dvren_tpu.render.pipeline import render


def scene(mode=SamplingMode.STRATIFIED):
    rng = np.random.default_rng(2)
    n = 6
    plan = Plan.create(PlanConfig(
        width=14, height=10, t_near=0.3, t_far=2.3, seed=5,
        camera=CameraConfig(
            k=(18.0, 0, 7.0, 0, 18.0, 5.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=0.08, max_steps=26, mode=mode)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 6.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3)))
    return plan, field


def test_streaming_forward_matches_fused():
    plan, field = scene()
    ctx = Context.create()
    a = Renderer(ctx, plan, RenderOptions(streaming=True)).forward(field)
    b = Renderer(ctx, plan, RenderOptions(streaming=False)).forward(field)
    np.testing.assert_allclose(a.image, b.image, atol=1e-6)
    np.testing.assert_allclose(a.depth, b.depth, atol=1e-5)
    np.testing.assert_array_equal(a.hitmask, b.hitmask)
    assert a.sample_count == b.sample_count  # analytic == measured
    assert "streaming_path" in a.stats.notes


def test_streaming_backward_matches_fused():
    plan, field = scene()
    ctx = Context.create()
    dl = np.random.default_rng(3).uniform(
        -1, 1, (plan.ray_count, 3)).astype(np.float32)

    rs = Renderer(ctx, plan, RenderOptions(streaming=True))
    rs.forward(field)
    bs = rs.backward(field, dl)

    rf = Renderer(ctx, plan, RenderOptions(streaming=False))
    rf.forward(field)
    bf = rf.backward(field, dl)

    np.testing.assert_allclose(bs.sigma, bf.sigma, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(bs.color, bf.color, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(bs.camera, bf.camera, rtol=1e-3, atol=1e-6)


def test_streaming_auto_selection():
    plan, field = scene()
    ctx = Context.create()
    r_small = Renderer(ctx, plan)  # tiny plan -> in-memory
    assert not r_small._streaming
    r_forced = Renderer(ctx, plan, RenderOptions(streaming_budget=10))
    assert r_forced._streaming


def test_streaming_per_sample_views_match_fused():
    """Streaming-mode parity views recompute the lattice tile-by-tile and
    must match the in-memory views exactly (the reference persists aux
    always, int_cpu.cpp:201-207; production sizes stream it here)."""
    plan, field = scene()
    ctx = Context.create()
    dl = np.random.default_rng(9).uniform(
        -1, 1, (plan.ray_count, 3)).astype(np.float32)

    rf = Renderer(ctx, plan, RenderOptions(streaming=False))
    rf.forward(field)
    ref_samples = rf.packed_samples()
    ref_aux = rf.packed_aux()
    ref_ds, ref_dc = rf.per_sample_gradients(dl)

    rs = Renderer(ctx, plan, RenderOptions(streaming=True))
    rs.forward(field)
    got_samples = rs.packed_samples()
    got_aux = rs.packed_aux()
    got_ds, got_dc = rs.per_sample_gradients(dl)

    for key in ("positions", "dt", "sigma", "color", "ray_offset"):
        np.testing.assert_array_equal(got_samples[key], ref_samples[key])
    np.testing.assert_array_equal(got_aux, ref_aux)
    np.testing.assert_array_equal(got_ds, ref_ds)
    np.testing.assert_array_equal(got_dc, ref_dc)


def test_windowed_per_sample_views_match_fused():
    """Window scheduling only skips provably-zero contributions; the packed
    parity views are defined on the full lattice and must be identical."""
    plan, field = windowed_scene()
    ctx = Context.create()
    rf = Renderer(ctx, plan, RenderOptions())
    rf.forward(field)
    rw = Renderer(ctx, plan, RenderOptions(use_window=True))
    rw.forward(field)
    ref = rf.packed_samples()
    got = rw.packed_samples()
    for key in ("positions", "dt", "sigma", "color", "ray_offset"):
        np.testing.assert_array_equal(got[key], ref[key])
    np.testing.assert_array_equal(rw.packed_aux(), rf.packed_aux())


def test_streaming_graph_replay():
    plan, field = scene()
    r = Renderer(Context.create(), plan,
                 RenderOptions(streaming=True, enable_graph=True))
    a = r.forward(field)
    b = r.forward(field)
    assert a.image.tobytes() == b.image.tobytes()
    assert "graph_executed" in b.stats.notes


def windowed_scene(mode=SamplingMode.STRATIFIED):
    plan, _ = scene(mode)
    rng = np.random.default_rng(11)
    n = 6
    sub = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 6.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3),
        bbox_min=(0.25, 0.3, 0.2), bbox_max=(0.8, 0.85, 0.7)))
    return plan, sub


def test_windowed_renderer_matches_fused():
    plan, field = windowed_scene()
    ctx = Context.create()
    a = Renderer(ctx, plan, RenderOptions(use_window=True)).forward(field)
    b = Renderer(ctx, plan, RenderOptions()).forward(field)
    np.testing.assert_allclose(a.image, b.image, atol=2e-6)
    np.testing.assert_allclose(a.depth, b.depth, atol=1e-5)
    np.testing.assert_array_equal(a.hitmask, b.hitmask)
    assert "windowed_path" in a.stats.notes


def test_windowed_renderer_backward_and_replay():
    plan, field = windowed_scene()
    ctx = Context.create()
    dl = np.random.default_rng(7).uniform(
        -1, 1, (plan.ray_count, 3)).astype(np.float32)

    rw = Renderer(ctx, plan,
                  RenderOptions(use_window=True, enable_graph=True))
    a = rw.forward(field)
    b = rw.forward(field)  # schedule + AOT executable reused
    assert a.image.tobytes() == b.image.tobytes()
    assert "graph_executed" in b.stats.notes
    bw = rw.backward(field, dl)

    rf = Renderer(ctx, plan, RenderOptions())
    rf.forward(field)
    bf = rf.backward(field, dl)
    np.testing.assert_allclose(bw.sigma, bf.sigma, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(bw.color, bf.color, rtol=1e-4, atol=1e-7)


def test_explicit_use_window_beats_auto_tiles(monkeypatch):
    """On TPU the auto-tiled default must NOT override an explicit
    use_window=True: users select the window path for camera gradients,
    which tiled mode zeroes (the schedule bakes the camera)."""
    import jax
    plan, field = windowed_scene()
    r = Renderer(Context.create(), plan, RenderOptions(use_window=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not r._use_tiles(field)
    # and an explicit use_tiles=True still wins over the default window off
    r2 = Renderer(Context.create(), plan, RenderOptions(use_tiles=True))
    assert r2._use_tiles(field)


@pytest.mark.slow
def test_auto_tiles_rescues_fine_grid(monkeypatch):
    """Fine grids under wide frusta overflow the 16px/8px slot tables
    (round 2 demoted exactly this class to the windowed path); auto mode
    now rescues them with 4px sub-tiles - one block row per sub-tile,
    <= 128 samples so a run can never exceed the 256-cell limit - and
    stays on the kernel with real camera gradients."""
    import jax
    from dvren_tpu.ops import fused_tiles, packed_transpose
    rng = np.random.default_rng(4)
    n = 96  # fine grid against a tiny image: 16px/8px tiles all overflow
    plan = Plan.create(PlanConfig(
        width=32, height=32, t_near=0.3, t_far=2.3, seed=5,
        camera=CameraConfig(
            k=(38.0, 0, 16.0, 0, 38.0, 16.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=0.04, max_steps=48)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n),
        sigma=rng.uniform(0.5, 4.0, n ** 3),
        color=rng.uniform(0, 1, 3 * n ** 3)))
    r = Renderer(Context.create(), plan)  # auto mode
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # the faked TPU backend must not reach Mosaic on the CPU test host
    monkeypatch.setattr(fused_tiles, "_interpret_default", lambda: True)
    monkeypatch.setattr(packed_transpose, "_interpret_default",
                        lambda: True)
    fr = r.forward(field)
    notes = " ".join(fr.stats.notes)
    assert "tiled_subtiled_4px" in notes
    assert "tiled_path" in notes
    assert "tiled_demoted_to_windowed" not in notes
    full = render(plan, field).planes
    np.testing.assert_allclose(
        np.asarray(fr.image).reshape(plan.height, plan.width, 3),
        np.asarray(full.image), atol=1e-4)
    # backward rides the tiled replay, with REAL camera grads
    br = r.backward(field, np.ones(plan.ray_count * 3, np.float32))
    assert br.sigma.shape == (n ** 3,)
    assert np.abs(br.camera).sum() > 0


def test_auto_tiles_demotes_on_heavy_fallback(monkeypatch):
    """The demotion safety net: when even the finest rescue schedule
    leaves most rays in fallback, auto mode runs the windowed path
    instead of paying the tiled machinery for nothing."""
    import dataclasses
    import jax
    from dvren_tpu.render import tiled as tiled_mod
    plan, field = windowed_scene()
    real_build = tiled_mod.build_tiled_schedule

    def heavy_build(*a, **kw):
        s = real_build(*a, **kw)
        return dataclasses.replace(s, fallback_rays=s.total_rays)

    monkeypatch.setattr(tiled_mod, "build_tiled_schedule", heavy_build)
    r = Renderer(Context.create(), plan)  # auto mode
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fr = r.forward(field)
    notes = " ".join(fr.stats.notes)
    assert "tiled_demoted_to_windowed" in notes
    assert "windowed_path" in notes
    # backward must route through the windowed schedule, with camera grads
    br = r.backward(field, np.ones(plan.ray_count * 3, np.float32))
    assert br.sigma.shape == np.asarray(field.sigma).reshape(-1).shape
    assert np.abs(br.camera).sum() > 0


def test_windowed_renderer_rejects_unbounded_fields():
    plan, _ = windowed_scene()
    from dvren_tpu import HashMLPConfig, HashMLPField
    hm = HashMLPField.create(HashMLPConfig())
    r = Renderer(Context.create(), plan, RenderOptions(use_window=True))
    with pytest.raises(DvrenError):
        r.forward(hm)


def test_windowed_renderer_backward_rejects_sparse_fields():
    from dvren_tpu import SparseGridField
    plan, field = windowed_scene()
    sparse = SparseGridField.from_dense(field)
    r = Renderer(Context.create(), plan, RenderOptions(use_window=True))
    r.forward(sparse)  # windowed forward supports sparse bricks
    dl = np.zeros((plan.ray_count, 3), np.float32)
    with pytest.raises(DvrenError):
        r.backward(sparse, dl)


def test_tiled_stage_stats_fill():
    """capture_stats on the tiled path fills the per-stage ms via the
    decomposed replay (sample=tables, integrate=kernel, compose=compose;
    renderer.cpp:258-385 parity). The probe times by fetching output
    bytes across cycled field variants - never block_until_ready on
    value-identical calls (relay hazard #3)."""
    plan, field = scene()
    r = Renderer(Context.create(), plan,
                 RenderOptions(use_tiles=True, capture_stats=True))
    fr = r.forward(field)
    assert "tiled_path" in fr.stats.notes
    assert any(n.startswith("stage_ms=") for n in fr.stats.notes), \
        fr.stats.notes
    assert fr.stats.sample_ms > 0 and fr.stats.integrate_ms > 0 \
        and fr.stats.compose_ms > 0
    # cached per (schedule, field meta): a second forward reuses it
    fr2 = r.forward(field)
    assert fr2.stats.sample_ms == fr.stats.sample_ms
