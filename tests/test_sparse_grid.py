"""Sparse brick-grid field: exactness vs dense (threshold 0), sparsity
accounting, full-pipeline rendering, and the fused tile path (round 3:
the scheduler resolves the brick indirection at build time, so sparse
fields ride the production kernel)."""

import jax
import numpy as np
import jax.numpy as jnp

from dvren_tpu import (
    CameraConfig, Context, DenseGridConfig, DenseGridField, Plan, PlanConfig,
    Renderer, RenderOptions, SamplingConfig,
)
from dvren_tpu.fields.sparse_grid import BRICK, SparseGridField
from dvren_tpu.render.pipeline import render
from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled


def blob_field(n=20, compact=True):
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")
    r2 = (xs - 0.3) ** 2 + (ys - 0.3) ** 2 + (zs - 0.3) ** 2
    sigma = 15.0 * np.exp(-r2 / (0.004 if compact else 0.1))
    sigma[sigma < 1e-3] = 0.0  # truly empty space
    color = np.stack([xs, ys, zs], axis=-1)
    return DenseGridField.create(DenseGridConfig(
        resolution=(n, n, n), sigma=sigma.astype(np.float32).reshape(-1),
        color=color.astype(np.float32).reshape(-1)))


def test_eval_exact_vs_dense_threshold_zero():
    dense = blob_field()
    sparse = SparseGridField.from_dense(dense, threshold=0.0)
    rng = np.random.default_rng(0)
    px, py, pz = (jnp.asarray(rng.uniform(-0.1, 1.1, 300), jnp.float32)
                  for _ in range(3))
    ds, dr, dg, db = dense.packed_eval_planes(px, py, pz)
    ss, sr, sg, sb = sparse.packed_eval_planes(px, py, pz)
    # sigma matches everywhere; color matches wherever density is nonzero
    # (dropped zero-density bricks also drop their never-visible color)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds),
                               rtol=1e-6, atol=1e-7)
    lit = np.asarray(ds) > 0
    assert lit.any()
    for a, b in ((sr, dr), (sg, dg), (sb, db)):
        np.testing.assert_allclose(np.asarray(a)[lit], np.asarray(b)[lit],
                                   rtol=1e-6, atol=1e-7)


def test_sparsity_drops_empty_bricks():
    sparse = SparseGridField.from_dense(blob_field(compact=True),
                                        threshold=0.0)
    assert sparse.occupied_bricks < sparse.total_bricks
    assert sparse.occupied_bricks >= 1
    # memory strictly below the dense packed table
    n = sparse.grid_shape[0]
    dense_packed_bytes = (n - 1) ** 3 * 32 * 4
    assert sparse.memory_bytes() < dense_packed_bytes


def test_render_pipeline_with_sparse_field():
    dense = blob_field()
    sparse = SparseGridField.from_dense(dense, threshold=0.0)
    plan = Plan.create(PlanConfig(
        width=12, height=10, t_near=0.2, t_far=2.2,
        camera=CameraConfig(
            k=(14.0, 0, 6.0, 0, 14.0, 5.0, 0, 0, 1),
            c2w=(1, 0, 0, 0.3, 0, 1, 0, 0.3, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=0.05, max_steps=40)))
    out_d = render(plan, dense).planes
    out_s = render(plan, sparse).planes
    np.testing.assert_allclose(np.asarray(out_s.image),
                               np.asarray(out_d.image), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_s.depth),
                               np.asarray(out_d.depth), atol=1e-5)


def test_renderer_forward_with_sparse_field():
    dense = blob_field()
    sparse = SparseGridField.from_dense(dense, threshold=0.0)
    plan = Plan.create(PlanConfig(
        width=8, height=8, t_near=0.2, t_far=2.2,
        sampling=SamplingConfig(dt=0.1, max_steps=20)))
    fr = Renderer(Context.create(), plan).forward(sparse)
    assert np.isfinite(fr.image).all()


def _tiled_plan(width=48, height=32):
    return Plan.create(PlanConfig(
        width=width, height=height, t_near=0.2, t_far=2.6,
        camera=CameraConfig(
            k=(width * 1.25, 0, width / 2, 0, width * 1.25, height / 2,
               0, 0, 1),
            c2w=(1, 0, 0, 0.3, 0, 1, 0, 0.3, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=0.04, max_steps=60)))


def _assert_planes_close(a, b, tol=1e-5):
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(a.transmittance),
                               np.asarray(b.transmittance), atol=tol)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=1e-4)


def test_tiled_schedule_sparse_matches_dense():
    """Sparse schedules ride the fused kernel: hostmap lanes name brick
    rows, no device-side table build; threshold-0 parity vs the dense
    full pipeline holds through BOTH consumers and at 8px sub-tiles."""
    dense = blob_field(compact=False)
    sparse = SparseGridField.from_dense(dense, threshold=0.0)
    plan = _tiled_plan()
    full = render(plan, dense).planes
    for tile_px in (16, 8):
        sched = build_tiled_schedule(plan, sparse, tile_px=tile_px)
        assert sched.table_kind == "sparse"
        _assert_planes_close(
            render_tiled(plan, sparse, sched, use_kernel=False), full)
        _assert_planes_close(
            render_tiled(plan, sparse, sched, use_kernel=True), full)


def test_tiled_schedule_sparse_occupancy():
    """Occupancy trimming consults brick emptiness (the shared zero
    brick marks whole bricks empty by construction)."""
    dense = blob_field(compact=True)
    sparse = SparseGridField.from_dense(dense, threshold=0.0)
    plan = _tiled_plan()
    sched = build_tiled_schedule(plan, sparse, occupancy=True)
    base = build_tiled_schedule(plan, sparse, occupancy=False)
    assert sched.tiled_samples <= base.tiled_samples
    full = render(plan, dense).planes
    _assert_planes_close(
        render_tiled(plan, sparse, sched, use_kernel=True), full)


def test_renderer_tiled_sparse_forward_backward():
    """Renderer drives sparse fields through the tiled path end to end;
    backward returns the brick-table gradient, verified against
    jax.grad through the plain pipeline."""
    dense = blob_field(compact=False)
    sparse = SparseGridField.from_dense(dense, threshold=0.0)
    plan = _tiled_plan(width=32, height=32)
    r = Renderer(Context.create(), plan,
                 RenderOptions(use_tiles=True))
    fr = r.forward(sparse)
    full = render(plan, dense).planes
    np.testing.assert_allclose(
        np.asarray(fr.image).reshape(plan.height, plan.width, 3),
        np.asarray(full.image), atol=1e-5)

    dl = np.ones(plan.ray_count * 3, np.float32)
    br = r.backward(sparse, dl)
    assert br.bricks is not None and br.sigma.size == 0

    def loss(bricks):
        pl = render(plan, sparse.with_params(bricks)).planes
        return jnp.sum(pl.image)

    g_ref = jax.grad(loss)(sparse.bricks)
    np.testing.assert_allclose(br.bricks, np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_bf16_bricks():
    dense = blob_field()
    sparse16 = SparseGridField.from_dense(dense, threshold=0.0,
                                          dtype="bfloat16")
    rng = np.random.default_rng(1)
    px, py, pz = (jnp.asarray(rng.uniform(0, 1, 100), jnp.float32)
                  for _ in range(3))
    s16 = np.asarray(sparse16.packed_eval_planes(px, py, pz)[0])
    s32 = np.asarray(dense.packed_eval_planes(px, py, pz)[0])
    assert np.abs(s16 - s32).max() < 0.1  # bf16 field precision
    assert sparse16.memory_bytes() < SparseGridField.from_dense(
        dense, threshold=0.0).memory_bytes()


def test_tiled_sparse_pair_pitch_bit_identical():
    """pitch=2 over a brick table: pairs are formed on GEOMETRIC cell ids
    and resolve to brick-row pairs (rows are x-minor within a brick and
    BRICK is even, so the even member of a pair maps to an even row and
    its partner to row+1). Bit-identical to pitch=1."""
    dense = blob_field(compact=False)
    sparse = SparseGridField.from_dense(dense, threshold=0.0)
    plan = _tiled_plan()
    s1 = build_tiled_schedule(plan, sparse)
    s2 = build_tiled_schedule(plan, sparse, pitch=2)
    gm = np.asarray(s2.gathermap_all)
    hm = np.asarray(s2.hostmap_all)
    valid = hm >= 0
    # every touched lane's brick row == its pair's row pair * 2 + (lane & 1)
    lane_par = (np.arange(hm.size) & 1)
    np.testing.assert_array_equal(
        hm[valid], gm[np.arange(hm.size)[valid] // 2] * 2
        + lane_par[valid])
    for uk in (False, True):
        a = render_tiled(plan, sparse, s1, use_kernel=uk)
        b = render_tiled(plan, sparse, s2, use_kernel=uk)
        np.testing.assert_array_equal(np.asarray(a.image),
                                      np.asarray(b.image))


def test_tiled_sparse_odd_nx_demotes_pitch():
    """Odd x-dimension sparse grids CANNOT satisfy the pair premise
    (flat-id pairs wrap x rows, so cell 2j+1 is not at brick row(2j)+1 -
    the paired fetch would load the wrong row, rendering silently wrong).
    build_tiled_schedule must demote pitch=2 to 1 and stay bit-identical."""
    dense = blob_field(n=21, compact=False)
    sparse = SparseGridField.from_dense(dense, threshold=0.0)
    plan = _tiled_plan()
    s1 = build_tiled_schedule(plan, sparse)
    s2 = build_tiled_schedule(plan, sparse, pitch=2)
    assert s2.pitch == 1
    for uk in (False, True):
        a = render_tiled(plan, sparse, s1, use_kernel=uk)
        b = render_tiled(plan, sparse, s2, use_kernel=uk)
        np.testing.assert_array_equal(np.asarray(a.image),
                                      np.asarray(b.image))
    # even dims keep the fast path (regression guard for the demotion
    # being overly broad)
    dense20 = blob_field(n=20, compact=False)
    sparse20 = SparseGridField.from_dense(dense20, threshold=0.0)
    assert build_tiled_schedule(plan, sparse20, pitch=2).pitch == 2
