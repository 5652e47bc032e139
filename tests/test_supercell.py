"""Supercell tile tables (cell_scale=2): one slot per 2x2x2 cell block.

The coarse-view rescue (VERDICT r3 missing #1): training views coarser
than the grid explode the per-cell table economy; supercell slots carry
the 3^3 VERTEX block (108 values) and the kernel selects each sample's
cell corners with hat-basis weights whose nonzero products are
bit-identical to the per-cell trilinear (ops/fused_tiles.py,
stencil="super"; ops/grid.py::build_supercell_stencil).

Reference behavioral contract: same trilinear emission-absorption math
as /root/reference/hotpath/src/cpu/grid_dense_cpu.cpp:56-245 +
int_cpu.cpp:98-229; the fused-path role model is
hotpath/src/cpu/samp_int_fused.cpp:11-76.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvren_tpu import DenseGridConfig, DenseGridField, Plan, PlanConfig
from dvren_tpu.core.plan import CameraConfig, SamplingConfig, SamplingMode
from dvren_tpu.render.pipeline import plan_jitter_table
from dvren_tpu.render.tiled import (build_tiled_schedule,
                                    build_tiled_schedule_auto,
                                    render_tiled)
from dvren_tpu.render.windowed import build_schedule, render_windowed_traced


def scene(n=32, wh=48, steps=32):
    """Coarse-view scene (~1.5 px/cell - the fit-flagship ratio, where
    per-cell 16px tables overflow 100% of tiles but supercell tables
    hold most of the frame)."""
    zs, ys, xs = np.meshgrid(*[np.linspace(0, 1, n)] * 3, indexing="ij")
    r2 = (xs - 0.5) ** 2 + (ys - 0.5) ** 2 + (zs - 0.45) ** 2
    sigma = (12.0 * np.exp(-r2 / 0.05)).astype(np.float32)
    color = np.stack([xs, ys, 1.0 - zs], -1).astype(np.float32)
    plan = Plan.create(PlanConfig(
        width=wh, height=wh, t_near=0.2, t_far=2.2, seed=3,
        camera=CameraConfig(
            k=(wh * 1.2, 0, wh / 2, 0, wh * 1.2, wh / 2, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=2.0 / steps, max_steps=steps,
                                mode=SamplingMode.STRATIFIED)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(n,) * 3, sigma=sigma.reshape(-1),
        color=color.reshape(-1)))
    return plan, field


def test_supercell_build_matches_grid_values():
    from dvren_tpu.ops import grid as grid_ops
    rs = np.random.RandomState(0)
    for n in (2, 3, 5, 8):
        sigma = rs.rand(n, n, n).astype(np.float32)
        color = rs.rand(n, n, n, 3).astype(np.float32)
        tab = np.asarray(grid_ops.build_supercell_stencil(
            jnp.asarray(sigma), jnp.asarray(color)))
        SZ, SY, SX = grid_ops.supercell_dims((n, n, n))
        assert tab.shape == (SZ * SY * SX, 108)
        for _ in range(16):
            s = rs.randint(0, (SZ, SY, SX))
            v = rs.randint(0, 3, 3)
            ch = rs.randint(0, 4)
            gz, gy, gx = 2 * s[0] + v[0], 2 * s[1] + v[1], 2 * s[2] + v[2]
            exp = 0.0
            if gz < n and gy < n and gx < n:
                exp = sigma[gz, gy, gx] if ch == 0 else \
                    color[gz, gy, gx, ch - 1]
            got = tab[(s[0] * SY + s[1]) * SX + s[2],
                      ch * 27 + v[0] * 9 + v[1] * 3 + v[2]]
            assert got == np.float32(exp)


def test_supercell_reference_matches_windowed():
    """The supercell schedule + reference consumer reproduces the exact
    windowed render (the per-cell table economy's oracle)."""
    plan, field = scene()
    jit = plan_jitter_table(plan)
    s2 = build_tiled_schedule(plan, field, jitter=jit, cell_scale=2)
    assert s2.groups, "supercell tables must hold most of this scene"
    assert s2.fallback_rays < s2.total_rays
    wsched = build_schedule(plan, field.bbox_min, field.bbox_max,
                            jitter=jit)
    ref = render_windowed_traced(plan, field, wsched)
    out = render_tiled(plan, field, s2, use_kernel=False)
    np.testing.assert_allclose(np.asarray(out.image),
                               np.asarray(ref.image), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.transmittance),
                               np.asarray(ref.transmittance), atol=2e-6)


def test_supercell_uniform_quantization_bit_identical():
    """quantize="uniform" (one (nc, nb) class) and uniform_shape pinning
    only PAD (masked chunks, never-indexed banks): renders are
    bit-identical to the unquantized supercell schedule."""
    plan, field = scene()
    jit = plan_jitter_table(plan)
    a = build_tiled_schedule(plan, field, jitter=jit, cell_scale=2)
    b = build_tiled_schedule(plan, field, jitter=jit, cell_scale=2,
                             quantize="uniform")
    assert len({(g.n_chunks, g.banks) for g in b.groups}) <= 1
    nc_u = max(g.n_chunks for g in b.groups)
    nb_u = max(g.banks for g in b.groups)
    c = build_tiled_schedule(plan, field, jitter=jit, cell_scale=2,
                             quantize="uniform",
                             uniform_shape=(nc_u + 1, nb_u + 2))
    ia = np.asarray(render_tiled(plan, field, a, use_kernel=False).image)
    ib = np.asarray(render_tiled(plan, field, b, use_kernel=False).image)
    ic = np.asarray(render_tiled(plan, field, c, use_kernel=False).image)
    assert np.array_equal(ia, ib)
    assert np.array_equal(ia, ic)


def test_supercell_native_matches_numpy():
    """Native scale-2 scheduler (ABI v3: supercell ids + l bits at
    lidx<<16) is byte-identical to the numpy reference."""
    import os
    from dvren_tpu import native
    if not native.available():
        pytest.skip(f"native library unavailable: {native.load_error()}")
    plan, field = scene()
    jit = plan_jitter_table(plan)

    def snap():
        s = build_tiled_schedule(plan, field, jitter=jit, cell_scale=2)
        out = [np.asarray(s.hostmap_all), s.fallback_rays]
        for g in s.groups:
            out += [np.asarray(g.samp), np.asarray(g.base),
                    np.asarray(g.bank0), np.asarray(g.hostmap)]
        return out

    old = os.environ.get("DVREN_NATIVE_SCHED")
    try:
        os.environ["DVREN_NATIVE_SCHED"] = "0"
        a = snap()
        os.environ["DVREN_NATIVE_SCHED"] = "1"
        b = snap()
    finally:
        if old is None:
            os.environ.pop("DVREN_NATIVE_SCHED", None)
        else:
            os.environ["DVREN_NATIVE_SCHED"] = old
    assert len(a) == len(b)
    for va, vb in zip(a, b):
        if isinstance(va, np.ndarray):
            assert va.dtype == vb.dtype and np.array_equal(va, vb)
        else:
            assert va == vb


@pytest.mark.slow
def test_supercell_kernel_matches_reference():
    """The interpret-mode Pallas kernel (stencil="super") matches the
    pure-jnp reference consumer (hat-weight selection, same group
    reductions as the cell kernel)."""
    plan, field = scene()
    jit = plan_jitter_table(plan)
    s2 = build_tiled_schedule(plan, field, jitter=jit, cell_scale=2)
    assert s2.groups
    ref = render_tiled(plan, field, s2, use_kernel=False)
    out = render_tiled(plan, field, s2, use_kernel=True)
    np.testing.assert_allclose(np.asarray(out.image),
                               np.asarray(ref.image), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.transmittance),
                               np.asarray(ref.transmittance), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth),
                               np.asarray(ref.depth), atol=2e-5)


@pytest.mark.slow
def test_supercell_gradients_match_windowed():
    """Field gradients through the supercell kernel's custom VJP match
    the windowed path's autodiff (the adjoint referee)."""
    plan, field = scene()
    jit = plan_jitter_table(plan)
    s2 = build_tiled_schedule(plan, field, jitter=jit, cell_scale=2)
    wsched = build_schedule(plan, field.bbox_min, field.bbox_max,
                            jitter=jit)
    tgt = jnp.zeros((plan.height, plan.width, 3), jnp.float32)

    def loss_k(p):
        f = field.with_params(*p)
        return jnp.mean(
            (render_tiled(plan, f, s2, use_kernel=True).image - tgt) ** 2)

    def loss_w(p):
        f = field.with_params(*p)
        return jnp.mean(
            (render_windowed_traced(plan, f, wsched).image - tgt) ** 2)

    p = (field.sigma, field.color)
    gk = jax.grad(loss_k)(p)
    gw = jax.grad(loss_w)(p)
    for a, b in zip(gk, gw):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-12)
        assert np.abs(a - b).max() / scale < 1e-5


@pytest.mark.slow
def test_supercell_camera_gradients_match_windowed():
    """The supercell kernel's camera adjoint (hat-derivative chain)
    matches the windowed path's dC2W at the baked camera."""
    plan, field = scene()
    jit_tab = plan_jitter_table(plan)
    s2 = build_tiled_schedule(plan, field, jitter=jit_tab, cell_scale=2)
    wsched = build_schedule(plan, field.bbox_min, field.bbox_max,
                            jitter=jit_tab)
    k0 = jnp.asarray(plan.camera.k, jnp.float32).reshape(3, 3)
    c2w0 = jnp.asarray(plan.camera.c2w, jnp.float32).reshape(3, 4)
    dl = jnp.asarray(np.random.default_rng(7).uniform(
        -1, 1, (plan.height, plan.width, 3)).astype(np.float32))

    def loss_k(c2w):
        img = render_tiled(plan, field, s2, k=k0, c2w=c2w).image
        return jnp.sum(img * dl)

    def loss_w(c2w):
        img = render_windowed_traced(plan, field, wsched,
                                     k=k0, c2w=c2w).image
        return jnp.sum(img * dl)

    gk = np.asarray(jax.grad(loss_k)(c2w0))
    gw = np.asarray(jax.grad(loss_w)(c2w0))
    assert np.abs(gk).sum() > 0
    assert np.abs(gk - gw).max() / max(np.abs(gw).max(), 1e-9) < 5e-3


def test_supercell_auto_cascade_picks_supercell_for_coarse_views():
    plan, field = scene()
    jit = plan_jitter_table(plan)
    sched, note = build_tiled_schedule_auto(plan, field, jitter=jit)
    assert sched.cell_scale == 2, note
    assert sched.fallback_rays * 10 <= sched.total_rays
