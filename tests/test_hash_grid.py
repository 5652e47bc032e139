"""NGP-scale fused hash-grid path (ops/hash_grid.py + the render route).

The reference's hash-MLP device kernels are dead code
(hash_mlp_cuda.cu:12-326) and its hyperparameters are hardcoded to a
toy T=16 table (hash_mlp_cpu.cpp:165-196); this path carries realistic
Instant-NGP table sizes (T >= 2^12) by resolving the hash lookups into
a per-step packed multi-level table consumed through the dense path's
bank machinery. Referee: the streamed eval path (ops/hashmlp.py::
eval_planes) with the grid path's OOB-ZERO semantic applied."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvren_tpu import (CameraConfig, Plan, PlanConfig, SamplingConfig,
                       SamplingMode)
from dvren_tpu.fields.hash_mlp import HashMLPField
from dvren_tpu.ops import hash_grid
from dvren_tpu.ops.hashmlp import HashMLPSpec, eval_planes
from dvren_tpu.render.hash_tiled import (build_hash_grid_schedule,
                                         render_hash_grid_tiled)
from dvren_tpu.render.pipeline import plan_jitter_table, render

# Small finest grid keeps the CPU interpret-mode kernels tractable
# (16px tiles, subs=1); table_size stays NGP-scale - the path's point.
SPEC = HashMLPSpec(n_levels=3, features_per_level=2, table_size=4096,
                   hidden_dim=8, base_resolution=2.0,
                   finest_resolution=8.0, resolutions=(2, 4, 8))


def _plan(w=32, steps=16, mode=SamplingMode.STRATIFIED):
    return Plan.create(PlanConfig(
        width=w, height=w, t_near=0.2, t_far=2.2, seed=5,
        camera=CameraConfig(
            k=(w * 1.2, 0, w / 2, 0, w * 1.2, w / 2, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=2.0 / steps, max_steps=steps,
                                mode=mode)))


def _field(spec=SPEC, seed=0):
    return HashMLPField.init_random(jax.random.PRNGKey(seed), spec,
                                    table_std=0.5)


class _MaskedHash:
    """The streamed referee under the grid path's OOB-ZERO semantic."""

    supports_packed_eval = True

    def __init__(self, field):
        self.f = field

    def packed_eval_planes(self, px, py, pz):
        s, r, g, b = eval_planes(px, py, pz, self.f.params, self.f.spec)
        inside = ((px >= 0) & (px <= 1) & (py >= 0) & (py <= 1)
                  & (pz >= 0) & (pz <= 1)).astype(jnp.float32)
        return s * inside, r * inside, g * inside, b * inside


def test_grid_path_ok_gating():
    assert hash_grid.grid_path_ok(SPEC)
    assert not hash_grid.grid_path_ok(HashMLPSpec())   # no explicit res
    assert not hash_grid.grid_path_ok(
        HashMLPSpec(n_levels=3, resolutions=(2, 5, 8)))  # non-pow2 ratio
    assert not hash_grid.grid_path_ok(
        HashMLPSpec(n_levels=3, resolutions=(2.5, 4, 8)))  # non-integer
    assert not hash_grid.grid_path_ok(
        HashMLPSpec(n_levels=3, resolutions=(2, 4, 128)))  # finest > 64


def test_packed_table_matches_eval_planes_pointwise():
    """A packed row's corner values ARE the hash-table entries the
    streamed encoding reads: evaluating at cell centers through the
    table must match eval_planes' encoding-level lerp."""
    field = _field()
    packed = np.asarray(hash_grid.build_hash_grid_table(
        field.params, field.spec))
    res = [int(r) for r in SPEC.resolutions]
    rf = res[-1]
    npts = rf + 1
    F = SPEC.features_per_level
    rng = np.random.default_rng(1)
    tab = np.asarray(field.params["hash_table"])
    for _ in range(32):
        ix, iy, iz = rng.integers(0, rf, 3)
        row = packed[(iz * npts + iy) * npts + ix]
        for l, rl in enumerate(res):
            k = rf // rl
            c0 = np.array([ix, iy, iz]) // k
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        h = np.uint32(
                            np.uint32(c0[0] + dx)
                            ^ (np.uint32(c0[1] + dy)
                               * np.uint32(2654435761))
                            ^ (np.uint32(c0[2] + dz)
                               * np.uint32(805459861))) % SPEC.table_size
                        corner = dz * 4 + dy * 2 + dx
                        for f in range(F):
                            col = (l * 8 + corner) * F + f
                            assert row[col] == tab[l, h, f]


@pytest.mark.parametrize("mode", [
    SamplingMode.FIXED,
    pytest.param(SamplingMode.STRATIFIED, marks=pytest.mark.slow)])
def test_forward_matches_streamed_referee(mode):
    plan = _plan(mode=mode)
    field = _field()
    jitter = plan_jitter_table(plan)
    sched = build_hash_grid_schedule(plan, field, jitter=jitter)
    got = render_hash_grid_tiled(plan, field, sched)
    ref = render(plan, _MaskedHash(field), jitter=jitter).planes
    img_d = float(jnp.abs(got.image - ref.image).max())
    t_d = float(jnp.abs(got.transmittance - ref.transmittance).max())
    assert img_d < 1e-4, f"image diff {img_d}"
    assert t_d < 1e-4, f"transmittance diff {t_d}"
    assert np.isfinite(np.asarray(got.depth)).all()


@pytest.mark.slow
def test_gradients_match_fd():
    """FD referee on the full chain: hash table, MLP weights."""
    plan = _plan(w=32, steps=16)
    field = _field(seed=2)
    jitter = plan_jitter_table(plan)
    sched = build_hash_grid_schedule(plan, field, jitter=jitter)
    target = jnp.zeros((plan.height, plan.width, 3), jnp.float32)

    def loss(params):
        f = field.with_params(params)
        img = render_hash_grid_tiled(plan, f, sched).image
        return jnp.mean((img - target) ** 2)

    g = jax.grad(loss)(field.params)
    rng = np.random.default_rng(3)
    checked = 0
    for name, eps in (("hash_table", 1e-3), ("sigma_w1", 1e-3),
                      ("color_w2", 1e-3), ("sigma_b2", 1e-3),
                      ("color_b1", 1e-3)):
        arr = np.asarray(field.params[name], np.float64)
        ga = np.asarray(g[name], np.float64)
        flat_idx = rng.choice(arr.size, size=min(4, arr.size),
                              replace=False)
        for fi in flat_idx:
            delta = np.zeros(arr.size, np.float32)
            delta[fi] = eps
            delta = delta.reshape(arr.shape)
            pp = dict(field.params)
            pp[name] = field.params[name] + delta
            pm = dict(field.params)
            pm[name] = field.params[name] - delta
            fd = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
            an = float(ga.reshape(-1)[fi])
            scale = max(abs(fd), abs(an), 1e-6)
            assert abs(fd - an) / scale < 3e-2, \
                f"{name}[{fi}]: fd {fd} vs an {an}"
            checked += 1
    assert checked >= 16


@pytest.mark.slow
def test_grad_parity_vs_streamed_referee():
    """jax.grad through the fused path vs jax.grad through the masked
    streamed referee (independent code path, same math)."""
    plan = _plan(w=32, steps=16, mode=SamplingMode.FIXED)
    field = _field(seed=4)
    sched = build_hash_grid_schedule(plan, field)
    target = jnp.full((plan.height, plan.width, 3), 0.25, jnp.float32)

    def loss_fused(params):
        f = field.with_params(params)
        img = render_hash_grid_tiled(plan, f, sched).image
        return jnp.mean((img - target) ** 2)

    def loss_ref(params):
        f = field.with_params(params)
        img = render(plan, _MaskedHash(f)).planes.image
        return jnp.mean((img - target) ** 2)

    ga = jax.grad(loss_fused)(field.params)
    gb = jax.grad(loss_ref)(field.params)
    for name in ("hash_table", "sigma_w1", "sigma_w2", "color_w1",
                 "color_w2", "sigma_b1", "color_b2"):
        a, b = np.asarray(ga[name]), np.asarray(gb[name])
        scale = max(np.abs(b).max(), 1e-6)
        d = np.abs(a - b).max() / scale
        assert d < 5e-3, f"{name}: rel grad diff {d}"


@pytest.mark.slow
def test_determinism():
    plan = _plan(w=32, steps=16)
    field = _field(seed=6)
    jitter = plan_jitter_table(plan)
    sched = build_hash_grid_schedule(plan, field, jitter=jitter)
    a = np.asarray(render_hash_grid_tiled(plan, field, sched).image)
    b = np.asarray(render_hash_grid_tiled(plan, field, sched).image)
    np.testing.assert_array_equal(a, b)
