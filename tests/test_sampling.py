"""Sampling lattice contracts (hp_runner samp_cpu_basic /
samp_cpu_stratified_determinism analogues; samp_cpu.cpp:151-313)."""

import numpy as np
import jax.numpy as jnp

from dvren_tpu import Plan, PlanConfig, SamplingConfig, SamplingMode
from dvren_tpu.ops.raygen import generate_rays
from dvren_tpu.ops.rng import stratified_jitter_py
from dvren_tpu.ops.sampling import generate_samples


def make_plan(dt=0.1, max_steps=16, mode=SamplingMode.FIXED, seed=0,
              t_near=0.0, t_far=1.0):
    return Plan.create(PlanConfig(
        width=4, height=4, t_near=t_near, t_far=t_far, seed=seed,
        sampling=SamplingConfig(dt=dt, max_steps=max_steps, mode=mode)))


def test_fixed_midpoints_and_monotone_t():
    plan = make_plan(dt=0.1, max_steps=16)
    lattice = generate_samples(plan, generate_rays(plan))
    t = np.asarray(lattice.t)
    mask = np.asarray(lattice.mask)
    # 10 live steps per ray (base_t 0.0..0.9 < 1.0)
    assert mask.sum(axis=1).tolist() == [10] * 16
    # fixed mode: jitter 0.5 -> segment midpoints
    expect = 0.1 * np.arange(16) + 0.05
    np.testing.assert_allclose(t[0][mask[0]], expect[:10], rtol=1e-6)
    # monotone t within each ray (hp_runner monotone_t_tol=1e-4)
    dt_seq = np.diff(t[0][mask[0]])
    assert np.all(dt_seq > 0)


def test_dt_truncated_at_tfar():
    plan = make_plan(dt=0.3, max_steps=8, t_far=1.0)
    lattice = generate_samples(plan, generate_rays(plan))
    dt = np.asarray(lattice.dt)[0]
    mask = np.asarray(lattice.mask)[0]
    # base_t = 0.0, 0.3, 0.6, 0.9 -> 4 live; last truncated to 0.1
    assert mask.sum() == 4
    np.testing.assert_allclose(dt[:4], [0.3, 0.3, 0.3, 0.1], rtol=1e-5)
    np.testing.assert_allclose(dt[4:], 0.0)


def test_mask_is_prefix():
    plan = make_plan(dt=0.17, max_steps=12)
    lattice = generate_samples(plan, generate_rays(plan))
    mask = np.asarray(lattice.mask)
    for row in mask:
        live = int(row.sum())
        assert row[:live].all() and not row[live:].any()


def test_positions_on_ray():
    plan = make_plan()
    rays = generate_rays(plan)
    lattice = generate_samples(plan, rays)
    o = np.asarray(rays.origins)[:, None, :]
    d = np.asarray(rays.directions)[:, None, :]
    t = np.asarray(lattice.t)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(lattice.positions), o + d * t, atol=1e-6)


def test_stratified_matches_oracle_and_in_segment():
    plan = make_plan(mode=SamplingMode.STRATIFIED, seed=99)
    lattice = generate_samples(plan, generate_rays(plan))
    t = np.asarray(lattice.t)
    mask = np.asarray(lattice.mask)
    dt = plan.sampling.dt
    for ray in range(0, 16, 3):
        for step in range(10):
            assert mask[ray, step]
            base_t = step * dt
            jit = stratified_jitter_py(99, ray, step)
            expect = base_t + jit * dt
            if expect >= 1.0:
                expect = np.nextafter(np.float32(1.0), np.float32(0.0))
            assert abs(t[ray, step] - expect) < 2e-6, (ray, step)


def test_stratified_determinism_memcmp():
    """samp_cpu_stratified_determinism analogue (hp_runner.cpp:1033-1038)."""
    plan = make_plan(mode=SamplingMode.STRATIFIED, seed=7)
    a = generate_samples(plan, generate_rays(plan))
    b = generate_samples(plan, generate_rays(plan))
    assert np.asarray(a.t).tobytes() == np.asarray(b.t).tobytes()
    assert np.asarray(a.positions).tobytes() == np.asarray(b.positions).tobytes()


def test_stratified_seed_changes_samples():
    p1 = make_plan(mode=SamplingMode.STRATIFIED, seed=1)
    p2 = make_plan(mode=SamplingMode.STRATIFIED, seed=2)
    a = generate_samples(p1, generate_rays(p1))
    b = generate_samples(p2, generate_rays(p2))
    assert np.asarray(a.t).tobytes() != np.asarray(b.t).tobytes()


def test_ray_offsets_prefix_parity():
    plan = make_plan(dt=0.3, max_steps=8)
    lattice = generate_samples(plan, generate_rays(plan))
    off = np.asarray(lattice.ray_offsets())
    assert off[0] == 0
    assert off[-1] == int(np.asarray(lattice.sample_count()))
    assert np.all(np.diff(off) == 4)  # 4 live samples per ray here


def test_degenerate_ray_no_samples():
    plan = make_plan()
    rays = generate_rays(plan)
    # force t_far <= t_near on one ray via override-style edit
    t_far = np.asarray(rays.t_far).copy()
    t_far[3] = 0.0
    from dvren_tpu.ops.raygen import Rays
    rays2 = Rays(origins=rays.origins, directions=rays.directions,
                 t_near=rays.t_near, t_far=jnp.asarray(t_far),
                 pixel_ids=rays.pixel_ids)
    lattice = generate_samples(plan, rays2)
    mask = np.asarray(lattice.mask)
    assert mask[3].sum() == 0 and mask[2].sum() == 10
