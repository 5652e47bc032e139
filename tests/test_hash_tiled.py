"""Fused hash-MLP tile kernel (ops/hash_tiles.py + render/hash_tiled.py)
vs the plain single-pass pipeline: forward planes, stratified jitter,
ROI pad rays, and full parameter gradients.

The kernel is the hash field's production fast path (SURVEY.md #10/11;
the reference's device kernels for this field were built but never
wired, hash_mlp_cuda.cu:12-326). Everything here runs interpret-mode on
CPU; gradient cases are slow-tier (interpret backward compiles take
minutes) but run under the contract manifest.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dvren_tpu import Plan, PlanConfig, Roi, SamplingConfig
from dvren_tpu.core.plan import SamplingMode
from dvren_tpu.fields.hash_mlp import HashMLPConfig, HashMLPField
from dvren_tpu.ops.hashmlp import HashMLPSpec
from dvren_tpu.render.hash_tiled import (build_hash_schedule,
                                         render_hash_tiled)
from dvren_tpu.render.pipeline import render

SPEC = HashMLPSpec()


def field(seed=0):
    rng = np.random.default_rng(seed)
    return HashMLPField.create(HashMLPConfig(
        params=rng.uniform(-0.5, 0.5,
                           SPEC.param_count).astype(np.float32)))


def make_plan(w=24, h=20, mode=SamplingMode.FIXED, roi=None, seed=0):
    return Plan.create(PlanConfig(
        width=w, height=h, t_near=0.2, t_far=1.8, seed=seed,
        roi=roi if roi is not None else Roi(),
        sampling=SamplingConfig(dt=0.05, max_steps=24, mode=mode)))


def assert_planes_match(plan, ref, out, tol=5e-6):
    np.testing.assert_allclose(np.asarray(out.image),
                               np.asarray(ref.image), atol=tol)
    np.testing.assert_allclose(np.asarray(out.opacity),
                               np.asarray(ref.opacity), atol=tol)
    np.testing.assert_allclose(np.asarray(out.transmittance),
                               np.asarray(ref.transmittance), atol=tol)
    # depth is knife-edged at OPACITY_EPS (tests/test_scenes.py); the
    # random hash field keeps opacity far from the epsilon here
    np.testing.assert_allclose(np.asarray(out.depth),
                               np.asarray(ref.depth), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.hitmask),
                                  np.asarray(ref.hitmask))


def test_forward_matches_pipeline():
    f = field()
    plan = make_plan()
    out = render_hash_tiled(plan, f, build_hash_schedule(plan))
    ref = render(plan, f).planes
    assert_planes_match(plan, ref, out)


def test_forward_stratified_matches_pipeline():
    f = field(seed=5)
    plan = make_plan(mode=SamplingMode.STRATIFIED, seed=11)
    out = render_hash_tiled(plan, f, build_hash_schedule(plan))
    ref = render(plan, f).planes
    assert_planes_match(plan, ref, out)


def test_forward_roi_pad_rays_exact_background():
    """ROI plans leave dead pad rays inside tiles; the kernel must
    leave their pixels exactly at background (the schedule forces their
    sample_t past t_far -> zero dt_actual everywhere)."""
    f = field(seed=7)
    plan = make_plan(w=40, h=24, roi=Roi(x=3, y=2, width=21, height=17))
    out = render_hash_tiled(plan, f, build_hash_schedule(plan))
    ref = render(plan, f).planes
    assert_planes_match(plan, ref, out)
    img = np.asarray(out.image)
    outside = np.ones(img.shape[:2], bool)
    outside[2:2 + 17, 3:3 + 21] = False
    assert np.all(img[outside] == 0.0)


@pytest.mark.slow
def test_gradients_match_pipeline():
    """Full params-dict cotangent (hash table + both MLP heads) of an
    image MSE through the fused kernel == jax.grad through the plain
    pipeline."""
    f = field(seed=2)
    plan = make_plan(w=16, h=16, mode=SamplingMode.STRATIFIED, seed=3)
    sched = build_hash_schedule(plan)
    rng = np.random.default_rng(9)
    tgt = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))

    def loss_tiled(params):
        out = render_hash_tiled(
            plan, HashMLPField(spec=f.spec, params=params), sched)
        return jnp.mean((out.image - tgt) ** 2)

    def loss_ref(params):
        out = render(plan, HashMLPField(spec=f.spec, params=params))
        return jnp.mean((out.planes.image - tgt) ** 2)

    gt = jax.grad(loss_tiled)(f.params)
    gr = jax.grad(loss_ref)(f.params)
    assert set(gt) == set(gr)
    for k in sorted(gr):
        a, b = np.asarray(gr[k]), np.asarray(gt[k])
        scale = max(float(np.abs(a).max()), 1e-8)
        np.testing.assert_allclose(b, a, atol=2e-5 * scale, err_msg=k)


@pytest.mark.slow
def test_gradient_fd_referee():
    """Directional finite-difference referee on the fused kernel's own
    gradient (independent of the pipeline)."""
    f = field(seed=4)
    plan = make_plan(w=16, h=16)
    sched = build_hash_schedule(plan)

    def loss(params):
        out = render_hash_tiled(
            plan, HashMLPField(spec=f.spec, params=params), sched)
        return jnp.mean(out.image) + 0.25 * jnp.mean(out.opacity)

    loss_j = jax.jit(loss)
    g = jax.grad(loss)(f.params)
    rng = np.random.default_rng(13)
    v = {k: jnp.asarray(rng.normal(size=np.shape(f.params[k]))
                        .astype(np.float32))
         for k in f.params}
    eps = 3e-3
    plus = {k: f.params[k] + eps * v[k] for k in f.params}
    minus = {k: f.params[k] - eps * v[k] for k in f.params}
    fd = (float(loss_j(plus)) - float(loss_j(minus))) / (2 * eps)
    an = float(sum(jnp.vdot(g[k], v[k]) for k in g))
    assert abs(fd - an) <= 2e-3 * max(abs(fd), abs(an), 1e-6), (fd, an)
