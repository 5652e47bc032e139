"""Backward pass: per-sample and camera gradients from dL/dI.

The analogue of ``hp_diff`` (reference ``hotpath/src/cpu/diff_cpu.cpp:89-197``
and the real CUDA kernel ``diff_cuda.cu:11-224``). The reference hand-writes
the reverse adjoint recurrence over persisted aux; here the same gradients
are the ``jax.vjp`` of :func:`dvren_tpu.ops.integrate.radiance_only` - by
construction they satisfy the identities the reference implements:

    dL/dc_k     = g . w_k
    adj_alpha_k = (g . c_k) T_k - adj_T_{k+1} T_k
    adj_T_k     = (g . c_k) alpha_k + adj_T_{k+1} (1 - alpha_k)
    dL/dsigma_k = adj_alpha_k * dt_k * (1 - alpha_k)

(diff_cpu.cpp:170-194). Like the reference, only the radiance head receives
an adjoint; termination booleans carry no gradient.

Camera gradients: the reference allocates a (3,4) camera grad and never
computes it (diff_cpu.cpp:41-47,74 - an API stub). Here
:func:`camera_grads` differentiates through ray generation, sampling and
field evaluation, producing real dL/d(c2w), dL/dK and dL/d(ortho_scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dvren_tpu.core.plan import Plan
from dvren_tpu.ops.integrate import radiance_only
from dvren_tpu.ops.raygen import generate_rays
from dvren_tpu.ops.sampling import generate_samples


@jax.jit
def per_sample_grads(
    dl_dradiance: jnp.ndarray,
    sigma: jnp.ndarray,
    color,
    dt: jnp.ndarray,
    mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample (dsigma (N,K), dcolor (N,K,3)) for dL/dI (N,3).

    ``color`` may be an (N, K, 3) array or a tuple of three (N, K) planes
    (the SoA hot-path form); the returned dcolor is always (N, K, 3).
    """

    def f(s, c):
        return radiance_only(s, c, dt, mask)

    _, vjp = jax.vjp(f, sigma, color)
    d_sigma, d_color = vjp(dl_dradiance.astype(sigma.dtype))
    if isinstance(d_color, (tuple, list)):
        d_color = jnp.stack(list(d_color), axis=-1)
    return d_sigma, d_color


@functools.partial(jax.jit, static_argnums=0)
def camera_grads(
    plan: Plan,
    field,
    dl_dradiance: jnp.ndarray,
    jitter: jnp.ndarray | None = None,
) -> dict:
    """dL/d(camera) through the full raygen->sample->field->integrate chain.

    Returns {"c2w": (3,4), "k": (3,3), "ortho_scale": ()} float32.

    ``jitter``: the forward's precomputed (N, K) stratified table
    (pipeline.plan_jitter_table). Threading it through keeps the compiled
    gradient program free of the in-graph uint32 hash emulation AND
    differentiates the exact sample set the forward rendered (the table is
    bit-exact splitmix64; the emulation can differ by 1 ulp).
    """

    def f(k, c2w, ortho_scale):
        rays = generate_rays(plan, k=k, c2w=c2w, ortho_scale=ortho_scale)
        lattice = generate_samples(plan, rays, jitter=jitter)
        px, py, pz = lattice.position_planes
        sig = field.sigma_at_planes(px, py, pz)
        col = field.color_at_planes(px, py, pz)
        return radiance_only(sig, col, lattice.dt, lattice.mask)

    k0 = jnp.asarray(plan.camera.k, jnp.float32).reshape(3, 3)
    c2w0 = jnp.asarray(plan.camera.c2w, jnp.float32).reshape(3, 4)
    s0 = jnp.asarray(plan.camera.ortho_scale, jnp.float32)

    _, vjp = jax.vjp(f, k0, c2w0, s0)
    dk, dc2w, ds = vjp(dl_dradiance.astype(jnp.float32))
    return {"k": dk, "c2w": dc2w, "ortho_scale": ds}
