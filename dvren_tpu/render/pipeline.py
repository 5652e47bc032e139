"""Pure functional render pipeline: the jittable core of the framework.

The staged pipeline mirrors the reference call sequence
``hp_ray -> hp_samp -> hp_int -> hp_img`` (SURVEY.md section 3.1); the fused
entry is one composed function - under ``jax.jit`` XLA fuses ray generation,
sampling, field gathers and the integration cumprod into a single executable,
the TPU-native equivalent of ``hp_samp_int_fused`` + CUDA Graph replay
(``hotpath/src/cuda/graph_cuda.cu``). Both paths compute identical values by
construction (the reference proves the same with a bitwise staged-vs-fused
test, hp_runner.cpp:1737-1760; here the fused path literally composes the
staged functions and the parity test guards against regressions).

Everything here is differentiable; training code calls :func:`render` inside
a loss and lets ``jax.grad`` flow into field parameters and camera inputs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from dvren_tpu.core.plan import Plan
from dvren_tpu.ops.compose import ImagePlanes, compose
from dvren_tpu.ops.integrate import Integration, integrate
from dvren_tpu.ops.raygen import Rays, generate_rays
from dvren_tpu.ops.sampling import SampleLattice, generate_samples
from dvren_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
@dataclass(frozen=True)
class RenderOutputs:
    """Everything a forward pass produces (device arrays)."""

    rays: Rays
    lattice: SampleLattice
    sigma: jnp.ndarray        # (N, K)
    color: jnp.ndarray        # (N, K, 3)
    intl: Integration
    planes: ImagePlanes


def eval_fields(field, lattice: SampleLattice) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Field evaluation at all live lattice positions.

    The reference evaluates fields inside the sampling loop
    (samp_cpu.cpp:255-289); here it is one batched evaluation that XLA fuses
    with its consumers. Masked slots are forced to zero so downstream math
    never sees garbage from positions beyond t_far.
    """
    sigma = field.sigma_at(lattice.positions)
    color = field.color_at(lattice.positions)
    maskf = lattice.mask.astype(sigma.dtype)
    return sigma * maskf, color * maskf[..., None]


def render(
    plan: Plan,
    field,
    k: jnp.ndarray | None = None,
    c2w: jnp.ndarray | None = None,
    ortho_scale: jnp.ndarray | None = None,
    rays: Rays | None = None,
) -> RenderOutputs:
    """Full forward: raygen -> sampling -> field eval -> integrate -> compose.

    ``rays`` overrides generation (the hp_ray override path,
    ray_cpu.cpp:148-150). Camera arrays default to the plan's static camera.
    """
    unique_pixels = rays is None  # generated rays enumerate the ROI
    if rays is None:
        rays = generate_rays(plan, k=k, c2w=c2w, ortho_scale=ortho_scale)
    lattice = generate_samples(plan, rays)
    sigma, color = eval_fields(field, lattice)
    intl = integrate(sigma, color, lattice.dt, lattice.mask,
                     plan.t_near, plan.t_far)
    planes = compose(
        rays.pixel_ids, intl.radiance, intl.transmittance, intl.opacity,
        intl.depth, plan.width, plan.height, plan.t_far,
        unique_pixels=unique_pixels)
    return RenderOutputs(
        rays=rays, lattice=lattice, sigma=sigma, color=color,
        intl=intl, planes=planes)


def render_image(plan: Plan, field, **kwargs) -> jnp.ndarray:
    """(H, W, 3) radiance image - the common training target."""
    return render(plan, field, **kwargs).planes.image
