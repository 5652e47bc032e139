"""Multi-chip rendering and training: SPMD over a device mesh.

New capability beyond the reference (which is single-process, single-GPU;
SURVEY.md section 2.4). Two complementary decompositions:

1. **Ray data parallelism** (:func:`render_sharded`): the flat ray axis is
   sharded across the mesh; the field is replicated. Ray generation,
   sampling, field gathers and integration are embarrassingly parallel per
   shard; only the final pixel scatter crosses shards, where GSPMD inserts
   the collective. This is how one frame scales across chips.

2. **View data parallelism** (:func:`make_dp_train_step`): each device
   renders its own batch of views against replicated field parameters and
   gradients are combined with an explicit ``psum`` over ICI inside
   ``shard_map``. This is how grid fitting scales across chips.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 top-level API; the experimental home is deprecated
    from jax import shard_map
    _NO_REP_CHECK = {"check_vma": False}
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
    _NO_REP_CHECK = {"check_rep": False}

from dvren_tpu.core.plan import CameraConfig, Plan
from dvren_tpu.render.pipeline import render


def render_sharded(plan: Plan, field, mesh: Mesh, axis: str | None = None):
    """Render one frame with the ray axis sharded across ``mesh``.

    Returns the (replicated) ImagePlanes. The sharding constraint on the ray
    lattice propagates through sampling/field-eval/integration; the compose
    scatter is the single cross-shard reduction.
    """
    axis = axis or mesh.axis_names[0]
    ray_sharding = NamedSharding(mesh, P(axis))

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def run(field):
        from dvren_tpu.ops.raygen import generate_rays
        from dvren_tpu.ops.sampling import generate_samples
        from dvren_tpu.ops.integrate import integrate
        from dvren_tpu.ops.compose import compose
        from dvren_tpu.render.pipeline import eval_fields
        from dvren_tpu.ops.raygen import Rays

        rays = generate_rays(plan)
        rays = Rays(
            origins=jax.lax.with_sharding_constraint(rays.origins, ray_sharding),
            directions=jax.lax.with_sharding_constraint(
                rays.directions, ray_sharding),
            t_near=jax.lax.with_sharding_constraint(rays.t_near, ray_sharding),
            t_far=jax.lax.with_sharding_constraint(rays.t_far, ray_sharding),
            pixel_ids=jax.lax.with_sharding_constraint(
                rays.pixel_ids, ray_sharding),
        )
        lattice = generate_samples(plan, rays)
        sigma, color = eval_fields(field, lattice)
        intl = integrate(sigma, color, lattice.dt, lattice.mask,
                         plan.t_near, plan.t_far)
        return compose(rays.pixel_ids, intl.radiance, intl.transmittance,
                       intl.opacity, intl.depth, plan.width, plan.height,
                       plan.t_far)

    with mesh:
        return run(field)


def make_dp_train_step(plan: Plan, field_template, optimizer,
                       mesh: Mesh, axis: str | None = None):
    """Build a view-data-parallel jitted train step over ``mesh``.

    The step signature is ``(params, opt_state, c2ws, targets) ->
    (params, opt_state, loss)`` where
      - ``params`` is the trainable tuple (replicated),
      - ``c2ws`` is (V, 3, 4) camera poses, V divisible by mesh size,
      - ``targets`` is (V, H, W, 3) ground truth, sharded with the poses.

    Inside the per-device body each chip renders its local views and the
    gradient is combined with ``jax.lax.pmean`` - the explicit ICI
    collective replacing the reference's nonexistent comm backend.
    """
    axis = axis or mesh.axis_names[0]

    def local_loss(params, c2ws_local, targets_local):
        field = field_template.with_params(*params)

        def one(c2w):
            return render(plan, field, c2w=c2w).planes.image

        pred = jax.vmap(one)(c2ws_local)
        return jnp.mean((pred - targets_local) ** 2)

    def step_body(params, opt_state, c2ws_local, targets_local):
        loss, grads = jax.value_and_grad(local_loss)(
            params, c2ws_local, targets_local)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = shard_map(
        step_body, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        **_NO_REP_CHECK,
    )
    return jax.jit(sharded)


def fit_dense_grid_dp(plan: Plan, field, cameras: Sequence[CameraConfig],
                      targets, mesh: Mesh, learning_rate: float = 5e-2,
                      steps: int = 100):
    """Multi-device variant of :func:`dvren_tpu.opt.fit.fit_dense_grid`."""
    import numpy as np

    optimizer = optax.adam(learning_rate)
    params = (field.sigma, field.color)
    opt_state = optimizer.init(params)
    step = make_dp_train_step(plan, field, optimizer, mesh)

    c2ws = jnp.stack([jnp.asarray(c.c2w, jnp.float32).reshape(3, 4)
                      for c in cameras])
    targets = jnp.asarray(targets, jnp.float32)
    n = mesh.devices.size
    if c2ws.shape[0] % n != 0:
        raise ValueError(
            f"view count {c2ws.shape[0]} not divisible by mesh size {n}")

    losses = []
    with mesh:
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, c2ws, targets)
            params = (jnp.maximum(params[0], 0.0),
                      jnp.clip(params[1], 0.0, 1.0))
            losses.append(float(loss))
    return field.with_params(*params), np.asarray(losses)
