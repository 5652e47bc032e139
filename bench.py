"""Benchmark: fused forward + fwd/bwd throughput at 512^2 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Primary metric: forward Mrays/s at 512^2, 64^3 grid, 128 steps/ray,
stratified sampling with early termination (the BASELINE.json headline
config; north star >= 1 Grays/s forward, so vs_baseline = value / 1000).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _scene(width, height, grid_n, max_steps):
    from dvren_tpu import (
        CameraConfig, DenseGridConfig, DenseGridField, Plan, PlanConfig,
        SamplingConfig, SamplingMode,
    )

    zs, ys, xs = np.meshgrid(
        np.linspace(0, 1, grid_n), np.linspace(0, 1, grid_n),
        np.linspace(0, 1, grid_n), indexing="ij")
    r2 = (xs - 0.5) ** 2 + (ys - 0.5) ** 2 + (zs - 0.45) ** 2
    sigma = (12.0 * np.exp(-r2 / 0.05)).astype(np.float32)
    color = np.stack([xs, ys, 1.0 - zs], axis=-1).astype(np.float32)

    plan = Plan.create(PlanConfig(
        width=width, height=height, t_near=0.2, t_far=2.2, seed=3,
        camera=CameraConfig(
            k=(width * 1.2, 0.0, width / 2, 0.0, width * 1.2, height / 2,
               0.0, 0.0, 1.0),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=2.0 / max_steps, max_steps=max_steps,
                                mode=SamplingMode.STRATIFIED)))
    field = DenseGridField.create(DenseGridConfig(
        resolution=(grid_n,) * 3, sigma=sigma.reshape(-1),
        color=color.reshape(-1)))
    return plan, field


def _time_compiled(fn, args, iters, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from dvren_tpu.render.pipeline import render

    width = height = 512
    max_steps = 128
    plan, field = _scene(width, height, 64, max_steps)
    n_rays = plan.ray_count

    @jax.jit
    def forward(field):
        out = render(plan, field)
        return out.planes.image

    fwd = forward.lower(field).compile()
    fwd_s = _time_compiled(fwd, (field,), iters=10)
    fwd_mrays = n_rays / fwd_s / 1e6

    target = jnp.zeros((height, width, 3), jnp.float32)

    def loss_fn(params):
        f = field.with_params(*params)
        img = render(plan, f).planes.image
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    params = (field.sigma, field.color)
    fb = grad_fn.lower(params).compile()
    fb_s = _time_compiled(fb, (params,), iters=5)
    fb_mrays = n_rays / fb_s / 1e6

    samples = n_rays * max_steps
    result = {
        "metric": "fwd_Mrays_per_s_512",
        "value": round(fwd_mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(fwd_mrays / 1000.0, 4),
        "extra": {
            "fwdbwd_Mrays_per_s": round(fb_mrays, 2),
            "fwd_Msamples_per_s": round(samples / fwd_s / 1e6, 1),
            "fwd_ms": round(fwd_s * 1e3, 3),
            "fwdbwd_ms": round(fb_s * 1e3, 3),
            "config": "512x512, 64^3 grid, 128 steps, stratified",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
