"""Grid-fit wall-clock benchmark: 64^3 multi-view Adam fit to target PSNR.

The BASELINE.json training-loop metric ("64^3 grid fit wall-clock to PSNR
35"). Renders V ground-truth views from a procedural volume, re-initializes
the grid, and fits sigma+color with Adam until the target PSNR (or the step
cap). Prints one JSON line.

Usage: python tools/fit_benchmark.py [--views 8] [--res 96] [--psnr 35]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import math
import sys
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=8)
    parser.add_argument("--res", type=int, default=96)
    parser.add_argument("--grid", type=int, default=64)
    parser.add_argument("--psnr", type=float, default=35.0)
    parser.add_argument("--max-steps", type=int, default=2000)
    parser.add_argument("--lr", type=float, default=5e-2)
    parser.add_argument("--sync-every", type=int, default=32)
    parser.add_argument("--mode", default=None,
                        choices=(None, "tiled", "windowed", "plain"),
                        help="schedule mode override (default: auto)")
    args = parser.parse_args()

    import numpy as np
    import jax

    # Persistent compile cache: remote TPU compiles take tens of seconds
    # cold and would dominate the 31-step wall clock; a warm cache makes
    # the metric measure the training loop, not the compiler.
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from dvren_tpu import (
        CameraConfig, DenseGridConfig, DenseGridField, Plan, PlanConfig,
        SamplingConfig,
    )
    from dvren_tpu.opt.fit import FitConfig, fit_dense_grid, render_views

    g = args.grid
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, g)] * 3), indexing="ij")
    r2 = (xs - 0.5) ** 2 + (ys - 0.5) ** 2 + (zs - 0.45) ** 2
    sigma = (10.0 * np.exp(-r2 / 0.06)).astype(np.float32)
    color = np.stack([xs, ys, 1 - zs], axis=-1).astype(np.float32)
    truth = DenseGridField.create(DenseGridConfig(
        resolution=(g, g, g), sigma=sigma.reshape(-1),
        color=color.reshape(-1)))

    w = h = args.res
    plan = Plan.create(PlanConfig(
        width=w, height=h, t_near=0.2, t_far=2.2,
        camera=CameraConfig(
            k=(w * 1.2, 0, w / 2, 0, w * 1.2, h / 2, 0, 0, 1)),
        sampling=SamplingConfig(dt=2.0 / 96, max_steps=96)))

    cams = []
    for i in range(args.views):
        ang = 2 * math.pi * i / args.views
        # orbiting translations (rotation fixed: translation-only orbit keeps
        # the volume in frame for this synthetic benchmark)
        cams.append(CameraConfig(c2w=(
            1, 0, 0, 0.5 + 0.25 * math.sin(ang),
            0, 1, 0, 0.5 + 0.15 * math.cos(ang),
            0, 0, 1, -1.0)))

    targets = np.asarray(render_views(plan, truth, cams))

    init = truth.with_params(
        jnp.full_like(truth.sigma, 0.5), jnp.full_like(truth.color, 0.5))
    result = fit_dense_grid(
        plan, init, cams, targets,
        FitConfig(learning_rate=args.lr, steps=args.max_steps,
                  target_psnr=args.psnr, log_every=100,
                  sync_every=args.sync_every),
        mode=args.mode)

    out = {
        "metric": "grid_fit_s_to_psnr",
        "value": round(result.wall_clock_s, 2),
        "unit": "s",
        "target_psnr": args.psnr,
        "reached": result.reached_target,
        "final_psnr": round(result.psnr_history[-1], 2),
        "steps": result.steps_run,
        # The first step includes the jit compile / executable cache load
        # (tens of seconds over the remote-compile tunnel); steady_step_ms
        # is the actual training rate - itself dominated by the tunnel's
        # ~36 ms/dispatch on this harness, not the chip.
        "schedule_build_s": round(result.schedule_build_s, 2),
        "first_step_s": round(result.first_step_s, 2),
        "steady_step_ms": round(result.steady_step_ms, 1),
        "sync_every": args.sync_every,
        "mode": result.mode,
        "device": str(jax.devices()[0]),
        "config": f"{g}^3 grid, {args.views} views @ {w}x{h}",
    }
    print(json.dumps(out))
    return 0 if result.reached_target else 1


if __name__ == "__main__":
    sys.exit(main())
