"""Fine-grid fused-path benchmark: 8x8 sub-tiled kernel vs windowed path.

VERDICT r2 missing #1 / next #4: the reference's fused pipeline covers its
SDF flagship (800^2 rays, 160^3 shell, test_sdf_sphere.cpp:130-346) while
round 2's 16px tile tables demoted exactly that scene class to the
windowed path. The 8px sub-tiled schedules (round 3) hold per-sub-tile
slot tables; this tool measures both paths on:
  - 512^2 / 128^3 dense blob (58% of 16px tiles overflowed);
  - 800^2 / 160^3 SDF shell with occupancy trimming (91% overflowed).

Prints one JSON line. Usage: python tools/finegrid_bench.py
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from bench import _time_compiled
    from dvren_tpu import (
        CameraConfig, DenseGridConfig, DenseGridField, Plan, PlanConfig,
        SamplingConfig, SamplingMode,
    )
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled
    from dvren_tpu.render.windowed import (build_schedule,
                                           render_windowed_traced)

    def log(msg):
        print(f"[finegrid] {msg}", file=_sys.stderr, flush=True)

    def scene(width, grid_n, steps, sdf=False):
        n = grid_n
        zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, n)] * 3),
                                 indexing="ij")
        if sdf:
            r = np.sqrt((xs - .5) ** 2 + (ys - .5) ** 2 + (zs - .5) ** 2)
            sigma = np.where(np.abs(r - 0.33) < 0.05, 25.0,
                             0.0).astype(np.float32)
        else:
            r2 = (xs - .5) ** 2 + (ys - .5) ** 2 + (zs - .45) ** 2
            sigma = (12 * np.exp(-r2 / .05)).astype(np.float32)
        color = np.stack([xs, ys, 1 - zs], -1).astype(np.float32)
        plan = Plan.create(PlanConfig(
            width=width, height=width, t_near=0.2, t_far=2.2, seed=3,
            camera=CameraConfig(
                k=(width * 1.2, 0, width / 2, 0, width * 1.2, width / 2,
                   0, 0, 1),
                c2w=(1, 0, 0, .5, 0, 1, 0, .5, 0, 0, 1, -1.0)),
            sampling=SamplingConfig(dt=2.0 / steps, max_steps=steps,
                                    mode=SamplingMode.STRATIFIED)))
        f = DenseGridField.create(DenseGridConfig(
            resolution=(n,) * 3, sigma=sigma.reshape(-1),
            color=color.reshape(-1)))
        return plan, f

    def run_case(name, width, grid_n, steps, sdf, occupancy, kf=4):
        plan, field = scene(width, grid_n, steps, sdf=sdf)
        n_rays = plan.ray_count
        jitter = plan_jitter_table(plan)
        t0 = time.perf_counter()
        sched = build_tiled_schedule(plan, field, jitter=jitter,
                                     occupancy=occupancy, tile_px=8)
        log(f"{name}: 8px schedule {time.perf_counter() - t0:.1f}s, "
            f"fallback={sched.fallback_rays}/{sched.total_rays}, "
            f"{len(sched.groups)} groups, "
            f"{sched.tiled_samples / 1e6:.1f}M samples")

        scales = jnp.linspace(1.0, 1.01, kf)

        def frames(scales, sched):
            def one(c, s):
                f = field.with_params(field.sigma * s, field.color)
                img = render_tiled(plan, f, sched).image
                return c, img[::64, ::64].sum()
            return jax.lax.scan(one, 0.0, scales)[1]

        t0 = time.perf_counter()
        fwd = jax.jit(frames).lower(scales, sched).compile()
        log(f"{name}: tiled compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(fwd, [(scales, sched),
                                 (scales * 1.003, sched)], iters=3)
        tiled_ms = s / kf * 1e3
        tiled_mrays = n_rays / (s / kf) / 1e6
        log(f"{name}: tiled fwd {tiled_ms:.1f} ms -> "
            f"{tiled_mrays:.2f} Mrays/s")

        # windowed comparison (the round-2 fate of these scenes)
        t0 = time.perf_counter()
        wsched = build_schedule(plan, field.bbox_min, field.bbox_max,
                                jitter=jitter)
        log(f"{name}: window schedule {time.perf_counter() - t0:.1f}s")

        def wframes(scales, wsched):
            def one(c, s):
                f = field.with_params(field.sigma * s, field.color)
                img = render_windowed_traced(plan, f, wsched).image
                return c, img[::64, ::64].sum()
            return jax.lax.scan(one, 0.0, scales)[1]

        t0 = time.perf_counter()
        wfwd = jax.jit(wframes).lower(scales, wsched).compile()
        log(f"{name}: windowed compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(wfwd, [(scales, wsched),
                                  (scales * 1.003, wsched)], iters=3)
        win_ms = s / kf * 1e3
        win_mrays = n_rays / (s / kf) / 1e6
        log(f"{name}: windowed fwd {win_ms:.1f} ms -> "
            f"{win_mrays:.2f} Mrays/s ({tiled_mrays / win_mrays:.2f}x "
            f"tiled speedup)")

        # parity
        a = np.asarray(jax.jit(
            lambda f, s_: render_tiled(plan, f, s_).image)(field, sched))
        b = np.asarray(jax.jit(
            lambda f, s_: render_windowed_traced(plan, f, s_).image
        )(field, wsched))
        par = float(np.abs(a - b).max())
        log(f"{name}: tiled-vs-windowed maxdiff {par:.3e}")
        return dict(tiled_Mrays_per_s=round(tiled_mrays, 2),
                    windowed_Mrays_per_s=round(win_mrays, 2),
                    speedup=round(tiled_mrays / win_mrays, 2),
                    tiled_ms=round(tiled_ms, 2),
                    windowed_ms=round(win_ms, 2),
                    fallback_rays=sched.fallback_rays,
                    maxdiff=par)

    out = {
        "fine_128cube_512sq": run_case("512^2/128^3", 512, 128, 256,
                                       sdf=False, occupancy=False),
        "sdf_160cube_800sq_occ": run_case("800^2/160^3 SDF", 800, 160,
                                          256, sdf=True, occupancy=True),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
