"""Animation benchmark: production-scale moving-field / moving-camera.

The reference's animation workload renders 120 time-evolving frames with
a FIXED camera and a per-frame FIELD change
(/root/reference/tests/render/test_smoke_animation.cpp:211,305-331 - its
smoke plume evolves, the camera does not). On the tiled path the schedule
depends only on (plan, camera, field bbox/resolution), so the whole
sweep replays ONE schedule with zero capture cost - phase (a).

Phase (b) measures the per-frame cost of a MOVING camera: schedule
rebuild + upload + render for both the tiled and the windowed paths (the
capture-specialization model's worst case; VERDICT r3 missing #3).

Usage: python tools/animation_bench.py [--frames 120] [--res 512]
        [--cam-frames 6]
Prints one JSON line -> ANIM_rNN.json material.
"""

from __future__ import annotations

import argparse
import json
import math
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--cam-frames", type=int, default=6)
    p.add_argument("--k", type=int, default=8,
                   help="frames per dispatch for phase (a)")
    args = p.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from dvren_tpu import (CameraConfig, DenseGridConfig, DenseGridField,
                           Plan, PlanConfig, SamplingConfig, SamplingMode)
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled
    from dvren_tpu.render.windowed import (build_schedule,
                                           render_windowed_traced)
    from dvren_tpu.utils.timing import time_compiled

    def log(m):
        print(f"[anim] {m}", file=_sys.stderr, flush=True)

    g = args.grid
    w = h = args.res
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, g)] * 3), indexing="ij")
    base_sigma = (12.0 * np.exp(
        -((xs - 0.5) ** 2 + (ys - 0.5) ** 2 + (zs - 0.45) ** 2) / 0.05)
    ).astype(np.float32)
    color = np.stack([xs, ys, 1 - zs], axis=-1).astype(np.float32)
    field = DenseGridField.create(DenseGridConfig(
        resolution=(g,) * 3, sigma=base_sigma.reshape(-1),
        color=color.reshape(-1)))

    def plan_for(tx, ty):
        return Plan.create(PlanConfig(
            width=w, height=h, t_near=0.2, t_far=2.2, seed=3,
            camera=CameraConfig(
                k=(w * 1.2, 0, w / 2, 0, w * 1.2, h / 2, 0, 0, 1),
                c2w=(1, 0, 0, tx, 0, 1, 0, ty, 0, 0, 1, -1.0)),
            sampling=SamplingConfig(dt=2.0 / args.steps,
                                    max_steps=args.steps,
                                    mode=SamplingMode.STRATIFIED)))

    plan = plan_for(0.5, 0.5)
    jitter = plan_jitter_table(plan)

    # ---------------- phase (a): fixed camera, evolving field ----------
    t0 = time.perf_counter()
    sched = build_tiled_schedule(plan, field, jitter=jitter)
    build_s = time.perf_counter() - t0
    log(f"fixed-cam schedule build+upload {build_s:.2f}s "
        f"(fallback {sched.fallback_rays})")

    K = args.k

    def frames_fn(phases, sched):
        def body(c, ph):
            # per-frame field evolution: a phase-shifted density pulse
            # (cheap on-device update standing in for a sim step)
            f = field.with_params(field.sigma * (0.9 + 0.2 * ph),
                                  field.color)
            img = render_tiled(plan, f, sched).image
            return c, img[::64, ::64].sum()
        return jax.lax.scan(body, 0.0, phases)[1]

    phases = jnp.linspace(0.0, 1.0, K)
    t0 = time.perf_counter()
    cfn = jax.jit(frames_fn).lower(phases, sched).compile()
    log(f"phase(a) compile {time.perf_counter() - t0:.1f}s")
    s = time_compiled(cfn, [(phases, sched), (phases * 0.97, sched)],
                      iters=max(2, args.frames // K)) / K
    anim_fps = 1.0 / s
    log(f"phase(a) fixed-cam evolving-field: {s * 1e3:.2f} ms/frame -> "
        f"{anim_fps:.1f} frames/s over {args.frames} frames")

    # ---------------- phase (b): moving camera, per-frame rebuild ------
    # The tiled path rides the camera-stable renderer (render/animate.py):
    # pinned uniform shapes + canonical stats = ONE compiled executable
    # for every pose; per-frame cost is host build + upload + dispatch.
    from dvren_tpu.render.animate import MovingCameraRenderer

    mover = MovingCameraRenderer(plan, field)
    log(f"moving-cam pinned uniform_shape {mover.uniform_shape}")
    tiled_cam_s = []
    win_cam_s = []
    win_render = None
    for i in range(args.cam_frames):
        ang = 2 * math.pi * i / max(args.cam_frames, 1)
        p_i = plan_for(0.5 + 0.1 * math.sin(ang), 0.5 + 0.05 * math.cos(ang))
        jit_i = plan_jitter_table(p_i)
        t0 = time.perf_counter()
        img = mover.render(p_i, field).image
        img.block_until_ready()
        float(img[0, 0, 0])  # force fetch (relay acks early)
        tiled_cam_s.append(time.perf_counter() - t0)
        log(f"tiled cam frame {i}: {tiled_cam_s[-1]:.2f}s")

        t0 = time.perf_counter()
        w_i = build_schedule(p_i, field.bbox_min, field.bbox_max,
                             jitter=jit_i)
        if win_render is None:
            win_render = jax.jit(
                lambda f, s, _p=p_i: render_windowed_traced(_p, f, s).image)
        img = win_render(field, w_i)
        img.block_until_ready()
        float(img[0, 0, 0])
        win_cam_s.append(time.perf_counter() - t0)
        log(f"windowed cam frame {i}: {win_cam_s[-1]:.2f}s")

    # drop the first frame of each (compile); report steady means
    t_cam = float(np.mean(tiled_cam_s[1:])) if len(tiled_cam_s) > 1 else 0.0
    w_cam = float(np.mean(win_cam_s[1:])) if len(win_cam_s) > 1 else 0.0

    # ---------------- phase (c): device-built pose schedules ----------
    # The PosedRenderer builds the schedule ON DEVICE inside the render
    # program (render/posed.py): per-frame cost is one dispatch (fused)
    # or two (split); render_sweep amortizes the dispatch over a sweep.
    from dvren_tpu.render.posed import PosedRenderer

    cam_plans = []
    for i in range(max(args.cam_frames, 2)):
        ang = 2 * math.pi * i / max(args.cam_frames, 1)
        cam_plans.append(plan_for(0.5 + 0.1 * math.sin(ang),
                                  0.5 + 0.05 * math.cos(ang)))
    t0 = time.perf_counter()
    posed = PosedRenderer(plan, field, probe_plans=cam_plans[::2])
    log(f"posed init {time.perf_counter() - t0:.1f}s pins "
        f"nc={posed.nc_pin} nb={posed.nb_pin} ez={posed.ez_pin}")
    posed_s = []
    for i, p_i in enumerate(cam_plans):
        t0 = time.perf_counter()
        img = posed.render(p_i, field, check_diag=False).image
        float(np.asarray(img[0, 0, 0]))
        posed_s.append(time.perf_counter() - t0)
        log(f"posed cam frame {i}: {posed_s[-1]:.3f}s")
    posed.check_ok()
    p_cam = float(np.mean(posed_s[1:]))
    p_sweep = 0.0
    if posed._fused:
        from dvren_tpu.utils.timing import time_compiled
        t0 = time.perf_counter()
        imgs, diags = posed.render_sweep(cam_plans, field)
        float(np.asarray(imgs[0, 0, 0, 0]))
        log(f"posed sweep compile {time.perf_counter() - t0:.1f}s")
        ks = [np.stack([np.asarray(posed._cam_arrays(q)[0])
                        for q in pp])
              for pp in (cam_plans, cam_plans[::-1])]
        c2 = [np.stack([np.asarray(posed._cam_arrays(q)[1])
                        for q in pp])
              for pp in (cam_plans, cam_plans[::-1])]
        p_sweep = time_compiled(
            posed._sweep_fn,
            [(field.sigma, field.color, ks[0], c2[0], posed._consts),
             (field.sigma, field.color, ks[1], c2[1], posed._consts)],
            iters=3) / len(cam_plans)
        log(f"posed sweep: {p_sweep*1e3:.1f} ms/frame amortized")

    out = {
        "metric": "animation_frames_per_s_512",
        "moving_cam_compiles": mover.cache_size(),
        "value": round(anim_fps, 2),
        "unit": "frames/s",
        "fixed_cam_ms_per_frame": round(s * 1e3, 2),
        "fixed_cam_schedule_build_s": round(build_s, 2),
        "moving_cam_tiled_s_per_frame": round(t_cam, 2),
        "moving_cam_windowed_s_per_frame": round(w_cam, 2),
        "moving_cam_posed_s_per_frame": round(p_cam, 4),
        "moving_cam_posed_sweep_s_per_frame": round(p_sweep, 4),
        "posed_pins": [posed.nc_pin, posed.nb_pin, posed.ez_pin],
        "frames": args.frames,
        "cam_frames": args.cam_frames,
        "config": f"{w}x{h}, {g}^3 grid, {args.steps} steps",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    _sys.exit(main())
