"""Real-TPU probe of the device-built pose schedule (render/posed.py).

Measures, at the 512^2/64^3/128-step headline config:
  - PosedRenderer init (device probe compile) wall,
  - fused single-dispatch per-frame seconds over an 8-pose orbit,
  - split (build dispatch + render dispatch) per-frame seconds,
  - parity vs the windowed reference at one orbit pose.

Usage: python tools/posed_probe.py [--res 512] [--grid 64] [--steps 128]
        [--mode fused|split|both] [--parity]
One JSON line on stdout; progress on stderr.
"""

from __future__ import annotations

import argparse
import json
import math
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


def lookat(eye, ctr=(0.5, 0.5, 0.5), up=(0, 1, 0)):
    import numpy as np
    eye, ctr, up = (np.array(v, float) for v in (eye, ctr, up))
    f = ctr - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, up)
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    m = np.stack([r, u, f], 1)
    return tuple(np.concatenate([m, eye[:, None]], 1).reshape(-1))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--poses", type=int, default=8)
    p.add_argument("--mode", default="both",
                   choices=("fused", "split", "both"))
    p.add_argument("--parity", action="store_true")
    args = p.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from dvren_tpu import (CameraConfig, DenseGridConfig, DenseGridField,
                           Plan, PlanConfig, SamplingConfig, SamplingMode)
    from dvren_tpu.render.posed import PosedRenderer

    def log(m):
        print(f"[posed] {m}", file=_sys.stderr, flush=True)

    g, w, h, steps = args.grid, args.res, args.res, args.steps
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, g)] * 3), indexing="ij")
    sigma = (12.0 * np.exp(
        -((xs - 0.5) ** 2 + (ys - 0.5) ** 2 + (zs - 0.45) ** 2) / 0.05)
    ).astype(np.float32)
    color = np.stack([xs, ys, 1 - zs], axis=-1).astype(np.float32)
    field = DenseGridField.create(DenseGridConfig(
        resolution=(g,) * 3, sigma=sigma.reshape(-1),
        color=color.reshape(-1)))

    def plan_for(c2w):
        return Plan.create(PlanConfig(
            width=w, height=h, t_near=0.2, t_far=2.2, seed=3,
            camera=CameraConfig(
                k=(w * 1.2, 0, w / 2, 0, w * 1.2, h / 2, 0, 0, 1),
                c2w=c2w),
            sampling=SamplingConfig(dt=2.0 / steps, max_steps=steps,
                                    mode=SamplingMode.STRATIFIED)))

    base = plan_for((1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0))
    poses = [plan_for(lookat((
        0.5 + 1.2 * math.sin(a), 0.7, 0.5 - 1.2 * math.cos(a))))
        for a in np.linspace(0, 2 * math.pi, args.poses, endpoint=False)]

    out = {"metric": "posed_probe", "config":
           f"{w}x{h}, {g}^3, {steps} steps", "poses": args.poses}

    t0 = time.perf_counter()
    modes = ("fused", "split") if args.mode == "both" else (args.mode,)
    pr = PosedRenderer(base, field, fused=(modes[0] == "fused"),
                       probe_plans=poses)
    out["init_s"] = round(time.perf_counter() - t0, 2)
    out["pins"] = [pr.nc_pin, pr.nb_pin, pr.ez_pin]
    log(f"init {out['init_s']}s pins nc={pr.nc_pin} nb={pr.nb_pin} "
        f"ez={pr.ez_pin}")

    for mode in modes:
        pr._fused = (mode == "fused")
        t0 = time.perf_counter()
        img = np.asarray(pr.render(poses[0], field,
                                   check_diag=True).image)
        log(f"{mode} first frame (compile) {time.perf_counter()-t0:.1f}s "
            f"img mean {img.mean():.4f}")
        out[f"{mode}_compile_s"] = round(time.perf_counter() - t0, 1)
        # steady state: cycle DISTINCT poses, fetch one element per call
        times = []
        for i in range(2 * args.poses):
            pl = poses[i % args.poses]
            t0 = time.perf_counter()
            planes = pr.render(pl, field, check_diag=False)
            float(np.asarray(planes.image[0, 0, 0]))
            times.append(time.perf_counter() - t0)
        steady = float(np.mean(times[args.poses:]))
        out[f"{mode}_s_per_frame"] = round(steady, 4)
        log(f"{mode}: {steady*1e3:.1f} ms/frame steady "
            f"({[f'{t:.3f}' for t in times]})")
        pr.check_ok()

    if "fused" in modes and jax.default_backend() == "tpu":
        from dvren_tpu.utils.timing import time_compiled
        pr._fused = True
        t0 = time.perf_counter()
        imgs, diags = pr.render_sweep(poses, field)
        float(np.asarray(imgs[0, 0, 0, 0]))
        log(f"sweep first (compile) {time.perf_counter()-t0:.1f}s")
        sweep_fn = pr._sweep_fn
        ks = [np.stack([np.asarray(pr._cam_arrays(p)[0]) for p in pp])
              for pp in (poses, poses[::-1])]
        c2 = [np.stack([np.asarray(pr._cam_arrays(p)[1]) for p in pp])
              for pp in (poses, poses[::-1])]
        s = time_compiled(
            sweep_fn,
            [(field.sigma, field.color, ks[0], c2[0], pr._consts),
             (field.sigma, field.color, ks[1], c2[1], pr._consts)],
            iters=4) / args.poses
        out["sweep_s_per_frame"] = round(s, 4)
        log(f"sweep: {s*1e3:.1f} ms/frame amortized over {args.poses}")

    if args.parity:
        from dvren_tpu.render.pipeline import plan_jitter_table
        from dvren_tpu.render.windowed import (build_schedule,
                                               render_windowed_traced)
        pl = poses[1]
        img_p = np.asarray(pr.render(pl, field).image)
        ws = build_schedule(pl, field.bbox_min, field.bbox_max,
                            jitter=plan_jitter_table(pl))
        img_w = np.asarray(jax.jit(
            lambda f, s: render_windowed_traced(pl, f, s).image)(
            field, ws))
        d = np.abs(img_p - img_w)
        out["parity_max"] = float(d.max())
        out["parity_mean"] = float(d.mean())
        log(f"parity vs windowed: max {d.max():.2e} mean {d.mean():.2e}")

    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    _sys.exit(main())
