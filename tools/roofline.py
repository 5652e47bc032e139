"""Measured-vs-floor roofline for the fused-tile forward (VERDICT r3
weak #1: publish the floor for the round-3+ kernel).

Times the production forward's phases on the real chip with the
K-frames-per-dispatch methodology (bench.py) and compares each against
the analytic DMA/gather floor (dvren_tpu/utils/roofline.py, machine
constants from tools/hbm_probe.py and tools/gather_probe.py). Phases
are measured by chained prefixes of render_tiled_phases (a phase's
time = prefix(n) - prefix(n-1)); the floor assumes phases serialize
(each consumes the previous one's output).

Usage: python tools/roofline.py [--width 512] [--grid 64] [--steps 128]
                                [--cell-scale 1|2] [--pitch 1|2]
Writes ROOFLINE_r05.json next to the repo root and prints it.
"""
from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--kf", type=int, default=8)
    ap.add_argument("--cell-scale", type=int, default=1, choices=(1, 2))
    ap.add_argument("--pitch", type=int, default=1, choices=(1, 2))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import _scene, _time_compiled
    from dvren_tpu.ops import grid as grid_ops
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import (build_tiled_schedule, render_tiled,
                                        render_tiled_phases)
    from dvren_tpu.utils import roofline as rf

    def log(m):
        print(f"[roofline] {m}", file=_sys.stderr, flush=True)

    plan, field = _scene(args.width, args.width, args.grid, args.steps)
    n_rays = plan.ray_count
    sched = build_tiled_schedule(plan, field, jitter=plan_jitter_table(plan),
                                 cell_scale=args.cell_scale,
                                 pitch=args.pitch)
    tables_fn, kernel_fn, compose_fn = render_tiled_phases(plan, sched)
    streams = rf.forward_streams(sched)
    floors = rf.floor_ms(streams)
    log(f"device={jax.devices()[0]} rays={n_rays} "
        f"groups={[(g.n_chunks, g.n_tiles, g.banks) for g in sched.groups]}")
    log("analytic streams: " + json.dumps(streams["phases"]))

    KF = args.kf
    scales = jnp.linspace(1.0, 1.01, KF)

    def timed(name, body):
        def frames(scales, sched):
            def one(carry, s):
                f = field.with_params(field.sigma * s, field.color)
                return carry, body(f)
            return jax.lax.scan(one, 0.0, scales)[1]
        t0 = time.perf_counter()
        fn = jax.jit(frames).lower(scales, sched).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(fn, [(scales, sched), (scales * 1.003, sched)],
                           iters=4) / KF
        log(f"{name}: {s * 1e3:.3f} ms/frame")
        return s * 1e3

    # prefix 0: u16 packed-table build only
    t_build = timed("build_t16", lambda f: grid_ops.build_packed_table16(
        f.sigma, f.color).reshape(-1)[::65537].astype(jnp.float32).sum())
    # prefix 1: + planned bank gather (tables_fn = build + gather)
    t_tables = timed("tables (build+gather)", lambda f: sum(
        t.reshape(-1)[::8191].sum() for t in tables_fn(f)))
    # prefix 2: + tile kernel
    t_tk = timed("tables+kernel", lambda f: sum(
        r.reshape(-1)[::513].sum() for r in kernel_fn(tables_fn(f))))
    # prefix 3: full forward (adds compose + windowed fallback)
    t_full = timed("full forward", lambda f: render_tiled(
        plan, f, sched).image[::64, ::64].sum())

    measured = {
        "build_t16": t_build,
        "bank_gather": t_tables - t_build,
        "kernel": t_tk - t_tables,
        "compose": t_full - t_tk,
        "total": t_full,
    }
    result = {
        "metric": "fwd_roofline_512",
        "config": f"{args.width}^2, {args.grid}^3, {args.steps} steps, "
                  f"cell_scale={args.cell_scale}, pitch={args.pitch}",
        "cell_scale": args.cell_scale,
        "pitch": args.pitch,
        "bw_GBps": rf.HBM_GBPS,
        "u16_starts_per_s": rf.U16_STARTS_PER_S,
        "streams": {k: {"MB": round(v["bytes"] / 1e6, 2),
                        "Mstarts": round(v["starts"] / 1e6, 3)}
                    for k, v in streams["phases"].items()},
        "floor_ms": {k: round(v, 3) for k, v in floors.items()},
        "measured_ms": {k: round(v, 3) for k, v in measured.items()},
        "measured_over_floor": {
            k: round(measured[k] / floors[k], 2)
            for k in floors if floors[k] > 0},
        "fwd_Mrays_per_s": round(n_rays / t_full / 1e3, 2),
        "device": str(jax.devices()[0]),
    }
    out_path = args.out or _os.path.join(root, "ROOFLINE_r05.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
