"""Hash-MLP TPU session benchmark: the FUSED fast path (round 4).

Measures the slot-free fused hash-MLP tile kernel (ops/hash_tiles.py)
at the 512^2 headline frame, the legacy streamed route for comparison,
and a multi-view Adam fit through the fused kernel to a STATED PSNR
target (fit_hash_mlp). The reference's hash-MLP device kernels were
built but never wired (hash_mlp_cuda.cu:12-326) and it has no hash-MLP
gradients at all - every number here is beyond-reference capability.

Prints one JSON line.
Usage: python tools/hashmlp_bench.py [--width 512] [--steps 128]
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
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--fit-steps", type=int, default=400)
    ap.add_argument("--fit-width", type=int, default=96)
    ap.add_argument("--fit-views", type=int, default=4)
    ap.add_argument("--fit-psnr", type=float, default=30.0)
    ap.add_argument("--skip-streamed", action="store_true")
    args = ap.parse_args()

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
        CameraConfig, HashMLPField, Plan, PlanConfig, SamplingConfig,
        SamplingMode,
    )
    from dvren_tpu.ops.hashmlp import HashMLPSpec
    from dvren_tpu.opt.fit import FitConfig, fit_hash_mlp, view_plans
    from dvren_tpu.render.hash_tiled import (build_hash_schedule,
                                             render_hash_tiled)
    from dvren_tpu.render.pipeline import plan_jitter_table, render_streamed

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
    log(f"device={jax.devices()[0]} rays={n_rays} steps={args.steps}")

    # ------------------------------------------------ fused tile forward
    t0 = time.perf_counter()
    sched = build_hash_schedule(plan)
    sched_s = time.perf_counter() - t0
    log(f"hash schedule build {sched_s:.2f}s "
        f"({sched.n_tiles} tiles x {sched.n_chunks} chunks)")

    KF = 4
    scales = jnp.linspace(1.0, 1.01, KF)

    def frames_tiled(scales, params, sched):
        def one(carry, s):
            p = jax.tree.map(lambda x: x * s, params)
            img = render_hash_tiled(plan, field.with_params(p), sched).image
            return carry, img[::64, ::64].sum()
        return jax.lax.scan(one, 0.0, scales)[1]

    t0 = time.perf_counter()
    fwd = jax.jit(frames_tiled).lower(
        scales, field.params, sched).compile()
    log(f"fused fwd compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(fwd, [(scales, field.params, sched),
                             (scales * 1.003, field.params, sched)],
                       iters=3)
    fwd_ms = s / KF * 1e3
    fwd_mrays = n_rays / (s / KF) / 1e6
    log(f"fused fwd {fwd_ms:.2f} ms/frame -> {fwd_mrays:.2f} Mrays/s")

    # ------------------------------------------------ streamed reference
    stream_mrays = None
    if not args.skip_streamed:
        jitter = jnp.asarray(plan_jitter_table(plan))

        def frames_streamed(scales, params):
            def one(carry, sc):
                p = jax.tree.map(lambda x: x * sc, params)
                img = render_streamed(plan, field.with_params(p),
                                      jitter=jitter).image
                return carry, img[::64, ::64].sum()
            return jax.lax.scan(one, 0.0, scales)[1]

        t0 = time.perf_counter()
        fwd_st = jax.jit(frames_streamed).lower(
            scales, field.params).compile()
        log(f"streamed fwd compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(fwd_st, [(scales, field.params),
                                    (scales * 1.003, field.params)],
                           iters=3)
        stream_mrays = n_rays / (s / KF) / 1e6
        log(f"streamed fwd {s / KF * 1e3:.1f} ms/frame -> "
            f"{stream_mrays:.2f} Mrays/s")

    # ------------------------- NGP-scale grid path (round 5, T=4096)
    # Host-resolved multi-level tables through the dense bank machinery
    # (ops/hash_grid.py). The spec this path exists for: realistic
    # table sizes the in-kernel path cannot hold (T >= 2^12).
    from dvren_tpu.render.hash_tiled import (build_hash_grid_schedule,
                                             render_hash_grid_tiled)

    gspec = HashMLPSpec(n_levels=4, features_per_level=2,
                        table_size=4096, hidden_dim=8,
                        base_resolution=4.0, finest_resolution=32.0,
                        resolutions=(4, 8, 16, 32))
    gfield = HashMLPField.init_random(jax.random.key(1), spec=gspec)
    grid_fwd_mrays = grid_stream_mrays = None
    grid_fb_mrays = None
    try:
        t0 = time.perf_counter()
        gsched = build_hash_grid_schedule(
            plan, gfield, jitter=plan_jitter_table(plan))
        gsched_s = time.perf_counter() - t0
        log(f"grid-path schedule build {gsched_s:.2f}s "
            f"(groups {[(g.n_chunks, g.n_tiles, g.banks) for g in gsched.groups]})")

        def frames_grid(scales, params, sched):
            def one(carry, s):
                p = jax.tree.map(lambda x: x * s, params)
                img = render_hash_grid_tiled(
                    plan, gfield.with_params(p), sched).image
                return carry, img[::64, ::64].sum()
            return jax.lax.scan(one, 0.0, scales)[1]

        t0 = time.perf_counter()
        gfwd = jax.jit(frames_grid).lower(
            scales, gfield.params, gsched).compile()
        log(f"grid-path fwd compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(gfwd, [(scales, gfield.params, gsched),
                                  (scales * 1.003, gfield.params,
                                   gsched)], iters=3)
        grid_fwd_mrays = n_rays / (s / KF) / 1e6
        log(f"grid-path fwd (T=4096) {s / KF * 1e3:.2f} ms/frame -> "
            f"{grid_fwd_mrays:.2f} Mrays/s")

        # fwd+bwd train-step rate at the same spec
        gtarget = jnp.zeros((w, w, 3), jnp.float32)

        def gloss(params, sched):
            img = render_hash_grid_tiled(
                plan, gfield.with_params(params), sched).image
            return jnp.mean((img - gtarget) ** 2)

        def gsteps(params, sched):
            def body(p, _):
                l, g = jax.value_and_grad(gloss)(p, sched)
                return jax.tree.map(lambda a, b: a - 1e-3 * b, p, g), l
            return jax.lax.scan(body, params, None, length=3)

        t0 = time.perf_counter()
        gfb = jax.jit(gsteps).lower(gfield.params, gsched).compile()
        log(f"grid-path fwd+bwd compile {time.perf_counter() - t0:.1f}s")
        pb = jax.tree.map(lambda x: x * 1.0001, gfield.params)
        s = _time_compiled(gfb, [(gfield.params, gsched), (pb, gsched)],
                           iters=2) / 3
        grid_fb_mrays = n_rays / s / 1e6
        log(f"grid-path fwd+bwd {s * 1e3:.2f} ms/step -> "
            f"{grid_fb_mrays:.2f} Mrays/s")

        # streamed reference at the SAME T=4096 spec
        if not args.skip_streamed:
            jitter = jnp.asarray(plan_jitter_table(plan))

            def frames_gs(scales, params):
                def one(carry, sc):
                    p = jax.tree.map(lambda x: x * sc, params)
                    img = render_streamed(plan, gfield.with_params(p),
                                          jitter=jitter).image
                    return carry, img[::64, ::64].sum()
                return jax.lax.scan(one, 0.0, scales)[1]

            gst = jax.jit(frames_gs).lower(scales, gfield.params).compile()
            s = _time_compiled(gst, [(scales, gfield.params),
                                     (scales * 1.003, gfield.params)],
                               iters=3)
            grid_stream_mrays = n_rays / (s / KF) / 1e6
            log(f"streamed fwd at T=4096 {s / KF * 1e3:.1f} ms/frame -> "
                f"{grid_stream_mrays:.2f} Mrays/s")
    except Exception as e:
        log(f"grid path failed: {type(e).__name__}: {e}")

    # ------------------------------------------------ multi-view fit
    fw = args.fit_width
    fplan = Plan.create(PlanConfig(
        width=fw, height=fw, t_near=0.2, t_far=2.2, seed=5,
        camera=CameraConfig(
            k=(fw * 1.2, 0, fw / 2, 0, fw * 1.2, fw / 2, 0, 0, 1),
            c2w=(1, 0, 0, 0.5, 0, 1, 0, 0.5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=2.0 / 64, max_steps=64)))
    # y-axis orbit around the volume center, radius 1.5, look-at
    cams = []
    center = np.array([0.5, 0.5, 0.5], np.float32)
    for v in range(args.fit_views):
        th = 2 * np.pi * v / args.fit_views
        eye = center + 1.5 * np.array(
            [np.sin(th), 0.0, -np.cos(th)], np.float32)
        fwd = (center - eye) / np.linalg.norm(center - eye)
        up_w = np.array([0.0, 1.0, 0.0], np.float32)
        right = np.cross(up_w, fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        r = np.stack([right, up, fwd], axis=1)     # columns
        c2w = np.concatenate([r, eye.reshape(3, 1)], axis=1)
        cams.append(CameraConfig(
            k=fplan.camera.k,
            c2w=tuple(float(x) for x in c2w.reshape(-1))))
    # ground truth: procedural dense blob rendered through the pipeline
    g = 64
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, g)] * 3), indexing="ij")
    r2 = (xs - .5) ** 2 + (ys - .5) ** 2 + (zs - .45) ** 2
    from dvren_tpu import DenseGridConfig, DenseGridField
    from dvren_tpu.render.pipeline import render as _render
    truth = DenseGridField.create(DenseGridConfig(
        resolution=(g,) * 3,
        sigma=(12 * np.exp(-r2 / .05)).reshape(-1),
        color=np.stack([xs, ys, 1 - zs], -1).reshape(-1)))
    fplans = view_plans(fplan, cams)
    tgt = np.stack([np.asarray(jax.jit(
        lambda f, p=pv: _render(p, f).planes.image)(truth))
        for pv in fplans])
    log(f"fit targets ready: {tgt.shape}")

    spec = HashMLPSpec(n_levels=8, table_size=128,
                       base_resolution=2.0, finest_resolution=48.0)
    f0 = HashMLPField.init_random(jax.random.key(3), spec=spec)
    t0 = time.perf_counter()
    res = fit_hash_mlp(fplan, f0, cams, tgt,
                       FitConfig(steps=args.fit_steps, sync_every=25,
                                 target_psnr=args.fit_psnr,
                                 learning_rate=8e-3, log_every=100))
    log(f"fit: {res.steps_run} steps, PSNR "
        f"{res.psnr_history[0]:.1f} -> {res.psnr_history[-1]:.1f} dB, "
        f"target {args.fit_psnr} reached={res.reached_target}, "
        f"wall {res.wall_clock_s:.1f}s (build {res.schedule_build_s:.2f}s,"
        f" first {res.first_step_s:.1f}s, steady "
        f"{res.steady_step_ms:.1f} ms/step)")

    print(json.dumps({
        "hashmlp_fused_fwd_Mrays_per_s_512": round(fwd_mrays, 2),
        "hashmlp_fused_fwd_ms_per_frame": round(fwd_ms, 2),
        "hashmlp_schedule_build_s": round(sched_s, 2),
        "hashmlp_streamed_fwd_Mrays_per_s_512":
            round(stream_mrays, 2) if stream_mrays else None,
        "hashgrid_T4096_fwd_Mrays_per_s_512":
            round(grid_fwd_mrays, 2) if grid_fwd_mrays else None,
        "hashgrid_T4096_fwdbwd_Mrays_per_s_512":
            round(grid_fb_mrays, 2) if grid_fb_mrays else None,
        "hashgrid_T4096_streamed_Mrays_per_s_512":
            round(grid_stream_mrays, 2) if grid_stream_mrays else None,
        "hashgrid_spec": "L=4 F=2 T=4096 ladder 4-8-16-32",
        "hashmlp_fit_psnr_target": args.fit_psnr,
        "hashmlp_fit_reached_target": bool(res.reached_target),
        "hashmlp_fit_psnr_first_last": [
            round(res.psnr_history[0], 2),
            round(res.psnr_history[-1], 2)],
        "hashmlp_fit_steps": res.steps_run,
        "hashmlp_fit_wall_s": round(res.wall_clock_s, 2),
        "hashmlp_fit_steady_step_ms": round(res.steady_step_ms, 2),
        "hashmlp_fit_config": (f"{args.fit_views} views @ {fw}^2, "
                               f"64 steps, L=8 T=128 finest=48"),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
