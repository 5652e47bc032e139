"""Phase breakdown of the fused-tile forward at the headline config.

Times each phase of render_tiled in isolation with the K-frames-per-dispatch
methodology (bench.py): packed-table build, per-slot row gather, Pallas tile
kernel (pre-gathered tables), and the full forward. Run on the TPU; one
relay-registered process at a time.

Usage: python tools/tiled_profile.py [--width 512] [--grid 64] [--steps 128]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--kf", type=int, default=8)
    ap.add_argument("--pitch", type=int, default=1,
                    help="table gather pitch (2 = cell-pair rows, half the starts)")
    ap.add_argument("--parity", action="store_true",
                    help="also check kernel vs jnp-consumer vs windowed")
    ap.add_argument("--bwd", action="store_true",
                    help="also attribute the backward (train-step) phases")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from bench import _scene, _time_compiled
    from dvren_tpu.ops import grid as grid_ops
    from dvren_tpu.ops import fused_tiles
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import (
        build_tiled_schedule, render_tiled, _group_tables,
        _gather_bank_tables, _schedule_table)

    def log(msg):
        print(f"[prof] {msg}", file=_sys.stderr, flush=True)

    plan, field = _scene(args.width, args.width, args.grid, args.steps)
    n_rays = plan.ray_count
    jitter = plan_jitter_table(plan)
    sched = build_tiled_schedule(plan, field, jitter=jitter,
                                 pitch=args.pitch)

    slots = sum(g.hostmap.size for g in sched.groups)
    chunks = sum(g.n_tiles * g.n_chunks for g in sched.groups)
    log(f"device={jax.devices()[0]} rays={n_rays} "
        f"groups={len(sched.groups)} "
        f"group shapes={[(g.n_chunks, g.n_tiles, g.banks) for g in sched.groups]}")
    log(f"slots={slots/1e6:.2f}M chunks={chunks} "
        f"tiled_samples={sched.tiled_samples/1e6:.1f}M "
        f"fallback_rays={sched.fallback_rays}")

    KF = args.kf
    scales = jnp.linspace(1.0, 1.01, KF)

    def timed(name, body):
        """body(field_scaled, sched) -> small array; scanned over KF scales."""
        def frames(scales, sched):
            def one(carry, s):
                f = field.with_params(field.sigma * s, field.color)
                return carry, body(f, sched)
            return jax.lax.scan(one, 0.0, scales)[1]
        t0 = time.perf_counter()
        fn = jax.jit(frames).lower(scales, sched).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(fn, [(scales, sched), (scales * 1.003, sched)],
                           iters=4) / KF
        log(f"{name}: {s * 1e3:.2f} ms/frame")
        return s

    shapes = tuple((g.n_tiles, g.banks) for g in sched.groups)

    # 1. packed-table build only (the PRODUCTION full-pitch build)
    def packed_only(f, sched):
        packed = _schedule_table(f, sched)
        return packed.reshape(-1)[::65537].sum()
    t_packed = timed("packed build", packed_only)

    # 2. packed build + the ONE planned bank-table gather (production)
    def gather_only(f, sched):
        packed = _schedule_table(f, sched)
        tabs = _gather_bank_tables(packed, sched.gathermap_all,
                                   sched.gather_plan, (sched.pitch, shapes))
        return sum(t[..., ::31].sum() for t in tabs)
    t_gather = timed("packed+gather", gather_only)

    # 3. kernel only: pre-gathered tabs as scan carry-independent args
    flat0 = _schedule_table(field, sched)
    tabs0 = tuple(_gather_bank_tables(flat0, sched.gathermap_all,
                                      sched.gather_plan, (sched.pitch, shapes)))

    geom = (sched.bbox[0], sched.bbox[1], sched.grid_shape)

    def kernel_only(scales, sched, tabs0):
        def one(carry, s):
            acc = jnp.float32(0)
            for g, tb in zip(sched.groups, tabs0):
                out = fused_tiles.render_tile_group(
                    plan, geom, tb * s, g.samp, g.base, g.rayt,
                    g.k_enter, g.bank0, g.n_chunks)
                acc += out[0][::513].sum()
            return carry, acc
        return jax.lax.scan(one, 0.0, scales)[1]

    t0 = time.perf_counter()
    kfn = jax.jit(kernel_only).lower(scales, sched, tabs0).compile()
    log(f"kernel only: compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(
        kfn, [(scales, sched, tabs0), (scales * 1.003, sched, tabs0)],
        iters=4) / KF
    log(f"kernel only: {s * 1e3:.2f} ms/frame")
    t_kernel = s

    # 3b. packed + gather + kernel (production chain, no compose): clean
    # kernel attribution without the tabs-scaling copies of phase 3.
    def pgk(f, sched):
        flat = _schedule_table(f, sched)
        geom2 = (sched.bbox[0], sched.bbox[1], sched.grid_shape)
        tabs = _gather_bank_tables(flat, sched.gathermap_all,
                                   sched.gather_plan, (sched.pitch, shapes))
        acc = jnp.float32(0)
        for gi, g in enumerate(sched.groups):
            out = fused_tiles.render_tile_group(
                plan, geom2, tabs[gi], g.samp, g.base, g.rayt,
                g.k_enter, g.bank0, g.n_chunks)
            acc += out[0][::513].sum()
        return acc
    t_pgk = timed("packed+gather+kernel", pgk)

    # 4. full forward
    def full(f, sched):
        img = render_tiled(plan, f, sched).image
        return img[::64, ::64].sum()
    t_full = timed("full forward", full)

    if args.bwd:
        # a. fwd+bwd through the kernel only (pregathered tabs): isolates
        # the two-pass bwd kernel.
        def loss_k(tabs0, sched):
            acc = jnp.float32(0)
            for g, tb in zip(sched.groups, tabs0):
                out = fused_tiles.render_tile_group(
                    plan, geom, tb, g.samp, g.base, g.rayt,
                    g.k_enter, g.bank0, g.n_chunks)
                acc += (out[0] ** 2).sum()
            return acc

        def kb_reps(scales, sched, tabs0):
            def one(carry, s):
                t2 = tuple(tb * s for tb in tabs0)
                g = jax.grad(loss_k)(t2, sched)
                return carry, g[0][::97, 0, ::31].sum()
            return jax.lax.scan(one, 0.0, scales)[1]

        t0 = time.perf_counter()
        kfn2 = jax.jit(kb_reps).lower(scales, sched, tabs0).compile()
        log(f"kernel fwd+bwd: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(
            kfn2, [(scales, sched, tabs0),
                   (scales * 1.003, sched, tabs0)], iters=3) / KF
        log(f"kernel fwd+bwd: {s * 1e3:.2f} ms/step")

        # b. grad of gather+kernel wrt the packed table: adds the
        # hostmap scatter (take_rows_exact vjp).
        def loss_pk(flat, sched):
            tabs = _gather_bank_tables(flat, sched.gathermap_all,
                                       sched.gather_plan, (sched.pitch, shapes))
            acc = jnp.float32(0)
            for gi, g in enumerate(sched.groups):
                out = fused_tiles.render_tile_group(
                    plan, geom, tabs[gi], g.samp, g.base, g.rayt,
                    g.k_enter, g.bank0, g.n_chunks)
                acc += (out[0] ** 2).sum()
            return acc

        flat0j = flat0

        def pk_reps(scales, sched, flat):
            def one(carry, s):
                g = jax.grad(loss_pk)(flat * s, sched)
                return carry, g[::1027, ::31].sum()
            return jax.lax.scan(one, 0.0, scales)[1]

        t0 = time.perf_counter()
        pfn = jax.jit(pk_reps).lower(scales, sched, flat0j).compile()
        log(f"gather+kernel fwd+bwd: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(
            pfn, [(scales, sched, flat0j),
                  (scales * 1.003, sched, flat0j)], iters=3) / KF
        log(f"gather+kernel fwd+bwd: {s * 1e3:.2f} ms/step "
            f"(adds the {slots/1e6:.2f}M-row scatter)")

        # c. full train step (loss + grads into sigma/color + sgd update)
        target = jnp.zeros((plan.height, plan.width, 3), jnp.float32)

        def loss_full(params, sched):
            f = field.with_params(*params)
            img = render_tiled(plan, f, sched).image
            return jnp.mean((img - target) ** 2)

        params0 = (field.sigma, field.color)

        def step_reps(scales, sched, p0):
            def one(p, s):
                l, g = jax.value_and_grad(loss_full)(p, sched)
                return ((p[0] - 1e-3 * g[0], p[1] - 1e-3 * g[1]), l)
            return jax.lax.scan(one, p0, scales)[1]

        t0 = time.perf_counter()
        sfn = jax.jit(step_reps).lower(scales, sched, params0).compile()
        log(f"full train step: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(
            sfn, [(scales, sched, params0),
                  (scales * 1.003, sched, params0)], iters=3) / KF
        log(f"full train step: {s * 1e3:.2f} ms/step "
            f"({n_rays / s / 1e6:.1f} Mrays/s)")

    if args.parity:
        from dvren_tpu.render.windowed import (
            build_schedule, render_windowed_traced)
        img_k = np.asarray(jax.jit(
            lambda f, s: render_tiled(plan, f, s, use_kernel=True).image
        )(field, sched))
        img_j = np.asarray(jax.jit(
            lambda f, s: render_tiled(plan, f, s, use_kernel=False).image
        )(field, sched))
        wsched = build_schedule(plan, field.bbox_min, field.bbox_max,
                                jitter=jitter)
        img_w = np.asarray(jax.jit(
            lambda f, s: render_windowed_traced(plan, f, s).image
        )(field, wsched))
        d_kj = np.abs(img_k - img_j)
        d_kw = np.abs(img_k - img_w)
        log(f"parity kernel-vs-jnp max {d_kj.max():.3e} "
            f"(n>1e-5: {(d_kj > 1e-5).sum()})")
        log(f"parity kernel-vs-windowed max {d_kw.max():.3e} "
            f"(n>1e-5: {(d_kw > 1e-5).sum()})")

    log("---- breakdown ----")
    log(f"packed build        {t_packed * 1e3:7.2f} ms")
    log(f"row gather          {(t_gather - t_packed) * 1e3:7.2f} ms "
        f"({slots / max(t_gather - t_packed, 1e-9) / 1e6:.0f} Mstarts/s)")
    log(f"tile kernel (net)   {(t_pgk - t_gather) * 1e3:7.2f} ms "
        f"(scaled-tabs probe: {t_kernel * 1e3:.2f})")
    log(f"compose             {(t_full - t_pgk) * 1e3:7.2f} ms")
    log(f"full forward        {t_full * 1e3:7.2f} ms "
        f"({n_rays / t_full / 1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
