"""Benchmark: fused-tile forward + fwd/bwd throughput at 512^2 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Primary metric: forward Mrays/s at 512^2, 64^3 grid, 128 steps/ray,
stratified sampling with early termination (the BASELINE.json headline
config; north star >= 1 Grays/s forward, so vs_baseline = value / 1000).

Timing methodology (measured, tools/tiled_probe.py): the axon relay
serializes dispatches at ~36 ms each (a trivial jit call costs 36 ms and
pipelining does not help), so single-dispatch latency measures the harness
tunnel, not the chip. Steady-state throughput therefore scans K frames
(distinct field params) inside ONE dispatch and divides - the jit-replay
analogue of the reference's CUDA-Graph steady state (graph_cuda.cu:208:
launch cost amortized across replays). Single-dispatch numbers are kept in
"extra" for continuity with the round-1 floors.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

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


# relay-safe timing: single shared implementation (tools import these
# names from bench for convenience)
from dvren_tpu.utils.timing import (fetch_probe as _fetch_probe,
                                    time_compiled as _time_compiled)


def main():
    import os
    import sys

    import jax

    # persistent compile cache: remote TPU compiles take minutes cold
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled
    from dvren_tpu.render.windowed import (
        build_schedule, render_windowed_traced)

    def log(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    # env overrides exist so the full bench (incl. both ablation
    # branches) can be smoke-run on CPU at a tiny scene; the driver's
    # recorded config is always the default.
    width = height = int(_os.environ.get("DVREN_BENCH_WIDTH", "512"))
    max_steps = int(_os.environ.get("DVREN_BENCH_STEPS", "128"))
    grid_n = int(_os.environ.get("DVREN_BENCH_GRID", "64"))
    plan, field = _scene(width, height, grid_n, max_steps)
    n_rays = plan.ray_count
    log(f"device={jax.devices()[0]} rays={n_rays} steps={max_steps}")
    jitter_np = plan_jitter_table(plan)
    target = jnp.zeros((height, width, 3), jnp.float32)
    params = (field.sigma, field.color)
    params_b = (params[0] * 1.0001, params[1])
    field_b = field.with_params(field.sigma * 1.0001, field.color)

    # ---------------------------------------------------------- tiled path
    t0 = time.perf_counter()
    sched = build_tiled_schedule(plan, field, jitter=jitter_np)
    log(f"tiled schedule build {time.perf_counter() - t0:.1f}s: "
        f"{sched.tiled_samples / 1e6:.1f}M of "
        f"{sched.full_lattice_samples / 1e6:.1f}M samples, "
        f"fallback_rays={sched.fallback_rays}")

    KF = 8

    def frames(scales, sched):
        def body(carry, s):
            f = field.with_params(field.sigma * s, field.color)
            img = render_tiled(plan, f, sched).image
            return carry, img[::64, ::64].sum()
        return jax.lax.scan(body, 0.0, scales)[1]

    scales = jnp.linspace(1.0, 1.01, KF)
    t0 = time.perf_counter()
    fwd_scan = jax.jit(frames).lower(scales, sched).compile()
    log(f"tiled fwd scan compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(fwd_scan, [(scales, sched), (scales * 1.003, sched)],
                       iters=4)
    tiled_fwd_s = s / KF
    tiled_fwd_mrays = n_rays / tiled_fwd_s / 1e6
    log(f"tiled fwd steady-state {tiled_fwd_s * 1e3:.2f} ms/frame -> "
        f"{tiled_fwd_mrays:.1f} Mrays/s")

    # analytic DMA/gather floor for THIS schedule (pitch 1) vs the
    # measurement above - the "at the floor" claim with numbers
    # (utils/roofline.py; full phase attribution: tools/roofline.py)
    from dvren_tpu.utils.roofline import forward_roofline
    roofline = forward_roofline(sched, measured_ms=tiled_fwd_s * 1e3)
    log(f"roofline: floor {roofline['floor_ms']['total']} ms, "
        f"measured/floor {roofline['measured_over_floor']}")

    # Pair-pitch gather ablation (RenderOptions.tile_pitch=2: half the
    # forward table-gather starts for ~49% more slot lanes; bit-identical
    # images - tests/test_tiled.py). Headline takes the faster config.
    fwd_pitch2_mrays = None
    sched2 = fwd_scan2 = None
    try:
        sched2 = build_tiled_schedule(plan, field, jitter=jitter_np,
                                      pitch=2)
        t0 = time.perf_counter()
        fwd_scan2 = jax.jit(frames).lower(scales, sched2).compile()
        log(f"tiled fwd pitch2 compile {time.perf_counter() - t0:.1f}s")
        s2 = _time_compiled(
            fwd_scan2, [(scales, sched2), (scales * 1.003, sched2)],
            iters=4)
        fwd_pitch2_mrays = n_rays / (s2 / KF) / 1e6
        log(f"tiled fwd pitch2 steady-state {s2 / KF * 1e3:.2f} ms/frame "
            f"-> {fwd_pitch2_mrays:.1f} Mrays/s")
    except Exception as e:  # never fail the bench on an ablation
        log(f"pitch2 ablation failed: {type(e).__name__}: {e}")
    best_pitch = 2 if (fwd_pitch2_mrays or 0) > tiled_fwd_mrays else 1
    if best_pitch == 2:
        tiled_fwd_mrays, tiled_fwd_s = fwd_pitch2_mrays, s2 / KF
    # release the ablation schedule + executable (full duplicate of the
    # tiled schedule's device arrays - HBM pressure on later phases)
    sched2 = fwd_scan2 = None

    KB = 4

    def loss_tiled(p, sched):
        f = field.with_params(*p)
        img = render_tiled(plan, f, sched).image
        return jnp.mean((img - target) ** 2)

    def train_steps(p0, sched):
        def body(p, _):
            l, g = jax.value_and_grad(loss_tiled)(p, sched)
            return ((p[0] - 1e-3 * g[0], p[1] - 1e-3 * g[1]), l)
        return jax.lax.scan(body, p0, None, length=KB)

    # baseline is ALWAYS the xla split (an inherited DVREN_BWD_SPLIT=
    # pallas env would otherwise make the ablation compare pallas vs
    # pallas while the JSON labels the winner "xla")
    from dvren_tpu.render import tiled as tiled_mod
    tiled_mod.BWD_SPLIT = "xla"
    t0 = time.perf_counter()
    fb_scan = jax.jit(train_steps).lower(params, sched).compile()
    log(f"tiled fwd+bwd scan compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(fb_scan, [(params, sched), (params_b, sched)],
                       iters=3)
    tiled_fb_s = s / KB
    tiled_fb_mrays = n_rays / tiled_fb_s / 1e6
    log(f"tiled fwd+bwd steady-state {tiled_fb_s * 1e3:.2f} ms/step -> "
        f"{tiled_fb_mrays:.1f} Mrays/s")

    # Backward cotangent-relayout ablation (DVREN_BWD_SPLIT=pallas: the
    # blockwise VMEM bank->u16-row kernel replaces XLA's
    # bitcast+split+swapaxes; bit-identical gradients - test_tiled.py).
    # The flag is baked at trace time, so re-lower with it flipped.
    fb_pallas_mrays = None
    try:
        tiled_mod.BWD_SPLIT = "pallas"
        t0 = time.perf_counter()
        fb_scan_p = jax.jit(train_steps).lower(params, sched).compile()
        log(f"tiled fwd+bwd pallas-split compile "
            f"{time.perf_counter() - t0:.1f}s")
        sp = _time_compiled(
            fb_scan_p, [(params, sched), (params_b, sched)], iters=3)
        fb_pallas_mrays = n_rays / (sp / KB) / 1e6
        log(f"tiled fwd+bwd pallas-split steady-state "
            f"{sp / KB * 1e3:.2f} ms/step -> {fb_pallas_mrays:.1f} Mrays/s")
    except Exception as e:
        log(f"pallas-split ablation failed: {type(e).__name__}: {e}")
    finally:
        tiled_mod.BWD_SPLIT = _os.environ.get("DVREN_BWD_SPLIT", "xla")
    best_split = ("pallas"
                  if (fb_pallas_mrays or 0) > tiled_fb_mrays else "xla")
    if best_split == "pallas":
        tiled_fb_mrays, tiled_fb_s = fb_pallas_mrays, sp / KB

    # Bank-aligned train-step ablation: bank_aligned=True packs runs so
    # none straddles a bank (~92% single-bank scatter windows vs ~50%
    # opportunistic on the default packing, for 1.18x bank-gather
    # lanes); gradients are BIT-identical (in-suite), so headline the
    # faster of the two (tools/bwdscatter_probe.py attribution).
    fb_aligned_mrays = None
    best_sched = "default"
    try:
        tiled_mod.BWD_SPLIT = "xla"
        sched_al = build_tiled_schedule(plan, field, jitter=jitter_np,
                                        bank_aligned=True)
        t0 = time.perf_counter()
        fb_scan_al = jax.jit(train_steps).lower(params,
                                                sched_al).compile()
        log(f"tiled fwd+bwd bank-aligned compile "
            f"{time.perf_counter() - t0:.1f}s")
        sa = _time_compiled(
            fb_scan_al, [(params, sched_al), (params_b, sched_al)],
            iters=3)
        fb_aligned_mrays = n_rays / (sa / KB) / 1e6
        log(f"tiled fwd+bwd bank-aligned steady-state "
            f"{sa / KB * 1e3:.2f} ms/step -> "
            f"{fb_aligned_mrays:.1f} Mrays/s")
        if fb_aligned_mrays > tiled_fb_mrays:
            tiled_fb_mrays, tiled_fb_s = fb_aligned_mrays, sa / KB
            best_sched = "bank_aligned"
    except Exception as e:
        log(f"bank-aligned ablation failed: {type(e).__name__}: {e}")
    finally:
        sched_al = fb_scan_al = None

    # bf16 packed-table perf mode (documented ~1e-3 field precision)
    import dataclasses as _dc
    field_bf16 = _dc.replace(field, packed_dtype="bfloat16")

    def frames_bf16(scales, sched):
        def body(carry, s):
            f = field_bf16.with_params(field_bf16.sigma * s,
                                       field_bf16.color)
            img = render_tiled(plan, f, sched).image
            return carry, img[::64, ::64].sum()
        return jax.lax.scan(body, 0.0, scales)[1]

    fwd_scan16 = jax.jit(frames_bf16).lower(scales, sched).compile()
    s = _time_compiled(
        fwd_scan16, [(scales, sched), (scales * 1.003, sched)], iters=4)
    tiled_bf16_mrays = n_rays / (s / KF) / 1e6
    log(f"tiled fwd bf16 steady-state {s / KF * 1e3:.2f} ms/frame -> "
        f"{tiled_bf16_mrays:.1f} Mrays/s")

    # single-dispatch (includes ~36 ms tunnel roundtrip; round-1 continuity)
    tiled_fwd1 = jax.jit(
        lambda f, s: render_tiled(plan, f, s).image
    ).lower(field, sched).compile()
    s1 = _time_compiled(
        tiled_fwd1, [(field, sched), (field_b, sched)], iters=10)
    log(f"tiled fwd single-dispatch {s1 * 1e3:.2f} ms -> "
        f"{n_rays / s1 / 1e6:.1f} Mrays/s")

    # ------------------------------------------------- windowed (exact) path
    t0 = time.perf_counter()
    wsched = build_schedule(plan, field.bbox_min, field.bbox_max,
                            jitter=jitter_np)
    log(f"window schedule build {time.perf_counter() - t0:.1f}s")
    win_fwd = jax.jit(
        lambda f, s: render_windowed_traced(plan, f, s).image
    ).lower(field, wsched).compile()
    win_s = _time_compiled(
        win_fwd, [(field, wsched), (field_b, wsched)], iters=10)
    win_mrays = n_rays / win_s / 1e6
    log(f"windowed fwd single-dispatch {win_s * 1e3:.2f} ms -> "
        f"{win_mrays:.1f} Mrays/s")

    def loss_win(p, s):
        f = field.with_params(*p)
        img = render_windowed_traced(plan, f, s, remat=False).image
        return jnp.mean((img - target) ** 2)

    win_fb = jax.jit(jax.value_and_grad(loss_win)).lower(
        params, wsched).compile()
    win_fb_s = _time_compiled(
        win_fb, [(params, wsched), (params_b, wsched)], iters=5)
    win_fb_mrays = n_rays / win_fb_s / 1e6
    log(f"windowed fwd+bwd single-dispatch {win_fb_s * 1e3:.2f} ms -> "
        f"{win_fb_mrays:.1f} Mrays/s")

    # parity guard: the benchmarked fast path must match the exact replay
    a = np.asarray(tiled_fwd1(field, sched))
    b = np.asarray(win_fwd(field, wsched))
    parity = float(np.abs(a - b).max())
    log(f"tiled-vs-windowed image maxdiff {parity:.3e}")

    result = {
        "metric": "fwd_Mrays_per_s_512",
        "value": round(tiled_fwd_mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(tiled_fwd_mrays / 1000.0, 4),
        "extra": {
            "fwd_path": "fused tile kernel, steady-state "
                        f"(K={KF} frames/dispatch)",
            "fwd_tile_pitch": best_pitch,
            "fwd_pitch2_Mrays_per_s": (round(fwd_pitch2_mrays, 2)
                                       if fwd_pitch2_mrays else None),
            "fwdbwd_Mrays_per_s": round(tiled_fb_mrays, 2),
            "bwd_split": best_split,
            "fwdbwd_sched": best_sched,
            "fwdbwd_bank_aligned_Mrays_per_s": (
                round(fb_aligned_mrays, 2) if fb_aligned_mrays
                else None),
            "fwdbwd_pallas_split_Mrays_per_s": (
                round(fb_pallas_mrays, 2) if fb_pallas_mrays else None),
            "fwd_bf16_table_Mrays_per_s": round(tiled_bf16_mrays, 2),
            "fwd_ms_per_frame": round(tiled_fwd_s * 1e3, 3),
            "fwdbwd_ms_per_step": round(tiled_fb_s * 1e3, 3),
            "fwd_single_dispatch_ms": round(s1 * 1e3, 3),
            "fwd_single_dispatch_Mrays_per_s": round(n_rays / s1 / 1e6, 2),
            "fwd_windowed_Mrays_per_s": round(win_mrays, 2),
            "fwdbwd_windowed_Mrays_per_s": round(win_fb_mrays, 2),
            "fwd_windowed_ms": round(win_s * 1e3, 3),
            "fwdbwd_windowed_ms": round(win_fb_s * 1e3, 3),
            "tiled_vs_windowed_maxdiff": parity,
            "tiled_sample_fraction": round(
                sched.tiled_samples / sched.full_lattice_samples, 3),
            "tiled_fallback_rays": sched.fallback_rays,
            "dispatch_overhead_ms": 36.0,
            "roofline": roofline,
            "config": f"{width}x{height}, {grid_n}^3 grid, "
                      f"{max_steps} steps, stratified",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
