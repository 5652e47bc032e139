"""Benchmark: fused forward + fwd/bwd throughput at 512^2 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Primary metric: forward Mrays/s at 512^2, 64^3 grid, 128 steps/ray,
stratified sampling with early termination (the BASELINE.json headline
config; north star >= 1 Grays/s forward, so vs_baseline = value / 1000).
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


def _fetch_probe(out):
    """Materialize a tiny slice of the first output leaf on the host -
    forces the execution to actually complete (the axon relay's
    block_until_ready can acknowledge before the chip runs, and identical
    calls may be served from a value cache)."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    probe = leaf.reshape(-1)[:1]
    return float(probe[0])


def _time_compiled(fn, args_variants, iters, warmup=2):
    """Average seconds/call with per-call host fetch of one element and
    cycling argument variants (defeats async-ack and value caching)."""
    for i in range(warmup):
        _fetch_probe(fn(*args_variants[i % len(args_variants)]))
    t0 = time.perf_counter()
    for i in range(iters):
        _fetch_probe(fn(*args_variants[i % len(args_variants)]))
    return (time.perf_counter() - t0) / iters


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
    from dvren_tpu.render.pipeline import plan_jitter_table, render_streamed
    from dvren_tpu.render.windowed import (
        build_schedule, render_windowed_traced)

    def log(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    width = height = 512
    max_steps = 128
    plan, field = _scene(width, height, 64, max_steps)
    n_rays = plan.ray_count
    log(f"device={jax.devices()[0]} rays={n_rays} steps={max_steps}")
    jitter_np = plan_jitter_table(plan)
    jitter = jax.device_put(jitter_np)

    @jax.jit
    def forward(field, jitter):
        return render_streamed(plan, field, jitter=jitter).image

    t0 = time.perf_counter()
    fwd = forward.lower(field, jitter).compile()
    log(f"fwd compile {time.perf_counter() - t0:.1f}s")
    field_b = field.with_params(field.sigma * 1.0001, field.color)
    fwd_s = _time_compiled(
        fwd, [(field, jitter), (field_b, jitter)], iters=10)
    fwd_mrays = n_rays / fwd_s / 1e6
    log(f"fwd {fwd_s * 1e3:.2f} ms -> {fwd_mrays:.1f} Mrays/s")

    target = jnp.zeros((height, width, 3), jnp.float32)

    def loss_fn(params, jitter):
        f = field.with_params(*params)
        img = render_streamed(plan, f, jitter=jitter).image
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    params = (field.sigma, field.color)
    t0 = time.perf_counter()
    fb = grad_fn.lower(params, jitter).compile()
    log(f"fwd+bwd compile {time.perf_counter() - t0:.1f}s")
    params_b = (params[0] * 1.0001, params[1])
    fb_s = _time_compiled(
        fb, [(params, jitter), (params_b, jitter)], iters=5)
    fb_mrays = n_rays / fb_s / 1e6
    log(f"fwd+bwd {fb_s * 1e3:.2f} ms -> {fb_mrays:.1f} Mrays/s")

    # bf16 packed-table performance mode (reduced field precision)
    field16 = field.with_packed_dtype("bfloat16")
    fwd16 = jax.jit(
        lambda f, j: render_streamed(plan, f, jitter=j).image
    ).lower(field16, jitter).compile()
    field16_b = field16.with_params(field16.sigma * 1.0001, field16.color)
    fwd16_s = _time_compiled(
        fwd16, [(field16, jitter), (field16_b, jitter)], iters=10)
    log(f"fwd bf16 table {fwd16_s * 1e3:.2f} ms -> "
        f"{n_rays / fwd16_s / 1e6:.1f} Mrays/s")

    def loss16(params, jitter):
        f = field16.with_params(*params)
        img = render_streamed(plan, f, jitter=jitter).image
        return jnp.mean((img - target) ** 2)

    fb16 = jax.jit(jax.value_and_grad(loss16)).lower(
        params, jitter).compile()
    fb16_s = _time_compiled(
        fb16, [(params, jitter), (params_b, jitter)], iters=5)
    log(f"fwd+bwd bf16 table {fb16_s * 1e3:.2f} ms -> "
        f"{n_rays / fb16_s / 1e6:.1f} Mrays/s")

    # Windowed replay: host-built bbox schedule (the capture-specialization
    # analogue of CUDA Graph), bit-exact vs the full lattice for OOB_ZERO
    # fields (tests/test_windowed.py). Build once, render many.
    t0 = time.perf_counter()
    sched = build_schedule(plan, field.bbox_min, field.bbox_max,
                           jitter=jitter_np)
    log(f"schedule build {time.perf_counter() - t0:.2f}s: "
        f"{sched.windowed_samples / 1e6:.1f}M of "
        f"{sched.full_lattice_samples / 1e6:.1f}M samples, "
        f"{sched.skipped_rays} rays skipped")

    win_fwd = jax.jit(
        lambda f: render_windowed_traced(plan, f, sched).image
    ).lower(field).compile()
    win_s = _time_compiled(win_fwd, [(field,), (field_b,)], iters=10)
    win_mrays = n_rays / win_s / 1e6
    log(f"fwd windowed {win_s * 1e3:.2f} ms -> {win_mrays:.1f} Mrays/s")

    # remat=False: at this scale the saved lattice residuals are ~3.5 GB
    # (fits HBM) and skipping the backward recompute is worth ~22%.
    def loss_win(params):
        f = field.with_params(*params)
        img = render_windowed_traced(plan, f, sched, remat=False).image
        return jnp.mean((img - target) ** 2)

    win_fb = jax.jit(jax.value_and_grad(loss_win)).lower(params).compile()
    win_fb_s = _time_compiled(win_fb, [(params,), (params_b,)], iters=5)
    win_fb_mrays = n_rays / win_fb_s / 1e6
    log(f"fwd+bwd windowed {win_fb_s * 1e3:.2f} ms -> "
        f"{win_fb_mrays:.1f} Mrays/s")

    def loss_win16(params):
        f = field16.with_params(*params)
        img = render_windowed_traced(plan, f, sched, remat=False).image
        return jnp.mean((img - target) ** 2)

    win16_fwd = jax.jit(
        lambda f: render_windowed_traced(plan, f, sched).image
    ).lower(field16).compile()
    win16_s = _time_compiled(win16_fwd, [(field16,), (field16_b,)], iters=10)
    log(f"fwd windowed bf16 {win16_s * 1e3:.2f} ms -> "
        f"{n_rays / win16_s / 1e6:.1f} Mrays/s")
    win16_fb = jax.jit(jax.value_and_grad(loss_win16)).lower(
        params).compile()
    win16_fb_s = _time_compiled(win16_fb, [(params,), (params_b,)], iters=5)
    log(f"fwd+bwd windowed bf16 {win16_fb_s * 1e3:.2f} ms -> "
        f"{n_rays / win16_fb_s / 1e6:.1f} Mrays/s")

    samples = n_rays * max_steps
    result = {
        "metric": "fwd_Mrays_per_s_512",
        "value": round(win_mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(win_mrays / 1000.0, 4),
        "extra": {
            "fwd_path": "windowed replay (exact, f32)",
            "fwdbwd_Mrays_per_s": round(win_fb_mrays, 2),
            "fwd_windowed_ms": round(win_s * 1e3, 3),
            "fwdbwd_windowed_ms": round(win_fb_s * 1e3, 3),
            "fwd_windowed_bf16_Mrays_per_s": round(
                n_rays / win16_s / 1e6, 2),
            "fwdbwd_windowed_bf16_Mrays_per_s": round(
                n_rays / win16_fb_s / 1e6, 2),
            "fwd_full_lattice_Mrays_per_s": round(fwd_mrays, 2),
            "fwdbwd_full_lattice_Mrays_per_s": round(fb_mrays, 2),
            "fwd_bf16_table_Mrays_per_s": round(n_rays / fwd16_s / 1e6, 2),
            "fwdbwd_bf16_table_Mrays_per_s": round(n_rays / fb16_s / 1e6, 2),
            "fwd_full_Msamples_per_s": round(samples / fwd_s / 1e6, 1),
            "fwd_ms": round(fwd_s * 1e3, 3),
            "fwdbwd_ms": round(fb_s * 1e3, 3),
            "windowed_sample_fraction": round(
                sched.windowed_samples / sched.full_lattice_samples, 3),
            "config": "512x512, 64^3 grid, 128 steps, stratified",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
