"""TPU validation + timing of the fused tile path (ops/fused_tiles.py).

Timing methodology: the axon tunnel serializes dispatches at ~36 ms each
(measured: a trivial jit call costs 35.95 ms; pipelining does not help),
so per-call timings measure the harness, not the chip. True steady-state
throughput is measured by scanning K frames (distinct field params) inside
ONE dispatch and dividing - the jit-replay analogue of CUDA-Graph
steady state, and how a production renderer batches anyway.

Run alone (one relay-registered JAX process at a time):
    python tools/tiled_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench import _scene, _time_compiled
from dvren_tpu.render.pipeline import plan_jitter_table
from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled


def log(msg):
    print(f"[tiled_probe] {msg}", file=sys.stderr, flush=True)


def parity_small():
    # sized so 16x16 tiles exercise both 1- and 2-bank tables
    plan, field = _scene(256, 192, 48, 64)
    jit_np = plan_jitter_table(plan)
    sched = build_tiled_schedule(plan, field, jitter=jit_np)
    log(f"small: groups={[(g.n_chunks, g.banks, g.n_tiles) for g in sched.groups]} "
        f"fallback={sched.fallback_rays}")
    ref = jax.jit(lambda f: render_tiled(plan, f, sched, use_kernel=False))(
        field)
    for mode in ("dg", "mxu"):
        out = jax.jit(lambda f: render_tiled(plan, f, sched,
                                             gather=mode))(field)
        for name in ("image", "transmittance", "opacity", "depth"):
            a = np.asarray(getattr(out, name))
            b = np.asarray(getattr(ref, name))
            log(f"small parity [{mode}] {name}: "
                f"maxdiff={np.abs(a - b).max():.3e}")

    # gradient parity on-chip
    target = jnp.zeros((plan.height, plan.width, 3))

    def loss(params, use_kernel):
        f = field.with_params(*params)
        img = render_tiled(plan, f, sched, use_kernel=use_kernel).image
        return jnp.mean((img - target) ** 2)

    params = (field.sigma, field.color)
    g_ref = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g_ker = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    for i, nm in enumerate(("sigma", "color")):
        a, b = np.asarray(g_ker[i]), np.asarray(g_ref[i])
        scale = max(np.abs(b).max(), 1e-30)
        log(f"small grad {nm}: maxreldiff={np.abs(a - b).max() / scale:.3e}")


def headline():
    width = height = 512
    max_steps = 128
    plan, field = _scene(width, height, 64, max_steps)
    n_rays = plan.ray_count
    jit_np = plan_jitter_table(plan)

    t0 = time.perf_counter()
    sched = build_tiled_schedule(plan, field, jitter=jit_np)
    groups = [(g.n_chunks, g.banks, g.n_tiles) for g in sched.groups]
    log(f"schedule build {time.perf_counter() - t0:.2f}s: "
        f"tiled={sched.tiled_samples / 1e6:.1f}M of "
        f"{sched.full_lattice_samples / 1e6:.1f}M, "
        f"fallback_rays={sched.fallback_rays}, groups={groups}")

    K = 16

    def frames(sigmas, sched):  # (K,) scales -> per-frame image checksums
        def body(carry, s):
            f = field.with_params(field.sigma * s, field.color)
            img = render_tiled(plan, f, sched).image
            return carry, img[::64, ::64].sum()
        _, sums = jax.lax.scan(body, 0.0, sigmas)
        return sums

    scales = jnp.linspace(1.0, 1.01, K)
    scales_b = scales * 1.003
    t0 = time.perf_counter()
    fwd_c = jax.jit(frames).lower(scales, sched).compile()
    log(f"fwd scan compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(fwd_c, [(scales, sched), (scales_b, sched)], iters=4)
    per_frame = s / K
    log(f"tiled fwd amortized (K={K}): {per_frame * 1e3:.2f} ms/frame -> "
        f"{n_rays / per_frame / 1e6:.1f} Mrays/s")

    # training steps inside one dispatch
    target = jnp.zeros((height, width, 3), jnp.float32)
    KB = 8

    def loss(params, sched):
        f = field.with_params(*params)
        img = render_tiled(plan, f, sched).image
        return jnp.mean((img - target) ** 2)

    def steps(params0, sched):
        def body(params, _):
            l, g = jax.value_and_grad(loss)(params, sched)
            return ((params[0] - 1e-3 * g[0], params[1] - 1e-3 * g[1]), l)
        return jax.lax.scan(body, params0, None, length=KB)

    params = (field.sigma, field.color)
    params_b = (params[0] * 1.0001, params[1])
    t0 = time.perf_counter()
    fb_c = jax.jit(steps).lower(params, sched).compile()
    log(f"fwd+bwd scan compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(fb_c, [(params, sched), (params_b, sched)], iters=3)
    per_step = s / KB
    log(f"tiled fwd+bwd amortized (K={KB}): {per_step * 1e3:.2f} ms/step -> "
        f"{n_rays / per_step / 1e6:.1f} Mrays/s")

    # legacy single-dispatch timings for continuity with round-1 numbers
    fwd1 = jax.jit(lambda f, s: render_tiled(plan, f, s).image)
    c1 = fwd1.lower(field, sched).compile()
    field_b = field.with_params(field.sigma * 1.0001, field.color)
    s1 = _time_compiled(c1, [(field, sched), (field_b, sched)], iters=10)
    log(f"tiled fwd single-dispatch: {s1 * 1e3:.2f} ms (incl. ~36 ms "
        f"tunnel) -> {n_rays / s1 / 1e6:.1f} Mrays/s")

    # full-frame parity vs windowed replay
    from dvren_tpu.render.windowed import build_schedule, \
        render_windowed_traced
    wsched = build_schedule(plan, field.bbox_min, field.bbox_max,
                            jitter=jit_np)
    win = jax.jit(
        lambda f: render_windowed_traced(plan, f, wsched).image
    ).lower(field).compile()
    a = np.asarray(c1(field, sched))
    b = np.asarray(win(field))
    log(f"headline parity tiled-vs-windowed image maxdiff="
        f"{np.abs(a - b).max():.3e}")


if __name__ == "__main__":
    parity_small()
    headline()
