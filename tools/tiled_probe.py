"""TPU validation + timing of the fused tile path (ops/fused_tiles.py).

1. parity: kernel vs pure-jnp tile consumer on a small scene, on the chip;
2. headline timing: 512^2, 64^3 grid, 128 stratified steps - tiled fwd and
   fwd+bwd vs the windowed replay numbers in BENCH_r01.

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
    # sized so 16x16 tiles fit the 128-cell tables (headline-like ratio)
    plan, field = _scene(256, 192, 48, 64)
    jit_np = plan_jitter_table(plan)
    sched = build_tiled_schedule(plan, field, jitter=jit_np)
    log(f"small: groups={[(g.n_chunks, g.n_tiles) for g in sched.groups]} "
        f"fallback={sched.fallback_rays}")
    ref = jax.jit(lambda f: render_tiled(plan, f, sched, use_kernel=False))(
        field)
    for mode in ("mxu", "dg"):
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
    groups = [(g.n_chunks, g.n_tiles) for g in sched.groups]
    log(f"schedule build {time.perf_counter() - t0:.2f}s: "
        f"tiled={sched.tiled_samples / 1e6:.1f}M of "
        f"{sched.full_lattice_samples / 1e6:.1f}M, "
        f"fallback_rays={sched.fallback_rays}, groups={groups}")

    field_b = field.with_params(field.sigma * 1.0001, field.color)
    fwd_c = None
    for mode in ("mxu", "dg"):
        fwd = jax.jit(lambda f: render_tiled(plan, f, sched,
                                             gather=mode).image)
        t0 = time.perf_counter()
        c = fwd.lower(field).compile()
        log(f"fwd[{mode}] compile {time.perf_counter() - t0:.1f}s")
        fwd_s = _time_compiled(c, [(field,), (field_b,)], iters=10)
        log(f"tiled fwd[{mode}] {fwd_s * 1e3:.2f} ms -> "
            f"{n_rays / fwd_s / 1e6:.1f} Mrays/s")
        if mode == "mxu":
            fwd_c = c

    target = jnp.zeros((height, width, 3), jnp.float32)

    def loss(params):
        f = field.with_params(*params)
        img = render_tiled(plan, f, sched).image
        return jnp.mean((img - target) ** 2)

    params = (field.sigma, field.color)
    params_b = (params[0] * 1.0001, params[1])
    t0 = time.perf_counter()
    fb_c = jax.jit(jax.value_and_grad(loss)).lower(params).compile()
    log(f"fwd+bwd compile {time.perf_counter() - t0:.1f}s")
    fb_s = _time_compiled(fb_c, [(params,), (params_b,)], iters=5)
    log(f"tiled fwd+bwd {fb_s * 1e3:.2f} ms -> {n_rays / fb_s / 1e6:.1f} "
        f"Mrays/s")

    # parity vs windowed replay at full size (sanity, not timing)
    from dvren_tpu.render.windowed import build_schedule, \
        render_windowed_traced
    wsched = build_schedule(plan, field.bbox_min, field.bbox_max,
                            jitter=jit_np)
    win = jax.jit(
        lambda f: render_windowed_traced(plan, f, wsched).image
    ).lower(field).compile()
    a = np.asarray(fwd_c(field))
    b = np.asarray(win(field))
    log(f"headline parity tiled-vs-windowed image maxdiff="
        f"{np.abs(a - b).max():.3e}")


if __name__ == "__main__":
    parity_small()
    headline()
