"""Clean mxu-vs-mxu3 ablation on the REAL production step at the
headline config (tools/kernel_ablate.py's backward probe consumed only
group 0's gradient, so XLA dead-code-eliminated 13 of 14 groups' bwd
kernels - its numbers are invalid for this decision).

Times the full fwd frame and the full fwd+bwd train step per reduce
variant with the relay-safe K-in-one-dispatch methodology, through
whatever table route render_tiled currently selects (the fused u16
params->banks route for dense f32). Usage: python tools/reduce_ablate.py
"""
from __future__ import annotations

import os as _os, sys as _sys, time
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bench import _scene, _time_compiled
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled

    def log(m): print(f"[reduce] {m}", file=_sys.stderr, flush=True)

    plan, field = _scene(512, 512, 64, 128)
    sched = build_tiled_schedule(plan, field, jitter=plan_jitter_table(plan))
    target = jnp.zeros((plan.height, plan.width, 3), jnp.float32)
    n_rays = plan.ray_count
    params = (field.sigma, field.color)
    params_b = (field.sigma * 1.0001, field.color)
    log(f"device={jax.devices()[0]} groups={len(sched.groups)}")

    KF, KB = 8, 4
    results = {}
    for reduce in ("mxu", "mxu3"):
        def frames(scales, sched, reduce=reduce):
            def body(carry, s):
                f = field.with_params(field.sigma * s, field.color)
                img = render_tiled(plan, f, sched, reduce=reduce).image
                return carry, img[::64, ::64].sum()
            return jax.lax.scan(body, 0.0, scales)[1]

        scales = jnp.linspace(1.0, 1.01, KF)
        t0 = time.perf_counter()
        c = jax.jit(frames).lower(scales, sched).compile()
        log(f"fwd[{reduce}]: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(c, [(scales, sched), (scales * 1.003, sched)],
                           iters=4) / KF
        log(f"fwd[{reduce}]: {s * 1e3:.2f} ms/frame "
            f"({n_rays / s / 1e6:.1f} Mrays/s)")
        results[f"fwd_{reduce}_ms"] = s * 1e3

        def loss(p, sched, reduce=reduce):
            f = field.with_params(*p)
            img = render_tiled(plan, f, sched, reduce=reduce).image
            return jnp.mean((img - target) ** 2)

        def train_steps(p0, sched, loss=loss):
            def body(p, _):
                l, g = jax.value_and_grad(loss)(p, sched)
                return ((p[0] - 1e-3 * g[0], p[1] - 1e-3 * g[1]), l)
            return jax.lax.scan(body, p0, None, length=KB)

        t0 = time.perf_counter()
        c = jax.jit(train_steps).lower(params, sched).compile()
        log(f"fwd+bwd[{reduce}]: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(c, [(params, sched), (params_b, sched)],
                           iters=3) / KB
        log(f"fwd+bwd[{reduce}]: {s * 1e3:.2f} ms/step "
            f"({n_rays / s / 1e6:.1f} Mrays/s)")
        results[f"fwdbwd_{reduce}_ms"] = s * 1e3

    import json
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
