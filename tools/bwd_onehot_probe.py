"""TIMING-ONLY probe: is the backward's one-hot table-gradient
accumulation (the per-row scatter_dot MXU block in
ops/fused_tiles.py::_bwd_kernel) what makes fwd+bwd 2.77x the forward?

Monkeypatches the reducer's scatter_dot to return zeros (XLA then DCEs
the one-hot builds and the d_cr concats - WRONG gradients, cost model
only) and times the production train step against the intact kernel.

    python tools/bwd_onehot_probe.py
"""

from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import jax
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import _scene, _time_compiled
    from dvren_tpu.ops import fused_tiles as ft
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled

    def log(m):
        print(f"[bwd_onehot] {m}", file=_sys.stderr, flush=True)

    plan, field = _scene(512, 512, 64, 128)
    sched = build_tiled_schedule(plan, field, jitter=plan_jitter_table(plan))
    target = jnp.zeros((512, 512, 3), jnp.float32)
    params = (field.sigma, field.color)
    params_b = (params[0] * 1.0001, params[1])
    KB = 4

    def loss(p, sched):
        f = field.with_params(*p)
        img = render_tiled(plan, f, sched).image
        return jnp.mean((img - target) ** 2)

    def train_steps(p0, sched):
        def body(p, _):
            l, g = jax.value_and_grad(loss)(p, sched)
            return ((p[0] - 1e-3 * g[0], p[1] - 1e-3 * g[1]), l)
        return jax.lax.scan(body, p0, None, length=KB)

    def timed(name):
        ft._tile_op.cache_clear()
        t0 = time.perf_counter()
        fn = jax.jit(train_steps).lower(params, sched).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(fn, [(params, sched), (params_b, sched)],
                           iters=3) / KB
        log(f"{name}: {s * 1e3:.3f} ms/step")
        return s * 1e3

    t_base = timed("baseline fwd+bwd")

    orig = ft._REDUCERS.copy()
    # zero out scatter_dot -> XLA DCEs the one-hot builds upstream
    for name, cls in orig.items():
        class ZeroDot(cls):
            def scatter_dot(self, d_cr, oh):
                # keep a data dependence on d_cr so the adjoint chain
                # itself survives DCE, but drop oh (the one-hot build)
                return jnp.zeros(
                    (d_cr.shape[0], oh.shape[0]), jnp.float32
                ) + d_cr[0:1, 0:1] * 0.0
        ft._REDUCERS[name] = ZeroDot
    try:
        t_nodot = timed("fwd+bwd, one-hot scatter_dot zeroed "
                        "(timing-only, wrong table grads)")
    finally:
        ft._REDUCERS.clear()
        ft._REDUCERS.update(orig)
        ft._tile_op.cache_clear()

    print({"baseline_ms": round(t_base, 3),
           "no_onehot_ms": round(t_nodot, 3),
           "win_pct": round(100 * (1 - t_nodot / t_base), 1)})


if __name__ == "__main__":
    main()
