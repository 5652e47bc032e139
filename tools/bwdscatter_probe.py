"""TIMING-ONLY probe: how much of the fwd+bwd train step is the
backward's one-hot scatter emission, and what would a single-bank
(N=128) scatter buy?

The backward's d(table) emission contracts each block row's (32, 128)
weighted cotangents against a (256, 128) one-hot over the chunk's
TWO-bank window (ops/fused_tiles.py::_bwd_kernel) - ~1.6 TFLOP/step at
the 512^2/64^3 headline (16 rows x nc x T tile-passes of 128x128@128x256
with the 3-split M padded to one 128-row tile). Two cost models, both
WRONG-VALUED (timing only):

  half:  contract against the first bank's 128 slots only and zero-pad
         bank 1 - the exact cost of a bank-aligned schedule (runs never
         cross banks) + single-bank scatter kernel variant.
  none:  skip the scatter entirely - the scatter's total share.

    python tools/bwdscatter_probe.py
"""

from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


def main():
    import jax
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import _scene, _time_compiled
    from dvren_tpu.ops import fused_tiles as ft
    from dvren_tpu.render import tiled as tiled_mod
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled

    def log(m):
        print(f"[bwdscatter] {m}", file=_sys.stderr, flush=True)

    plan, field = _scene(512, 512, 64, 128)
    sched = build_tiled_schedule(plan, field,
                                 jitter=plan_jitter_table(plan))
    import numpy as np
    target = jnp.asarray(np.zeros((512, 512, 3), np.float32))
    params = (field.sigma, field.color)
    params_b = (field.sigma * 1.001, field.color)
    tiled_mod.BWD_SPLIT = "xla"
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

    def timed(name):
        ft._tile_op.cache_clear()
        t0 = time.perf_counter()
        fn = jax.jit(train_steps).lower(params, sched).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(fn, [(params, sched), (params_b, sched)],
                           iters=3) / KB
        log(f"{name}: {s * 1e3:.2f} ms/step")
        return s * 1e3

    t_base = timed("baseline (two-bank scatter, mxu3)")

    orig = ft._Mxu3Reduce.scatter_dot

    def _scatter_half(x, oh_bf16):
        hi, mid, lo = ft._split3_bf16(x)
        big = jnp.concatenate([hi, mid, lo], axis=0)
        d = jax.lax.dot_general(big, oh_bf16[:ft.LANES], (((1,), (1,)),
                                                          ((), ())),
                                preferred_element_type=jnp.float32)
        m = x.shape[0]
        d = d[:m] + d[m:2 * m] + d[2 * m:]
        return jnp.concatenate(
            [d, jnp.zeros((m, ft.LANES), jnp.float32)], axis=1)

    def _scatter_none(x, oh_bf16):
        return jnp.zeros((x.shape[0], oh_bf16.shape[0]), jnp.float32)

    results = {}
    for name, fn in (("half", _scatter_half), ("none", _scatter_none)):
        ft._Mxu3Reduce.scatter_dot = staticmethod(fn)
        try:
            results[name] = timed(f"scatter={name} (timing-only, wrong "
                                  "gradients)")
        finally:
            ft._Mxu3Reduce.scatter_dot = orig
    ft._tile_op.cache_clear()

    import json
    print(json.dumps({
        "metric": "bwdscatter_probe",
        "base_ms": round(t_base, 2),
        "half_ms": round(results.get("half", 0.0), 2),
        "none_ms": round(results.get("none", 0.0), 2),
        "config": "512^2 64^3 128 steps, xla split, mxu3",
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    _sys.exit(main())
