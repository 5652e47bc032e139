"""Phase attribution for the supercell tiled fit step (VERDICT r4 work).

Times, at the fit-flagship config (64^3 grid, 8 views @ 96^2, 96 steps,
merged uniform supercell schedule), each phase of the train step as a
K-iteration scan per dispatch (relay-safe; see bench.py methodology):

  build   - build_supercell_stencil alone (params -> (R_s, 108) table)
  gather  - + planned bank gather (_gather_banks_f32 forward)
  fwd     - full multi-view forward (render_tiled_stack)
  step    - full train step (value_and_grad + adam update)

Usage: python tools/supercell_probe.py [--views 8] [--res 96]
"""

from __future__ import annotations

import argparse
import json
import math
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--res", type=int, default=96)
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--k", type=int, default=8)
    args = p.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dvren_tpu import (CameraConfig, DenseGridConfig, DenseGridField,
                           Plan, PlanConfig, SamplingConfig)
    from dvren_tpu.opt.fit import _scheduled_views, mse
    from dvren_tpu.ops import grid as grid_ops
    from dvren_tpu.render import tiled as T
    from dvren_tpu.utils.timing import time_compiled

    g = args.grid
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, g)] * 3), indexing="ij")
    r2 = (xs - 0.5) ** 2 + (ys - 0.5) ** 2 + (zs - 0.45) ** 2
    sigma = (10.0 * np.exp(-r2 / 0.06)).astype(np.float32)
    color = np.stack([xs, ys, 1 - zs], axis=-1).astype(np.float32)
    field = DenseGridField.create(DenseGridConfig(
        resolution=(g,) * 3, sigma=sigma.reshape(-1),
        color=color.reshape(-1)))
    w = h = args.res
    plan = Plan.create(PlanConfig(
        width=w, height=h, t_near=0.2, t_far=2.2,
        camera=CameraConfig(
            k=(w * 1.2, 0, w / 2, 0, w * 1.2, h / 2, 0, 0, 1)),
        sampling=SamplingConfig(dt=2.0 / 96, max_steps=96)))
    V = args.views
    cams = [CameraConfig(c2w=(
        1, 0, 0, 0.5 + 0.25 * math.sin(2 * math.pi * i / V),
        0, 1, 0, 0.5 + 0.15 * math.cos(2 * math.pi * i / V),
        0, 0, 1, -1.0)) for i in range(V)]

    plans, merged, render_stack = _scheduled_views(plan, cams, field,
                                                   "tiled")
    sched = merged.sched
    slots = sum(gr.n_tiles * gr.banks * 128 for gr in sched.groups)
    print(f"[probe] cell_scale={sched.cell_scale} tile_px={sched.tile_px} "
          f"slots={slots} groups="
          f"{[(gr.n_chunks, gr.banks, gr.n_tiles) for gr in sched.groups]}",
          file=_sys.stderr, flush=True)

    K = args.k
    scales = jnp.linspace(1.0, 1.01, K)
    params = (field.sigma, field.color)
    params_b = (field.sigma * 1.0001, field.color)
    static = (int(108 if sched.cell_scale == 2 else 32),
              tuple((gr.n_tiles, gr.banks) for gr in sched.groups))

    def scan_over(fn):
        def run(ss, sched):
            def body(c, s):
                return c, fn(field.sigma * s, field.color, sched)
            return jax.lax.scan(body, 0.0, ss)[1]
        return run

    def probe(label, fn, args_a, args_b, iters=4):
        c = jax.jit(fn).lower(*args_a).compile()
        s = time_compiled(c, [args_a, args_b], iters=iters) / K
        print(f"[probe] {label}: {s * 1e3:.2f} ms", file=_sys.stderr,
              flush=True)
        return s * 1e3

    out = {}
    if sched.cell_scale == 2:
        def build_only(sg, cl, sched):
            t = grid_ops.build_supercell_stencil(
                sg.reshape(field.sigma.shape), cl)
            return t[::257, ::17].sum()
        out["build_ms"] = probe(
            "build", scan_over(lambda sg, cl, s: build_only(sg, cl, s)),
            (scales, sched), (scales * 1.003, sched))

        def build_gather(sg, cl, sched):
            t = grid_ops.build_supercell_stencil(
                sg.reshape(field.sigma.shape), cl)
            tabs = T._gather_banks_f32(t, sched.gathermap_all,
                                       sched.gather_plan, static)
            return sum(tb[::7, 0, ::13, ::31].sum() for tb in tabs)
        out["build_gather_ms"] = probe(
            "build+gather", scan_over(build_gather),
            (scales, sched), (scales * 1.003, sched))

    def fwd(sg, cl, merged):
        f = field.with_params(sg.reshape(field.sigma.shape)
                              if sg.ndim == 1 else sg, cl)
        return render_stack(f, merged)[:, ::31, ::31].sum()
    out["fwd_ms"] = probe(
        "fwd stack", scan_over(lambda sg, cl, m: fwd(sg, cl, m)),
        (scales, merged), (scales * 1.003, merged))

    targets = jnp.zeros((V, h, w, 3), jnp.float32)
    opt = optax.adam(5e-2)
    ostate = opt.init(params)

    def step_scan(p0, merged):
        def loss_fn(pp):
            f = field.with_params(*pp)
            return mse(render_stack(f, merged), targets)

        def body(carry, _):
            pp, oo = carry
            loss, grads = jax.value_and_grad(loss_fn)(pp)
            up, oo = opt.update(grads, oo, pp)
            pp = optax.apply_updates(pp, up)
            return (pp, oo), loss
        return jax.lax.scan(body, (p0, ostate), None, length=K)[1]

    out["step_ms"] = probe("train step", step_scan,
                           (params, merged), (params_b, merged), iters=3)
    out["slots"] = slots
    out["cell_scale"] = sched.cell_scale
    out["tile_px"] = sched.tile_px
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    _sys.exit(main())
