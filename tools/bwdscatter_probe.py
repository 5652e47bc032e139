"""TIMING-ONLY probe: how much of the fwd+bwd train step is the
backward's one-hot scatter emission, and what would a single-bank
(N=128) scatter buy?

The backward's d(table) emission contracts each block row's (32, 128)
weighted cotangents against a (256, 128) one-hot over the chunk's
TWO-bank window (ops/fused_tiles.py::_bwd_kernel) - ~1.6 TFLOP/step at
the 512^2/64^3 headline. Variants (run ONE per process - pass
--variant; each uses its own compile-cache dir so cache pollution
cannot alias programs):

  base:  the production step (bit-identical to bench.py's fwd+bwd)
  half:  contract against the first bank's 128 slots only and zero-pad
         bank 1 - the exact cost of a bank-aligned schedule (runs never
         cross banks) + single-bank scatter kernel variant. WRONG
         GRADIENTS wherever a run crosses banks.
  none:  skip the scatter entirely - the scatter's total share. ZERO
         field gradients (the printed param-delta checksum MUST be 0,
         proving the patch entered the trace).

    for v in base half none; do python tools/bwdscatter_probe.py --variant $v; done
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="base",
                   choices=("base", "half", "none"))
    p.add_argument("--aligned", action="store_true",
                   help="build the schedule with bank_aligned=True "
                        "(REAL gradients - the production lever the "
                        "half cost-model approximates)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/jc_bwdscatter_{args.variant}"
                      + ("_al" if args.aligned else ""))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from bench import _scene, _time_compiled
    from dvren_tpu.ops import fused_tiles as ft
    from dvren_tpu.render import tiled as tiled_mod
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled

    def log(m):
        print(f"[bwdscatter] {m}", file=_sys.stderr, flush=True)

    def _scatter_half(x, oh_bf16):
        hi, mid, lo = ft._split3_bf16(x)
        big = jnp.concatenate([hi, mid, lo], axis=0)
        d = jax.lax.dot_general(big, oh_bf16[:ft.LANES],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = x.shape[0]
        d = d[:m] + d[m:2 * m] + d[2 * m:]
        return jnp.concatenate(
            [d, jnp.zeros((m, ft.LANES), jnp.float32)], axis=1)

    def _scatter_none(x, oh_bf16):
        return jnp.zeros((x.shape[0], oh_bf16.shape[0]), jnp.float32)

    if args.variant == "half":
        ft._Mxu3Reduce.scatter_dot = staticmethod(_scatter_half)
    elif args.variant == "none":
        ft._Mxu3Reduce.scatter_dot = staticmethod(_scatter_none)

    plan, field = _scene(512, 512, 64, 128)
    sched = build_tiled_schedule(plan, field,
                                 jitter=plan_jitter_table(plan),
                                 bank_aligned=args.aligned)
    import numpy as np
    b0 = np.concatenate([np.asarray(g.bank0).reshape(-1)
                         for g in sched.groups])
    log(f"aligned={args.aligned}: flagged windows "
        f"{((b0 >> 30) & 1).mean():.2f} of all, "
        f"hostmap lanes {int(sched.hostmap_all.size)}")
    target = jnp.zeros((512, 512, 3), jnp.float32)
    params = (field.sigma, field.color)
    params_b = (params[0] * 1.0001, params[1])
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

    t0 = time.perf_counter()
    fn = jax.jit(train_steps).lower(params, sched).compile()
    log(f"{args.variant}: compile {time.perf_counter() - t0:.1f}s")
    # patch-applied proof: the param delta is 0 for 'none'
    (p_out, _l) = fn(params, sched)
    dsum = float(jnp.abs(p_out[0] - params[0]).sum())
    log(f"{args.variant}: |d sigma| after {KB} steps = {dsum:.3e}")
    s = _time_compiled(fn, [(params, sched), (params_b, sched)],
                       iters=3) / KB
    log(f"{args.variant}: {s * 1e3:.2f} ms/step")

    import json
    print(json.dumps({
        "metric": "bwdscatter_probe",
        "variant": args.variant + ("+aligned" if args.aligned else ""),
        "ms_per_step": round(s * 1e3, 2),
        "dsigma_sum": dsum,
        "config": "512^2 64^3 128 steps, xla split, mxu3",
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    _sys.exit(main())
