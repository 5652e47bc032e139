"""Ablate the fused tile kernel's reduction/gather strategies at the
headline config, plus a clean backward-kernel-only probe.

Round 2 measured reduce="mxu" (HIGHEST-precision group-mask matmuls) at
parity with "roll" (VPU butterfly) because the kernel was DMA-bound; the
round-3 bank packing + slim schedule cut the stream ~2.3x, so the MXU
prefix/group sums (~6 bf16 passes each at HIGHEST) may now be the
bottleneck. Usage: python tools/kernel_ablate.py
"""
from __future__ import annotations

import os as _os, sys as _sys, time
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from bench import _scene, _time_compiled
    from dvren_tpu.ops import fused_tiles
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import (build_tiled_schedule,
                                        _gather_bank_tables, _schedule_table)

    def log(m): print(f"[ablate] {m}", file=_sys.stderr, flush=True)

    plan, field = _scene(512, 512, 64, 128)
    sched = build_tiled_schedule(plan, field, jitter=plan_jitter_table(plan))
    shapes = tuple((g.n_tiles, g.banks) for g in sched.groups)
    geom = (sched.bbox[0], sched.bbox[1], sched.grid_shape)
    flat0 = _schedule_table(field, sched)
    tabs0 = _gather_bank_tables(flat0, sched.gathermap_all, sched.gather_plan,
                                (sched.pitch, shapes))
    KF = 8
    scales = jnp.linspace(1.0, 1.01, KF)
    log(f"device={jax.devices()[0]} groups={len(sched.groups)}")

    results = {}
    for reduce in ("mxu", "roll", "mxu3"):
        def kernel_only(scales, sched, tabs0, reduce=reduce):
            def one(carry, s):
                acc = jnp.float32(0)
                for gi, g in enumerate(sched.groups):
                    out = fused_tiles.render_tile_group(
                        plan, geom, tabs0[gi] * s, g.samp, g.base, g.rayt,
                        g.k_enter, g.bank0, g.n_chunks, reduce=reduce)
                    acc += out[0][::513].sum()
                return carry, acc
            return jax.lax.scan(one, 0.0, scales)[1]
        t0 = time.perf_counter()
        fn = jax.jit(kernel_only).lower(scales, sched, tabs0).compile()
        log(f"reduce={reduce}: compile {time.perf_counter()-t0:.1f}s")
        s = _time_compiled(fn, [(scales, sched, tabs0),
                                (scales * 1.003, sched, tabs0)], iters=4) / KF
        log(f"reduce={reduce}: {s*1e3:.2f} ms/frame (incl. tabs-scale copies)")
        results[reduce] = s * 1e3

    # backward kernel only: vjp pullback with fixed cotangents (no loss
    # junk, no gather) - the two-pass recompute cost in isolation, per
    # reduce variant (the bwd one-hot scatter dots also obey reduce:
    # HIGHEST 6-pass vs bf16-split 3-pass).
    gs0 = tuple(
        jnp.ones((g.n_tiles, 5, 16, 16), jnp.float32) for g in sched.groups)
    for reduce in ("mxu", "mxu3"):
        def fwd_all(tabs0, sched, reduce=reduce):
            outs = []
            for gi, g in enumerate(sched.groups):
                outs.append(fused_tiles.render_tile_group_raw(
                    plan, geom, tabs0[gi], g.samp, g.base, g.rayt,
                    g.k_enter, g.bank0, g.n_chunks, reduce=reduce))
            return tuple(outs)
        def bwd_reps(scales, sched, tabs0, gs0, fwd_all=fwd_all):
            def one(carry, s):
                t2 = tuple(t * s for t in tabs0)
                _, pull = jax.vjp(lambda tt: fwd_all(tt, sched), t2)
                d = pull(gs0)[0]
                return carry, d[0][::97, 0, 0, ::31].sum()
            return jax.lax.scan(one, 0.0, scales)[1]
        t0 = time.perf_counter()
        fn = jax.jit(bwd_reps).lower(scales, sched, tabs0, gs0).compile()
        log(f"kernel fwd+bwd [{reduce}]: compile {time.perf_counter()-t0:.1f}s")
        s = _time_compiled(fn, [(scales, sched, tabs0, gs0),
                                (scales * 1.003, sched, tabs0, gs0)],
                           iters=3) / KF
        log(f"kernel fwd+bwd [{reduce}]: {s*1e3:.2f} ms/step")
        results[f"kernel_fwd_bwd_{reduce}"] = s * 1e3

    import json
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))

if __name__ == "__main__":
    main()
