"""TIMING-ONLY probe: how much of the fused kernel is the second-bank
expansion? (ROOFLINE_r05 attribution: the kernel is VPU-issue-bound and
the 32 two-bank window expansions per chunk are the dominant op group.)

Monkeypatches fused_tiles._win_expand to a single-bank gather (WRONG
values wherever idx2 >= 128 - this is a cost model, not a render) and
times the production forward scan against the intact kernel. If the win
is real (>= ~10%), bank-aligned run packing (runs never cross a bank)
plus a single-bank kernel variant buys it exactly.

    python tools/singlebank_probe.py
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
        print(f"[singlebank] {m}", file=_sys.stderr, flush=True)

    plan, field = _scene(512, 512, 64, 128)
    sched = build_tiled_schedule(plan, field, jitter=plan_jitter_table(plan))
    KF = 8
    scales = jnp.linspace(1.0, 1.01, KF)

    def frames(scales, sched):
        def body(carry, s):
            f = field.with_params(field.sigma * s, field.color)
            img = render_tiled(plan, f, sched).image
            return carry, img[::64, ::64].sum()
        return jax.lax.scan(body, 0.0, scales)[1]

    def timed(name):
        ft._tile_op.cache_clear()
        t0 = time.perf_counter()
        fn = jax.jit(frames).lower(scales, sched).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(fn, [(scales, sched), (scales * 1.003, sched)],
                           iters=4) / KF
        log(f"{name}: {s * 1e3:.3f} ms/frame")
        return s * 1e3

    t_base = timed("baseline (two-bank expansion)")

    orig = ft._win_expand

    def _win_expand_single(m0, m1, col, prep):
        i0, i1, sel, out_rows = prep
        rows = i0.shape[0]
        r0 = jnp.broadcast_to(m0[col:col + 1, :], (rows, ft.LANES))
        v = jnp.take_along_axis(r0, i0, axis=1)
        return v[:out_rows] if out_rows != rows else v

    ft._win_expand = _win_expand_single
    try:
        t_single = timed("single-bank expansion (timing-only, wrong "
                         "values beyond bank 0)")
    finally:
        ft._win_expand = orig
        ft._tile_op.cache_clear()

    print({"baseline_ms": round(t_base, 3),
           "single_bank_ms": round(t_single, 3),
           "win_pct": round(100 * (1 - t_single / t_base), 1)})


if __name__ == "__main__":
    main()
