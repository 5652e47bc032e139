"""In-situ cost of the packed u16 build inside the production forward.

build16_probe's three legs all measured ~3.75 ms because their strided
probe reductions (`reshape(-1)[::65537]`) force full relayout passes of
the probed arrays - they time the probe, not the phase. This probe
avoids relayouts: it times (a) the full render_tiled scan, (b) the same
pipeline with the u16 table PRECOMPUTED (gather + kernel + compose
only; the 8 scan variants index a prebuilt (8, R, 64) stack), and (c)
the build alone with a row-sliced reduction that keeps the (R, 64)
tiling. (a) - (b) is the true in-situ build cost.

    python tools/build16_probe2.py
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
    from dvren_tpu.ops import grid as grid_ops
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render import tiled as tiled_mod
    from dvren_tpu.render.tiled import (build_tiled_schedule, render_tiled,
                                        render_tiled_phases)

    def log(m):
        print(f"[build16b] {m}", file=_sys.stderr, flush=True)

    plan, field = _scene(512, 512, 64, 128)
    sched = build_tiled_schedule(plan, field, jitter=plan_jitter_table(plan))
    _, kernel_fn, compose_fn = render_tiled_phases(plan, sched)
    static = (sched.pitch, tuple((g.n_tiles, g.banks)
                                 for g in sched.groups))
    KF = 8
    scales = jnp.linspace(1.0, 1.01, KF)

    def timed(name, fn, variants):
        # two argument variants: the relay caches identical calls by
        # value (CLAUDE.md timing hazard)
        t0 = time.perf_counter()
        c = jax.jit(fn).lower(*variants[0]).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(c, variants, iters=4) / KF
        log(f"{name}: {s * 1e3:.3f} ms/frame")
        return s * 1e3

    # (a) full forward
    def full(scales, sched):
        def body(carry, s):
            f = field.with_params(field.sigma * s, field.color)
            return carry, render_tiled(plan, f, sched).image[::64, ::64].sum()
        return jax.lax.scan(body, 0.0, scales)[1]
    t_full = timed("full render", full,
                   [(scales, sched), (scales * 1.003, sched)])

    # (b) gather + kernel + compose from prebuilt u16 tables
    bt = jax.jit(jax.vmap(lambda s: grid_ops.build_packed_table16(
        field.sigma * s, field.color)))
    t16s = bt(scales)
    t16s_b = bt(scales * 1.003)
    t16s.block_until_ready(); t16s_b.block_until_ready()

    def nobuild(t16s, sched):
        def body(carry, t16):
            tabs = tiled_mod._t16_to_banks(t16, sched.gathermap_all,
                                           static)
            raws = kernel_fn(tabs)
            img = compose_fn(field, raws).image
            return carry, img[::64, ::64].sum()
        return jax.lax.scan(body, 0.0, t16s)[1]
    t_nb = timed("gather+kernel+compose (prebuilt t16)", nobuild,
                 [(t16s, sched), (t16s_b, sched)])

    # (c) build alone, row-sliced probe (keeps (R, 64) tiling)
    def build_only(scales):
        def body(carry, s):
            t16 = grid_ops.build_packed_table16(field.sigma * s,
                                                field.color)
            return carry, t16[::4099, :].astype(jnp.uint32).sum()
        return jax.lax.scan(body, 0.0, scales)[1]
    t_b = timed("build alone (row-sliced probe)", build_only,
                [(scales,), (scales * 1.003,)])

    print({"full_ms": round(t_full, 3), "nobuild_ms": round(t_nb, 3),
           "build_in_situ_ms": round(t_full - t_nb, 3),
           "build_alone_ms": round(t_b, 3)})


if __name__ == "__main__":
    main()
