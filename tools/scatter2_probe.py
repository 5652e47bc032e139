"""Head-to-head: d(table) accumulation strategies at the headline scale.

A: direct zeros.at[hostmap].add(ct)   (XLA scatter-add, S rows)
B: gather-transpose plan              (class gathers + unique set-scatter)
C: B without the u16 split            (f32 gathers)

    python tools/scatter2_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _scene, _time_compiled
from dvren_tpu.ops import grid as grid_ops
from dvren_tpu.render.pipeline import plan_jitter_table
from dvren_tpu.render.tiled import build_tiled_schedule


def log(msg):
    print(f"[scat2] {msg}", file=sys.stderr, flush=True)


def main():
    plan, field = _scene(512, 512, 64, 128)
    sched = build_tiled_schedule(plan, field,
                                 jitter=plan_jitter_table(plan))
    from dvren_tpu.render.tiled import _gather_rows_planned_bwd
    hostmap = sched.hostmap_all
    plan_t = sched.gather_plan
    s_total = int(hostmap.size)
    cells_total = 63 ** 3
    uniq = sum(n for _, n, _ in plan_t.meta)
    log(f"S={s_total/1e6:.2f}M slots -> {uniq/1e3:.0f}K unique cells, "
        f"{len(plan_t.meta)} count classes")

    rng = np.random.default_rng(0)
    ct = jnp.asarray(rng.standard_normal((s_total, 32)).astype(np.float32))
    KF = 4
    scales = jnp.linspace(1.0, 1.01, KF)

    def timed(name, body):
        def reps(scales, ct):
            def one(carry, s):
                d = body(ct * s)
                return carry, d[::1027, ::31].sum()
            return jax.lax.scan(one, 0.0, scales)[1]
        t0 = time.perf_counter()
        fn = jax.jit(reps).lower(scales, ct).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(fn, [(scales, ct), (scales * 1.003, ct)],
                           iters=3) / KF
        log(f"{name}: {s * 1e3:.2f} ms")
        return s

    # A. direct scatter-add
    def direct(ctv):
        return jnp.zeros((cells_total, 32), jnp.float32).at[hostmap].add(
            ctv, mode="drop")
    timed("A scatter-add", direct)

    # E. scatter-free gather-transpose (the production backward)
    def planned(ctv):
        return _gather_rows_planned_bwd(
            (plan_t, (cells_total, 32)), ctv)[0]
    timed("E gather-only transpose", planned)


if __name__ == "__main__":
    main()
