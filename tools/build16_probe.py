"""Decompose build_packed_table16's 4.25 ms/frame (ROOFLINE_r05_cs1:
11.3x its byte floor - the forward's worst phase) into its two halves:

  (1) _shift_stack_fullpitch  - XLA rotated copies + 32 offset slices
                                + jnp.stack into the (32, R) f32 stack
  (2) stack_to_u16_rows       - the blockwise Pallas transpose + hi/lo
                                split into (R, 64) u16 rows

K-frames-per-dispatch methodology (bench.py). Run on the real TPU:
    python tools/build16_probe.py [--grid 64]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=64)
    args = ap.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from bench import _time_compiled
    from dvren_tpu.ops import grid as grid_ops
    from dvren_tpu.ops import packed_transpose

    def log(m):
        print(f"[build16] {m}", file=_sys.stderr, flush=True)

    n = args.grid
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(rng.uniform(0, 4, (n, n, n)).astype(np.float32))
    color = jnp.asarray(rng.uniform(0, 1, (n, n, n, 3)).astype(np.float32))
    n_rows = grid_ops.fullpitch_rows(sigma.shape)
    log(f"device={jax.devices()[0]} grid={n}^3 rows={n_rows}")

    KF = 8
    scales = jnp.linspace(1.0, 1.01, KF)

    def timed(name, body, *extra):
        def frames(scales, *extra):
            def one(carry, s):
                return carry, body(sigma * s, color, *extra)
            return jax.lax.scan(one, 0.0, scales)[1]
        t0 = time.perf_counter()
        fn = jax.jit(frames).lower(scales, *extra).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(fn, [(scales, *extra),
                                (scales * 1.003, *extra)], iters=4) / KF
        log(f"{name}: {s * 1e3:.3f} ms/frame")
        return s * 1e3

    # 1. shift stack alone (strided probe defeats DCE)
    def stack_only(s, c):
        st = grid_ops._shift_stack_fullpitch(s, c, n_rows)
        return st[:, ::8191].sum()
    t_stack = timed("shift_stack alone", stack_only)

    # 2. Pallas transpose+split alone on a prebuilt stack
    stack0 = jax.jit(lambda s, c: grid_ops._shift_stack_fullpitch(
        s, c, n_rows))(sigma, color)

    def split_only(s, c, st):
        # scale-keyed cache-buster: the multiply keeps the 8 scan
        # iterations distinct (else XLA hoists the loop-invariant call);
        # costs one extra stack read+write pass (~0.7 ms at 64^3)
        rows = packed_transpose.stack_to_u16_rows(st * s[0, 0, 0])
        return rows.reshape(-1)[::65537].astype(jnp.uint32).sum()
    t_split = timed("stack->u16 Pallas alone",
                    lambda s, c, st: split_only(s, c, st), stack0)

    # 3. the full production build
    def full(s, c):
        return grid_ops.build_packed_table16(s, c).reshape(
            -1)[::65537].astype(jnp.uint32).sum()
    t_full = timed("full build_packed_table16", full)

    print({"grid": n, "rows": n_rows,
           "stack_ms": round(t_stack, 3), "u16_ms": round(t_split, 3),
           "full_ms": round(t_full, 3)})


if __name__ == "__main__":
    main()
