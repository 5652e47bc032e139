"""Probe: packed-stencil table construction variants on TPU.

The tiled profile showed the per-frame packed build costing ~5.5 ms at 64^3
(32 minor-dim concat pieces force a padded relayout). Times alternative
constructions + the u16 hi/lo split. K-frames-per-dispatch methodology.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from bench import _time_compiled
    from dvren_tpu.ops import grid as grid_ops

    def log(msg):
        print(f"[packed] {msg}", file=_sys.stderr, flush=True)

    n = 64
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(rng.uniform(0, 4, (n, n, n)).astype(np.float32))
    color = jnp.asarray(rng.uniform(0, 1, (n, n, n, 3)).astype(np.float32))

    KF = 8
    scales = jnp.linspace(1.0, 1.01, KF)

    def timed(name, body):
        def frames(scales):
            def one(carry, s):
                return carry, body(sigma * s, color)
            return jax.lax.scan(one, 0.0, scales)[1]
        t0 = time.perf_counter()
        fn = jax.jit(frames).lower(scales).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(fn, [(scales,), (scales * 1.003,)], iters=4) / KF
        log(f"{name}: {s * 1e3:.3f} ms/frame")
        return s

    # A. current: chmajor concat on minor axis, consumer = u16 split + probe
    def build_current(s, c):
        packed = grid_ops.build_packed_stencil_chmajor(s, c)
        return packed.reshape(-1, 32)[::1027, :].sum()
    timed("A chmajor concat (build only)", build_current)

    # B. current build + u16 split (what the tiled path pays per frame)
    def build_split(s, c):
        packed = grid_ops.build_packed_stencil_chmajor(s, c)
        split = grid_ops._split_u16(packed.reshape(-1, 32))
        return split[::1027, :].astype(jnp.uint32).sum()
    timed("B chmajor + u16 split", build_split)

    # C. channel-leading stack (full-lane writes) + one transpose
    def build_transpose(s, c):
        zm = ym = xm = n - 1
        parts = []
        for ch in range(4):
            g = s if ch == 0 else c[..., ch - 1]
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        parts.append(g[dz:dz + zm, dy:dy + ym, dx:dx + xm])
        t = jnp.stack(parts, axis=0).reshape(32, -1)   # (32, cells)
        packed = t.T                                    # (cells, 32)
        return packed[::1027, :].sum()
    timed("C stack + transpose", build_transpose)

    # D. split alone on a prebuilt table (isolates the split cost)
    packed0 = jax.jit(grid_ops.build_packed_stencil_chmajor)(sigma, color)
    flat0 = jnp.asarray(packed0.reshape(-1, 32))

    def split_only(scales, flat):
        def one(carry, s):
            sp = grid_ops._split_u16(flat * s)
            return carry, sp[::1027, :].astype(jnp.uint32).sum()
        return jax.lax.scan(one, 0.0, scales)[1]
    t0 = time.perf_counter()
    fn = jax.jit(split_only).lower(scales, flat0).compile()
    log(f"D split alone: compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(fn, [(scales, flat0), (scales * 1.003, flat0)],
                       iters=4) / KF
    log(f"D split alone: {s * 1e3:.3f} ms/frame")

    # F. direct pair-row u16 build: 2 x-adjacent cells per 128-lane row
    # [c0_hi(32) | c1_hi(32) | c0_lo(32) | c1_lo(32)], no lane padding.
    def build_pairs(s, c):
        zm = ym = xm = n - 1
        xp = xm // 2
        grids = [s] + [c[..., i] for i in range(3)]

        def cell_cols(pcell, shift):
            cols = []
            for g in grids:
                for dz in (0, 1):
                    for dy in (0, 1):
                        for dx in (0, 1):
                            sl = jax.lax.slice(
                                g, (dz, dy, pcell + dx),
                                (dz + zm, dy + ym, pcell + dx + 2 * xp - 1),
                                (1, 1, 2))
                            bits = jax.lax.bitcast_convert_type(
                                sl, jnp.uint32)
                            cols.append((
                                (bits >> shift) & jnp.uint32(0xFFFF)
                            ).astype(jnp.uint16)[..., None])
            return cols

        parts = (cell_cols(0, 16) + cell_cols(1, 16)
                 + cell_cols(0, 0) + cell_cols(1, 0))
        table = jnp.concatenate(parts, axis=-1)     # (zm, ym, xp, 128) u16
        return table[::13, 0, 0, :].astype(jnp.uint32).sum()
    timed("F pair-row u16 direct", build_pairs)

    # E. 256^3 scaling check of the current build
    n2 = 256
    sigma2 = jnp.asarray(rng.uniform(0, 4, (n2, n2, n2)).astype(np.float32))
    color2 = jnp.zeros((n2, n2, n2, 3), jnp.float32)

    def frames2(scales):
        def one(carry, s):
            packed = grid_ops.build_packed_stencil_chmajor(
                sigma2 * s, color2)
            return carry, packed.reshape(-1, 32)[::65537, :].sum()
        return jax.lax.scan(one, 0.0, scales)[1]
    t0 = time.perf_counter()
    fn = jax.jit(frames2).lower(scales).compile()
    log(f"E 256^3 build: compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(fn, [(scales,), (scales * 1.003,)], iters=2) / KF
    log(f"E 256^3 build: {s * 1e3:.3f} ms/frame")


if __name__ == "__main__":
    main()
