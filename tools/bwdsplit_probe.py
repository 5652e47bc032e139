"""Isolate the backward's bank-block -> u16 slot-row relayout cost:
XLA bitcast+split+swapaxes vs the blockwise Pallas kernel
(ops/packed_transpose.py::banks_to_u16_rows), plus the full
_gather_bank_tables VJP both ways, at the headline 512^2/64^3 schedule.

Usage: python tools/bwdsplit_probe.py
"""
from __future__ import annotations

import os as _os, sys as _sys, time
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from bench import _scene, _time_compiled
    from dvren_tpu.ops import packed_transpose
    from dvren_tpu.render import tiled as tiled_mod
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import (MAX_CELLS, _gather_bank_tables,
                                        _schedule_table,
                                        build_tiled_schedule)

    def log(m):
        print(f"[bwdsplit] {m}", file=_sys.stderr, flush=True)

    plan, field = _scene(512, 512, 64, 128)
    sched = build_tiled_schedule(plan, field, jitter=plan_jitter_table(plan))
    shapes = tuple((g.n_tiles, g.banks) for g in sched.groups)
    static = (sched.pitch, shapes)
    flat = _schedule_table(field, sched)
    tabs = _gather_bank_tables(flat, sched.gathermap_all,
                               sched.gather_plan, static)
    n_blocks = sum(t * b for t, b in shapes)
    log(f"device={jax.devices()[0]} groups={len(shapes)} "
        f"bank blocks={n_blocks} ({n_blocks * 32 * 128 * 4 / 1e6:.0f} MB)")
    KF = 4
    scales = jnp.linspace(1.0, 1.01, KF)

    # -- relayout only (cts -> (S, 64) u16 rows), both strategies -------
    def relayout_xla(scales, tabs):
        def one(carry, s):
            blocks = [(c * s).reshape(-1, 32, MAX_CELLS) for c in tabs]
            ct = jnp.concatenate(blocks)
            bits = jax.lax.bitcast_convert_type(ct, jnp.uint32)
            ct16 = jnp.concatenate(
                [(bits >> 16).astype(jnp.uint16),
                 (bits & jnp.uint32(0xFFFF)).astype(jnp.uint16)], axis=1)
            ct16 = jnp.swapaxes(ct16, 1, 2).reshape(-1, 64)
            return carry, ct16[::997, 0].astype(jnp.uint32).sum()
        return jax.lax.scan(one, 0, scales)[1]

    def relayout_pallas(scales, tabs):
        def one(carry, s):
            ct16 = jnp.concatenate(
                [packed_transpose.banks_to_u16_rows(
                    (c * s).reshape(-1, 32, MAX_CELLS)) for c in tabs])
            return carry, ct16[::997, 0].astype(jnp.uint32).sum()
        return jax.lax.scan(one, 0, scales)[1]

    for name, fn in (("xla", relayout_xla), ("pallas", relayout_pallas)):
        t0 = time.perf_counter()
        c = jax.jit(fn).lower(scales, tabs).compile()
        log(f"relayout {name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(c, [(scales, tabs), (scales * 1.003, tabs)],
                           iters=4) / KF
        log(f"relayout {name}: {s * 1e3:.2f} ms/frame")

    # -- ct16_rows_to_table phase attribution ---------------------------
    from dvren_tpu.ops import grid as grid_ops
    gplan = sched.gather_plan
    all_idx, meta, inv_map = gplan.all_idx, gplan.meta, gplan.inv_map
    w = flat.shape[1]
    ct16_0 = jax.jit(lambda tabs: jnp.concatenate(
        [packed_transpose.banks_to_u16_rows(
            c.reshape(-1, 32, MAX_CELLS)) for c in tabs]))(tabs)
    log(f"ct16 rows={ct16_0.shape} all_idx={all_idx.shape} "
        f"classes={[(n, c) for _, n, c in meta]}")

    def ph_gather(scales, ct16, idx):
        def one(carry, s):
            src = jnp.concatenate(
                [(ct16.astype(jnp.uint32) + s).astype(jnp.uint16),
                 jnp.zeros((1, ct16.shape[1]), jnp.uint16)])
            g16 = jnp.take(src, idx, axis=0, mode="clip")
            return carry, g16[::997, 0].astype(jnp.uint32).sum()
        return jax.lax.scan(one, jnp.uint32(0), scales)[1]

    def ph_reduce(scales, ct16, idx):
        def one(carry, s):
            src = jnp.concatenate(
                [(ct16.astype(jnp.uint32) + s).astype(jnp.uint16),
                 jnp.zeros((1, ct16.shape[1]), jnp.uint16)])
            g16 = jnp.take(src, idx, axis=0, mode="clip")
            val_parts = [
                grid_ops._u16_rows_to_f32(
                    g16[off:off + n_k * c_k], w).reshape(
                        n_k, c_k, w).sum(axis=1)
                for off, n_k, c_k in meta]
            vals = jnp.concatenate(val_parts)
            return carry, vals[::997, 0].sum()
        return jax.lax.scan(one, jnp.float32(0), scales)[1]

    def ph_full(scales, ct16, idx):
        def one(carry, s):
            src = (ct16.astype(jnp.uint32) + s).astype(jnp.uint16)
            d = tiled_mod.ct16_rows_to_table(src, idx, meta, inv_map, w)
            return carry, d[::513, 0].sum()
        return jax.lax.scan(one, jnp.float32(0), scales)[1]

    iscales = jnp.arange(KF, dtype=jnp.uint32)
    for name, fn in (("gather", ph_gather), ("gather+reduce", ph_reduce),
                     ("rows_to_table", ph_full)):
        t0 = time.perf_counter()
        c = jax.jit(fn).lower(iscales, ct16_0, all_idx).compile()
        log(f"phase {name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(c, [(iscales, ct16_0, all_idx),
                               (iscales + 7, ct16_0, all_idx)],
                           iters=4) / KF
        log(f"phase {name}: {s * 1e3:.2f} ms")

    # -- full VJP (d(tabs) -> d(flat table)), both strategies -----------
    def vjp_fn(scales, tabs, flat_t, gmap, gplan):
        # flat table / maps / plan travel as ARGUMENTS (closure constants
        # embed tens of MB of literals and overflow the remote-compile
        # upload; see CLAUDE.md).
        _, pull = jax.vjp(
            lambda f: _gather_bank_tables(f, gmap, gplan, static), flat_t)

        def one(carry, s):
            (d,) = pull(tuple(c * s for c in tabs))
            return carry, d[::513, 0].sum()
        return jax.lax.scan(one, 0.0, scales)[1]

    for mode in ("xla", "pallas"):
        tiled_mod.BWD_SPLIT = mode
        t0 = time.perf_counter()
        c = jax.jit(vjp_fn).lower(scales, tabs, flat, sched.gathermap_all,
                                  sched.gather_plan).compile()
        log(f"gather-vjp {mode}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(
            c, [(scales, tabs, flat, sched.gathermap_all, sched.gather_plan),
                (scales * 1.003, tabs, flat, sched.gathermap_all,
                 sched.gather_plan)], iters=4) / KF
        log(f"gather-vjp {mode}: {s * 1e3:.2f} ms/step")
        # parity spot check between modes (bit-exact expected)
        out = np.asarray(c(scales, tabs, flat, sched.gathermap_all,
                           sched.gather_plan))
        if mode == "xla":
            ref = out
        else:
            log(f"xla-vs-pallas probe maxdiff "
                f"{np.abs(ref - out).max():.3e}")
    tiled_mod.BWD_SPLIT = _os.environ.get("DVREN_BWD_SPLIT", "xla")


if __name__ == "__main__":
    main()
