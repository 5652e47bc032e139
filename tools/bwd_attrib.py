"""Marginal attribution of the production fwd+bwd step at the headline
config by differencing three train-step variants that differ ONLY in
where the differentiated parameter sits in the forward chain:

  T_kern : grad w.r.t. the gathered bank tables (kernel fwd+bwd + compose
           + loss only)
  T_flat : grad w.r.t. the flat packed table (adds the planned gather fwd
           + its relayout/ct16_rows_to_table backward)
  T_full : grad w.r.t. (sigma, color) - the production step (adds the
           fullpitch build fwd + its pads/transpose adjoint)

Deltas: gather fwd+vjp = T_flat - T_kern; build fwd+vjp = T_full - T_flat.
Every variant is a KB-step SGD-like scan (the carry update busts the
relay's by-value caching) timed with the shared relay-safe helper, so the
deltas are apples-to-apples. Usage: python tools/bwd_attrib.py
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
    from bench import _scene, _time_compiled
    from dvren_tpu.ops import fused_tiles
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render import tiled as tiled_mod
    from dvren_tpu.render.tiled import (build_tiled_schedule,
                                        _gather_bank_tables,
                                        _schedule_table, _compose_tiles,
                                        render_tiled)

    def log(m): print(f"[attrib] {m}", file=_sys.stderr, flush=True)

    plan, field = _scene(512, 512, 64, 128)
    sched = build_tiled_schedule(plan, field, jitter=plan_jitter_table(plan))
    shapes = tuple((g.n_tiles, g.banks) for g in sched.groups)
    geom = (sched.bbox[0], sched.bbox[1], sched.grid_shape)
    static = (sched.pitch, shapes)
    target = jnp.zeros((plan.height, plan.width, 3), jnp.float32)
    log(f"device={jax.devices()[0]} groups={len(sched.groups)} "
        f"bwd_split={tiled_mod.BWD_SPLIT}")

    def consume_groups(tabs, sched):
        raws, ids = [], []
        for gi, g in enumerate(sched.groups):
            raws.append(fused_tiles.render_tile_group_raw(
                plan, geom, tabs[gi], g.samp, g.base, g.rayt,
                g.k_enter, g.bank0, g.n_chunks))
            ids.append(g.tile_ids)
        img = _compose_tiles(plan, raws, ids, [],
                             tile_px=sched.tile_px).image
        return jnp.mean((img - target) ** 2)

    KB = 4
    results = {}

    def steps(loss, p0, sched):
        def body(p, _):
            _, g = jax.value_and_grad(loss)(p, sched)
            if isinstance(p, tuple):
                return tuple(a - 1e-3 * b for a, b in zip(p, g)), 0.0
            return p - 1e-3 * g, 0.0
        return jax.lax.scan(body, p0, None, length=KB)[0]

    def probe_of(p):
        leaves = jax.tree_util.tree_leaves(p)
        return sum(l.reshape(-1)[::4097].astype(jnp.float32).sum()
                   for l in leaves)

    def run(name, loss, p0, p1):
        def fn(p0, sched):
            return probe_of(steps(loss, p0, sched))
        t0 = time.perf_counter()
        c = jax.jit(fn).lower(p0, sched).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(c, [(p0, sched), (p1, sched)], iters=3) / KB
        log(f"{name}: {s * 1e3:.2f} ms/step")
        results[name] = s * 1e3
        return s

    # ---- T_full: the production step (grad wrt sigma/color) -----------
    def loss_full(p, sched):
        f = field.with_params(*p)
        img = render_tiled(plan, f, sched).image
        return jnp.mean((img - target) ** 2)

    params = (field.sigma, field.color)
    params_b = (field.sigma * 1.0001, field.color)
    run("T_full", loss_full, params, params_b)

    # ---- T_flat: grad wrt the flat packed table ------------------------
    flat0 = _schedule_table(field, sched)
    flat1 = flat0 * 1.0001

    def loss_flat(flat, sched):
        tabs = _gather_bank_tables(flat, sched.gathermap_all,
                                   sched.gather_plan, static)
        return consume_groups(tabs, sched)

    run("T_flat", loss_flat, flat0, flat1)

    # ---- T_kern: grad wrt the gathered bank tables ----------------------
    tabs0 = jax.jit(lambda f: _gather_bank_tables(
        f, sched.gathermap_all, sched.gather_plan, static))(flat0)
    tabs1 = tuple(t * 1.0001 for t in tabs0)
    run("T_kern", consume_groups, tabs0, tabs1)

    # ---- forward-only references for the same seams --------------------
    def fwd_of(loss):
        def fn(p0, sched):
            def body(c, s):
                return c, loss(jax.tree_util.tree_map(
                    lambda a: a * s, p0), sched)
            return jax.lax.scan(body, 0.0, jnp.linspace(1, 1.01, KB))[1]
        return fn
    for name, loss, p0, p1 in (
            ("F_full", loss_full, params, params_b),
            ("F_flat", loss_flat, flat0, flat1),
            ("F_kern", consume_groups, tabs0, tabs1)):
        t0 = time.perf_counter()
        c = jax.jit(fwd_of(loss)).lower(p0, sched).compile()
        log(f"{name}: compile {time.perf_counter() - t0:.1f}s")
        s = _time_compiled(c, [(p0, sched), (p1, sched)], iters=3) / KB
        log(f"{name}: {s * 1e3:.2f} ms/frame")
        results[name] = s * 1e3

    import json
    d = {k: round(v, 2) for k, v in results.items()}
    d["gather_fwd_vjp_ms"] = round(results["T_flat"] - results["T_kern"], 2)
    d["build_fwd_vjp_ms"] = round(results["T_full"] - results["T_flat"], 2)
    print(json.dumps(d))


if __name__ == "__main__":
    main()
