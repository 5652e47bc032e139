"""Sparse-brick fused-path benchmark: 512^3 shell through the tile kernel.

VERDICT r2 next #5: sparse fields (beyond the reference, which only
scaffolded VDB - /root/reference/cmake/setup_vdb.cmake:1-69) previously
rendered only via the windowed/streamed paths. Round 3's tile scheduler
resolves the brick two-level indirection at build time, so the fused
kernel consumes brick rows exactly like dense packed rows. This measures
both paths on a 512^3 SDF shell (~ the largest BASELINE.json config) at
512^2 rays with occupancy trimming.

Prints one JSON line. Usage: python tools/sparse_bench.py
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from bench import _time_compiled
    from dvren_tpu import (
        CameraConfig, DenseGridConfig, DenseGridField, Plan, PlanConfig,
        SamplingConfig,
    )
    from dvren_tpu.fields.sparse_grid import SparseGridField
    from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled
    from dvren_tpu.render.windowed import (build_schedule,
                                           render_windowed_traced)

    def log(msg):
        print(f"[sparse] {msg}", file=_sys.stderr, flush=True)

    n = 512
    width = 512
    steps = 192

    t0 = time.perf_counter()
    # thin SDF shell: ~5-8% of bricks occupied
    lin = np.linspace(0, 1, n, dtype=np.float32)
    zs = lin[:, None, None]
    ys = lin[None, :, None]
    xs = lin[None, None, :]
    r = np.sqrt((xs - .5) ** 2 + (ys - .5) ** 2 + (zs - .5) ** 2)
    sigma = np.where(np.abs(r - 0.33) < 0.02, 30.0, 0.0).astype(np.float32)
    color = np.empty((n, n, n, 3), np.float32)
    color[..., 0] = xs
    color[..., 1] = ys
    color[..., 2] = 1.0 - zs
    dense = DenseGridField.create(DenseGridConfig(
        resolution=(n,) * 3, sigma=sigma.reshape(-1),
        color=color.reshape(-1)))
    sparse = SparseGridField.from_dense(dense, threshold=0.0)
    del dense, sigma, color
    log(f"field build {time.perf_counter() - t0:.1f}s: "
        f"{sparse.occupied_bricks}/{sparse.total_bricks} bricks "
        f"({sparse.memory_bytes() / 1e6:.0f} MB vs dense packed "
        f"{(n - 1) ** 3 * 32 * 4 / 1e9:.1f} GB)")

    plan = Plan.create(PlanConfig(
        width=width, height=width, t_near=0.2, t_far=2.2, seed=3,
        camera=CameraConfig(
            k=(width * 1.2, 0, width / 2, 0, width * 1.2, width / 2,
               0, 0, 1),
            c2w=(1, 0, 0, .5, 0, 1, 0, .5, 0, 0, 1, -1.0)),
        sampling=SamplingConfig(dt=2.0 / steps, max_steps=steps)))
    n_rays = plan.ray_count

    t0 = time.perf_counter()
    sched = build_tiled_schedule(plan, sparse, occupancy=True, tile_px=8)
    log(f"8px occ schedule {time.perf_counter() - t0:.1f}s, "
        f"fallback={sched.fallback_rays}/{sched.total_rays}, "
        f"{len(sched.groups)} groups, "
        f"{sched.tiled_samples / 1e6:.1f}M samples")

    kf = 4
    scales = jnp.linspace(1.0, 1.01, kf)

    def frames(scales, sched, bricks):
        def one(c, s):
            f = sparse.with_params(bricks * s)
            img = render_tiled(plan, f, sched).image
            return c, img[::64, ::64].sum()
        return jax.lax.scan(one, 0.0, scales)[1]

    t0 = time.perf_counter()
    fwd = jax.jit(frames).lower(scales, sched, sparse.bricks).compile()
    log(f"tiled compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(fwd, [(scales, sched, sparse.bricks),
                             (scales * 1.003, sched, sparse.bricks)],
                       iters=3)
    tiled_ms = s / kf * 1e3
    tiled_mrays = n_rays / (s / kf) / 1e6
    log(f"tiled fwd {tiled_ms:.1f} ms -> {tiled_mrays:.2f} Mrays/s")

    t0 = time.perf_counter()
    wsched = build_schedule(plan, sparse.bbox_min, sparse.bbox_max)
    log(f"window schedule {time.perf_counter() - t0:.1f}s")

    def wframes(scales, wsched, bricks):
        def one(c, s):
            f = sparse.with_params(bricks * s)
            img = render_windowed_traced(plan, f, wsched).image
            return c, img[::64, ::64].sum()
        return jax.lax.scan(one, 0.0, scales)[1]

    t0 = time.perf_counter()
    wfwd = jax.jit(wframes).lower(scales, wsched, sparse.bricks).compile()
    log(f"windowed compile {time.perf_counter() - t0:.1f}s")
    s = _time_compiled(wfwd, [(scales, wsched, sparse.bricks),
                              (scales * 1.003, wsched, sparse.bricks)],
                       iters=3)
    win_ms = s / kf * 1e3
    win_mrays = n_rays / (s / kf) / 1e6
    log(f"windowed fwd {win_ms:.1f} ms -> {win_mrays:.2f} Mrays/s "
        f"({tiled_mrays / win_mrays:.2f}x tiled speedup)")

    a = np.asarray(jax.jit(
        lambda f, s_: render_tiled(plan, f, s_).image)(sparse, sched))
    b = np.asarray(jax.jit(
        lambda f, s_: render_windowed_traced(plan, f, s_).image
    )(sparse, wsched))
    par = float(np.abs(a - b).max())
    log(f"tiled-vs-windowed maxdiff {par:.3e}")

    out = {
        "sparse_512cube_512sq_occ": dict(
            tiled_Mrays_per_s=round(tiled_mrays, 2),
            windowed_Mrays_per_s=round(win_mrays, 2),
            speedup=round(tiled_mrays / win_mrays, 2),
            tiled_ms=round(tiled_ms, 2),
            windowed_ms=round(win_ms, 2),
            fallback_rays=sched.fallback_rays,
            occupied_bricks=sparse.occupied_bricks,
            total_bricks=sparse.total_bricks,
            field_mb=round(sparse.memory_bytes() / 1e6),
            maxdiff=par),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
