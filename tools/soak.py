"""Reference-scale soak runner for TPU sessions.

Runs the two reference-scale workloads end-to-end on the current backend
(real TPU when launched normally, CPU with PALLAS_AXON_POOL_IPS= empty):

1. 960x720 high-res forward (test_smoke_forward_highres.cpp scale) through
   the tiled/windowed fast path, subset-oracle checked;
2. 120-frame animation (test_smoke_animation.cpp:211 scale) with per-frame
   field recreation through one cached plan executable, amortized frame
   timing (frames scanned inside one dispatch - see tools/tiled_probe.py
   for why per-dispatch timing measures the tunnel, not the chip).

Prints one JSON line.

    python tools/soak.py [--frames 120] [--width 960] [--height 720]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=120)
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--grid", type=int, default=64)
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from dvren_tpu import (
        Context, DenseGridConfig, DenseGridField, Renderer, RenderOptions,
    )
    from tests.test_scenes import (
        make_plan, sphere_shell_volume, subset_oracle_check,
    )

    def log(msg):
        print(f"[soak] {msg}", file=sys.stderr, flush=True)

    # ---------------------------------------------------------- 1. highres
    w, h, grid = args.width, args.height, args.grid
    sigma, color = sphere_shell_volume(grid, radius=0.3, width=0.05)
    plan = make_plan(w, h, dt=2.0 / 64, max_steps=64)
    field = DenseGridField.create(DenseGridConfig(
        resolution=sigma.shape[::-1], sigma=sigma.reshape(-1),
        color=color.reshape(-1)))
    r = Renderer(Context.create(), plan, RenderOptions(enable_graph=True))
    t0 = time.perf_counter()
    fr = r.forward(field)
    first_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    fr = r.forward(field.with_params(field.sigma * 1.0001, field.color))
    steady_ms = (time.perf_counter() - t0) * 1e3
    img = fr.image.reshape(h, w, 3)
    assert np.isfinite(img).all()
    rng = np.random.default_rng(3)
    pixels = list(zip(rng.integers(0, w, 12), rng.integers(0, h, 12)))
    subset_oracle_check(plan, fr, sigma * 1.0001, color, pixels)
    log(f"highres {w}x{h}: first={first_ms:.0f} ms, steady={steady_ms:.0f} "
        f"ms (incl. dispatch), mode={fr.stats.notes[-1]}, oracle ok")

    # -------------------------------------------------------- 2. animation
    frames = args.frames
    n = 24
    aplan = make_plan(192, 144, dt=0.0625, max_steps=32)
    zs, ys, xs = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")
    acolor = jnp.asarray(np.stack(
        [xs, 1 - xs, np.full_like(xs, 0.5)], axis=-1).astype(np.float32))
    base = jnp.asarray(np.stack([xs, ys, zs]).astype(np.float32))

    afield = DenseGridField(
        sigma=jnp.zeros((n, n, n), jnp.float32), color=acolor)

    from dvren_tpu.render.pipeline import render

    def frame_sigma(t):
        r2 = ((base[0] - (0.3 + 0.4 * t)) ** 2 + (base[1] - 0.5) ** 2
              + (base[2] - 0.45) ** 2)
        return (8.0 + 2.0 * jnp.sin(6.28 * t)) * jnp.exp(-r2 / 0.05)

    def animate(ts):
        def body(carry, t):
            f = afield.with_params(frame_sigma(t), acolor)
            img = render(aplan, f).planes.image
            return carry, img[::16, ::16].sum()
        return jax.lax.scan(body, 0.0, ts)[1]

    ts = jnp.linspace(0.0, 1.0, frames)
    t0 = time.perf_counter()
    anim = jax.jit(animate).lower(ts).compile()
    log(f"animation compile {time.perf_counter() - t0:.1f}s")
    sums = np.asarray(anim(ts))
    t0 = time.perf_counter()
    sums = np.asarray(anim(ts * 0.999))
    anim_s = time.perf_counter() - t0
    assert np.isfinite(sums).all() and np.abs(np.diff(sums)).max() > 1e-6
    fps = frames / anim_s
    log(f"animation {frames} frames @192x144: {anim_s:.2f}s -> "
        f"{fps:.1f} frames/s")

    print(json.dumps({
        "metric": "soak",
        "highres_steady_ms": round(steady_ms, 1),
        "highres_config": f"{w}x{h}, {grid}^3, 64 steps",
        "animation_fps": round(fps, 1),
        "animation_frames": frames,
        "device": str(jax.devices()[0]),
        "oracle": "pass",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
