"""Microbenchmark: XLA TPU scatter-add throughput vs row width / strategy.

The backward's cost center is the gather transpose: scatter-add of (M, 32)
f32 row cotangents into the packed-stencil table. This probe measures
whether scatter is per-start paced like gather (tools/gather_probe.py),
whether row width matters, and whether index sorting helps.

Run on the real TPU (serialize with other JAX processes):
    python tools/scatter_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    return float(x.reshape(-1)[0])


def time_scatter(n_rows, width, n_idx, sort=False, iters=5):
    rng = np.random.default_rng(0)
    ct = jax.device_put(rng.standard_normal((n_idx, width)).astype(np.float32))
    idx_vars = []
    for s in range(3):
        ids = np.random.default_rng(s).integers(0, n_rows, size=(n_idx,))
        if sort:
            ids = np.sort(ids)
        idx_vars.append(jax.device_put(ids.astype(np.int32)))

    @jax.jit
    def run(ct, idx):
        out = jnp.zeros((n_rows, width), jnp.float32).at[idx].add(ct)
        return jnp.sum(out, axis=1)

    c = run.lower(ct, idx_vars[0]).compile()
    for i in range(2):
        _fetch(c(ct, idx_vars[i % 3]))
    t0 = time.perf_counter()
    for i in range(iters):
        _fetch(c(ct, idx_vars[i % 3]))
    return (time.perf_counter() - t0) / iters


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    n_rows = 64 ** 3
    n_idx = 1 << 23
    print(f"device={jax.devices()[0]} rows={n_rows} starts={n_idx}",
          flush=True)
    for width in (4, 8, 32, 64):
        for sort in (False, True):
            dt = time_scatter(n_rows, width, n_idx, sort=sort)
            tag = "sorted" if sort else "random"
            print(f"width={width:3d} {tag}: {dt * 1e3:8.2f} ms  "
                  f"{n_idx / dt / 1e6:7.1f} Mstarts/s", flush=True)


if __name__ == "__main__":
    main()
