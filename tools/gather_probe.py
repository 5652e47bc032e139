"""Microbenchmark: XLA TPU gather throughput vs row width.

Answers one design question: is a packed-table row gather per-START bound
(cost independent of row width) up to the ~432B rows a 2-sample
super-stencil needs (27 corners x 4 channels), or does widening rows past
the current 32-float stencil (ops/grid.py::build_packed_stencil) start
paying per-byte?  If 108-wide rows gather at the 32-wide rate, pairing two
march samples per gather halves the start count - the measured forward
bottleneck (README "Performance notes").

Run on the real TPU (serialize with other JAX processes):
    python tools/gather_probe.py
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


def time_width(n_rows, width, n_idx, iters=6):
    table = jnp.asarray(
        np.random.default_rng(0).uniform(size=(n_rows, width)),
        jnp.float32)
    idx_vars = [
        jnp.asarray(np.random.default_rng(s).integers(
            0, n_rows, size=(n_idx,)), jnp.int32)
        for s in range(3)
    ]

    @jax.jit
    def run(idx):
        rows = jnp.take(table, idx, axis=0)  # (n_idx, width) gather
        return jnp.sum(rows, axis=1)         # force materialization

    compiled = run.lower(idx_vars[0]).compile()
    for i in range(2):
        _fetch(compiled(idx_vars[i % 3]))
    t0 = time.perf_counter()
    for i in range(iters):
        _fetch(compiled(idx_vars[i % 3]))
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    n_rows = 64 ** 3
    n_idx = 1 << 23  # ~8.4M gather starts, ~bench scale
    print(f"device={jax.devices()[0]} rows={n_rows} starts={n_idx}",
          flush=True)
    for width in (8, 32, 64, 108, 128, 256):
        dt = time_width(n_rows, width, n_idx)
        rate = n_idx / dt / 1e6
        gb = n_idx * width * 4 / dt / 1e9
        print(f"width={width:4d}  {dt * 1e3:8.2f} ms  "
              f"{rate:7.1f} Mstarts/s  {gb:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
