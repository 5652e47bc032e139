"""Raw HBM streaming bandwidth + pallas block-copy bandwidth on this chip.

Calibrates the roofline the tile kernel designs against: if plain XLA
copies also cap well below spec, the lever is BYTES (schedule compression),
not DMA count.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _time_compiled


def log(msg):
    print(f"[hbm] {msg}", file=sys.stderr, flush=True)


def main():
    log(f"device={jax.devices()[0]}")
    n = 64 << 20  # 256 MB f32
    x = jnp.ones((n,), jnp.float32)
    KF = 8
    scales = jnp.linspace(1.0, 1.01, KF)

    # A. XLA elementwise copy (read n + write n)
    def copy_reps(scales, x):
        def one(carry, s):
            y = x * s
            return carry, y[::65537].sum()
        return jax.lax.scan(one, 0.0, scales)[1]
    c = jax.jit(copy_reps).lower(scales, x).compile()
    s = _time_compiled(c, [(scales, x), (scales * 1.003, x)], iters=3) / KF
    log(f"XLA copy 256MB: {s * 1e3:.2f} ms -> {2 * n * 4 / s / 1e9:.0f} GB/s")

    # B. XLA reduction (read n)
    def red_reps(scales, x):
        def one(carry, s):
            return carry, (x * s).sum()
        return jax.lax.scan(one, 0.0, scales)[1]
    c = jax.jit(red_reps).lower(scales, x).compile()
    s = _time_compiled(c, [(scales, x), (scales * 1.003, x)], iters=3) / KF
    log(f"XLA reduce 256MB: {s * 1e3:.2f} ms -> {n * 4 / s / 1e9:.0f} GB/s")

    # C. pallas pass-through copy, 2 MB blocks
    m = 32 << 20  # 128 MB f32
    xb = jnp.ones((m // (128 * 128), 128, 128), jnp.float32)  # (2048,128,128)
    BLK = 32  # 2 MB blocks

    def k_copy(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def pallas_copy(x):
        return pl.pallas_call(
            k_copy,
            grid=(x.shape[0] // BLK,),
            in_specs=[pl.BlockSpec((BLK, 128, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((BLK, 128, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    def pc_reps(scales, x):
        def one(carry, s):
            y = pallas_copy(x * s)
            return carry, y[::431, 0, 0].sum()
        return jax.lax.scan(one, 0.0, scales)[1]
    c = jax.jit(pc_reps).lower(scales, xb).compile()
    s = _time_compiled(c, [(scales, xb), (scales * 1.003, xb)], iters=3) / KF
    # x*s copy: 2*m*4 bytes; pallas read m*4 + write m*4
    log(f"pallas copy 128MB (2MB blocks, incl. x*s copy): {s * 1e3:.2f} ms "
        f"-> {4 * m * 4 / s / 1e9:.0f} GB/s aggregate")

    # D. pallas read-only reduce with small output, 2 MB blocks
    def k_sum(x_ref, o_ref):
        o_ref[...] = jnp.sum(x_ref[...], axis=0)

    def pallas_sum(x):
        return pl.pallas_call(
            k_sum,
            grid=(x.shape[0] // BLK,),
            in_specs=[pl.BlockSpec((BLK, 128, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (x.shape[0] // BLK, 128, 128), x.dtype),
        )(x)

    def ps_reps(scales, x):
        def one(carry, s):
            y = pallas_sum(x * s)
            return carry, y[::13, 0, 0].sum()
        return jax.lax.scan(one, 0.0, scales)[1]
    c = jax.jit(ps_reps).lower(scales, xb).compile()
    s = _time_compiled(c, [(scales, xb), (scales * 1.003, xb)], iters=3) / KF
    log(f"pallas reduce 128MB (2MB blocks, incl. x*s copy): {s * 1e3:.2f} ms "
        f"-> {3 * m * 4 / s / 1e9:.0f} GB/s aggregate")


if __name__ == "__main__":
    main()
