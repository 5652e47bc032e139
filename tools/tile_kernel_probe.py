"""Isolate the fused tile kernel's cost structure on the real TPU.

Times the raw pallas_call on one synthetic group (T tiles, nc chunks) with
the K-reps-per-dispatch methodology (the tunnel serializes dispatches at
~36 ms: single-dispatch timing measures the harness). The packed-layout
kernel (tabs + one samp array + one output) is blocked G tiles per grid
step; the G sweep shows the DMA-issue amortization (measured floor: ~1.3
us/chunk at G=1 was ~100% DMA overhead). Reduce/gather ablations on top.

    python tools/tile_kernel_probe.py
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
from dvren_tpu.ops import fused_tiles as ft


def log(msg):
    print(f"[tile_kernel_probe] {msg}", file=sys.stderr, flush=True)


T, NC, KF = 512, 8, 8

# "none" gather: planes straight from fracs - isolates the integration.
ft._GATHER_IMPLS.setdefault(
    "none", lambda tabs, lidx, fr: (fr[0], fr[1], fr[2], fr[3]))


def kernel_noop(ke_ref, tabs_ref, samp_ref, base_ref, rayt_ref, out_ref,
                *, g_tiles, **kw):
    """DMA-only floor: touch the blocks, no compute."""
    v = (tabs_ref[0, 0, 0:16, :128] + samp_ref[0, 0, 0] + rayt_ref[0, 0])
    for g in range(g_tiles):
        for i in range(5):
            out_ref[g, i] = v


KERNELS = {"full": ft._fwd_kernel, "noop": kernel_noop}


def synth(seed=0):
    rng = np.random.default_rng(seed)
    tabs = jnp.asarray(rng.uniform(0, 4, (T, NC, 32, 128)).astype(np.float32))
    samp = rng.uniform(0.2, 2.0, (T, NC, 2, 16, 128)).astype(np.float32)
    samp[:, :, 1] = (rng.integers(0, 128, (T, NC, 16, 128)).astype(np.int32)
                     | (1 << 15)).view(np.float32)
    samp = jnp.asarray(samp)
    base = jnp.asarray(
        rng.integers(0, 62, (T, NC, 3, 128)).astype(np.float32))
    rayt = jnp.asarray(
        rng.uniform(-1, 1, (T, 6, 16, 128)).astype(np.float32))
    ke = jnp.asarray(rng.integers(0, 16, (T,)).astype(np.int32))
    return tabs, samp, base, rayt, ke


def run(tag, kernel_kw, variant="full", parallel=False):
    kw = dict(nc=NC, g_tiles=4, dt=2.0 / 128, t_near=0.2, t_far=2.2,
              k_max=128, stop=1e-4, reduce="mxu", gather="dg",
              lo=(0.0, 0.0, 0.0), inv=(1.0, 1.0, 1.0),
              ns=(63.0, 63.0, 63.0))
    kw.update(kernel_kw)
    G = kw["g_tiles"]

    def fwd_call(tabs, samp, base, rayt, ke):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // G,),
            in_specs=[
                pl.BlockSpec((G, NC, 32, 128), lambda i, ke: (i, 0, 0, 0)),
                pl.BlockSpec((G, NC, 2, 16, 128),
                             lambda i, ke: (i, 0, 0, 0, 0)),
                pl.BlockSpec((G, NC, 3, 128), lambda i, ke: (i, 0, 0, 0)),
                pl.BlockSpec((G, 6, 16, 128), lambda i, ke: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((G, 5, 16, 128),
                                   lambda i, ke: (i, 0, 0, 0)),
        )
        params = {}
        if parallel:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            functools.partial(KERNELS[variant], **kw),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, 5, 16, 128), jnp.float32),
            **params,
        )(ke, tabs, samp, base, rayt)

    tabs, samp, base, rayt, ke = synth(0)
    scales = jnp.linspace(1.0, 1.01, KF)

    def reps(scales):
        def one(carry, s):
            out = fwd_call(tabs * s, samp, base, rayt, ke)
            return carry, out[::37, 0, 0, ::31].sum()
        return jax.lax.scan(one, 0.0, scales)[1]

    f = jax.jit(reps)
    t0 = time.perf_counter()
    c = f.lower(scales).compile()
    dt_c = time.perf_counter() - t0
    s = _time_compiled(c, [(scales,), (scales * 1.003,)], iters=4) / KF
    us_chunk = s * 1e6 / (T * NC)
    log(f"{tag:36s} {s * 1e3:7.2f} ms  {us_chunk:6.3f} us/chunk  "
        f"(compile {dt_c:.0f}s)")
    return s


if __name__ == "__main__":
    run("noop G=4", {}, "noop")
    run("noop G=4 parallel", {}, "noop", parallel=True)
    run("full dg G=4", {})
    run("full dg G=4 parallel", {}, parallel=True)
    run("full dg G=8 parallel", dict(g_tiles=8), parallel=True)
    run("full dg G=1 parallel", dict(g_tiles=1), parallel=True)
