"""Isolate the fused tile kernel's cost structure on the real TPU.

Times the raw pallas_call on one synthetic group (T tiles, nc chunks) for
both gather modes, plus ablations that stub out stages, to find where the
~10us/chunk observed at the headline goes.

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


T, NC = 512, 8


def synth(seed=0):
    rng = np.random.default_rng(seed)
    tabs = jnp.asarray(rng.uniform(0, 4, (T, NC, 32, 128)).astype(np.float32))
    lidx = jnp.asarray(rng.integers(0, 128, (T, NC, 16, 128)).astype(np.int32))
    fr = rng.uniform(0, 1, (T, NC, 4, 16, 128)).astype(np.float32)
    fr[:, :, 3] = (fr[:, :, 3] > 0.1).astype(np.float32)
    fracs = jnp.asarray(fr)
    ke = jnp.asarray(rng.integers(0, 16, (T,)).astype(np.int32))
    return tabs, lidx, fracs, ke


def run(tag, kernel_kw, variant="full"):
    kw = dict(nc=NC, dt=2.0 / 128, t_near=0.2, t_far=2.2, k_max=128,
              stop=1e-4, **kernel_kw)

    def fwd_call(tabs, lidx, fracs, ke):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, NC, 32, 128), lambda i, ke: (i, 0, 0, 0)),
                pl.BlockSpec((1, NC, 16, 128), lambda i, ke: (i, 0, 0, 0)),
                pl.BlockSpec((1, NC, 4, 16, 128),
                             lambda i, ke: (i, 0, 0, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((1, 16, 128), lambda i, ke: (i, 0, 0))
                       for _ in range(5)],
        )
        return pl.pallas_call(
            functools.partial(KERNELS[variant], **kw),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((T, 16, 128), jnp.float32)] * 5,
        )(ke, tabs, lidx, fracs)

    a = synth(0)
    b = synth(1)
    f = jax.jit(fwd_call)
    t0 = time.perf_counter()
    c = f.lower(*a).compile()
    dt_c = time.perf_counter() - t0
    s = _time_compiled(c, [a, b], iters=10)
    us_chunk = s * 1e6 / (T * NC)
    log(f"{tag:34s} {s * 1e3:7.2f} ms  {us_chunk:6.2f} us/chunk  "
        f"(compile {dt_c:.0f}s)")
    return s


def kernel_gather_only(ke_ref, tabs_ref, lidx_ref, fracs_ref,
                       r_ref, g_ref, b_ref, wd_ref, odp_ref,
                       *, nc, dt, t_near, t_far, k_max, stop, gather):
    """Gather+trilinear only; integration stubbed to a running sum."""
    zeros = jnp.zeros((16, 128), jnp.float32)

    def chunk(c, carry):
        acc = carry
        sig, cr, cg, cb = ft._GATHER_IMPLS[gather](
            tabs_ref[0, c], lidx_ref[0, c], fracs_ref[0, c])
        return acc + sig + cr + cg + cb

    acc = jax.lax.fori_loop(0, nc, chunk, zeros)
    r_ref[0] = acc
    g_ref[0] = acc
    b_ref[0] = acc
    wd_ref[0] = acc
    odp_ref[0] = acc


def kernel_integrate_only(ke_ref, tabs_ref, lidx_ref, fracs_ref,
                          r_ref, g_ref, b_ref, wd_ref, odp_ref,
                          *, nc, dt, t_near, t_far, k_max, stop, gather):
    """Integration matmuls only; planes stubbed from fracs (no gather)."""
    ke = ke_ref[pl.program_id(0)]
    m_excl, m_all, _ = ft._group_matrices()
    consts = (dt, t_near, t_far, k_max)
    t_origin = jnp.float32(t_near) + ke.astype(jnp.float32) * jnp.float32(dt)
    zeros = jnp.zeros((16, 128), jnp.float32)
    init = (zeros, zeros, zeros, zeros, zeros, zeros,
            jnp.full((16, 128), t_origin, jnp.float32))

    def chunk(c, carry):
        acc_r, acc_g, acc_b, acc_wd, acc_odp, carry_od, carry_t = carry
        fr = fracs_ref[0, c]
        sig, cr, cg, cb = fr[0], fr[1], fr[2], fr[3]
        livef, dta = ft._chunk_geometry(ke, c, consts)
        od = jnp.maximum(sig * dta, 0.0) * livef
        excl = jnp.dot(od, m_excl, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        s_pre = carry_od + excl
        tb = jnp.exp(-s_pre)
        p = jnp.exp(-(s_pre + od))
        procf = livef * (tb > jnp.float32(stop)).astype(jnp.float32)
        w = (tb - p) * procf
        tcur = carry_t + jnp.dot(dta, m_excl,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        mid = tcur + 0.5 * dta
        cat = jnp.concatenate(
            [w * cr, w * cg, w * cb, w * mid, od * procf, od, dta], axis=0)
        sums = jnp.dot(cat, m_all, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return (acc_r + sums[0:16], acc_g + sums[16:32],
                acc_b + sums[32:48], acc_wd + sums[48:64],
                acc_odp + sums[64:80], carry_od + sums[80:96],
                carry_t + sums[96:112])

    acc_r, acc_g, acc_b, acc_wd, acc_odp, _, _ = jax.lax.fori_loop(
        0, nc, chunk, init)
    r_ref[0] = acc_r
    g_ref[0] = acc_g
    b_ref[0] = acc_b
    wd_ref[0] = acc_wd
    odp_ref[0] = acc_odp


def kernel_noop(ke_ref, tabs_ref, lidx_ref, fracs_ref,
                r_ref, g_ref, b_ref, wd_ref, odp_ref, **kw):
    """DMA-only floor: touch the blocks, no compute."""
    v = (tabs_ref[0, 0, 0:16, :] + lidx_ref[0, 0].astype(jnp.float32)
         + fracs_ref[0, 0, 0])
    r_ref[0] = v
    g_ref[0] = v
    b_ref[0] = v
    wd_ref[0] = v
    odp_ref[0] = v


KERNELS = {
    "full": ft._fwd_kernel,
    "gather_only": kernel_gather_only,
    "integrate_only": kernel_integrate_only,
    "noop": kernel_noop,
}

if __name__ == "__main__":
    run("noop (DMA floor)", dict(gather="mxu"), "noop")
    run("integrate_only (HIGHEST)", dict(gather="mxu"), "integrate_only")
    run("gather_only mxu", dict(gather="mxu"), "gather_only")
    run("gather_only dg", dict(gather="dg"), "gather_only")
    run("full mxu", dict(gather="mxu"), "full")
    run("full dg", dict(gather="dg"), "full")
