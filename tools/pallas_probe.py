"""Microbenchmark: Mosaic in-kernel gather primitives on the real TPU.

Design question for the fused render kernel: past the XLA row-gather rate
(~150M starts/s at 2-byte elements, scalar-issue bound), the only vectorized
random-access primitive Mosaic exposes is ``tpu.dynamic_gather`` via
``jnp.take_along_axis(op, idx, axis)`` with op/idx/out all the same 2D shape:

  axis=1: out[i, j] = op[i, idx[i, j]]   (per-row 128-lane table shuffle)
  axis=0: out[i, j] = op[idx[i, j], j]   (per-lane sublane-table shuffle)

If axis=1 runs at ~1 elem/lane/cycle, a (32, 128) op moves 32 channels x 128
samples per few cycles => O(10^9) gathered samples/s, two orders past the XLA
ceiling - enough to build a VMEM-staged fused trilinear+integration kernel.

Run on the real TPU (serialize with other JAX processes):
    python tools/pallas_probe.py
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


def _fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def _time(fn, variants, iters=4, warmup=2):
    for i in range(warmup):
        _fetch(fn(*variants[i % len(variants)]))
    t0 = time.perf_counter()
    for i in range(iters):
        _fetch(fn(*variants[i % len(variants)]))
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- probes

def probe_dynamic_gather(rows, axis, inner_iters, dtype=jnp.float32):
    """In-kernel take_along_axis rate: (rows, 128) op, looped with a data
    dependency so Mosaic cannot hoist it."""

    def kernel(op_ref, idx_ref, out_ref):
        op = op_ref[...]
        idx = idx_ref[...]

        def body(i, carry):
            acc, cur_idx = carry
            g = jnp.take_along_axis(op, cur_idx, axis=axis)
            acc = acc + g
            # feed gathered data back into the indices (dependency chain)
            nxt = (cur_idx + g.astype(jnp.int32)) % op.shape[axis]
            return acc, nxt

        acc, _ = jax.lax.fori_loop(
            0, inner_iters, body,
            (jnp.zeros_like(op, jnp.float32), idx))
        out_ref[...] = acc

    rng = np.random.default_rng(0)
    op_np = rng.integers(0, 3, size=(rows, 128)).astype(np.float32)
    variants = []
    for s in range(2):
        idx_np = np.random.default_rng(s).integers(
            0, rows if axis == 0 else 128, size=(rows, 128)).astype(np.int32)
        variants.append((jnp.asarray(op_np, dtype), jnp.asarray(idx_np)))

    call = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    dt = _time(call, variants)
    elems = rows * 128 * inner_iters
    return dt, elems


def probe_scalar_row_gather(n_rows, width, n_idx):
    """fori_loop of scalar-indexed VMEM row loads (the naive gather)."""

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, _):
            r = idx_ref[i]
            out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, n_idx, body, 0)

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.uniform(size=(n_rows, width)), jnp.float32)
    variants = [
        (tab, jnp.asarray(np.random.default_rng(s).integers(
            0, n_rows, size=(n_idx,)), jnp.int32))
        for s in range(2)
    ]
    call = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_idx, width), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    dt = _time(call, variants)
    return dt, n_idx


def probe_xla_take_dtype(n_rows, width_bytes, n_idx, dtype):
    """XLA jnp.take row-gather rate by element type (u8/u16/u32)."""
    itemsize = np.dtype(dtype).itemsize
    width = width_bytes // itemsize
    rng = np.random.default_rng(0)
    tab = jnp.asarray(
        rng.integers(0, 100, size=(n_rows, width)), dtype)
    variants = [
        (jnp.asarray(np.random.default_rng(s).integers(
            0, n_rows, size=(n_idx,)), jnp.int32),)
        for s in range(2)
    ]

    @jax.jit
    def run(idx):
        rows = jnp.take(tab, idx, axis=0)
        return jnp.sum(rows.astype(jnp.int32), axis=1)

    dt = _time(run, variants)
    return dt, n_idx


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device={jax.devices()[0]}", flush=True)

    only = sys.argv[1] if len(sys.argv) > 1 else ""

    if only in ("", "dg"):
        for axis in (1, 0):
            for rows in (8, 32, 256):
                try:
                    dt, elems = probe_dynamic_gather(rows, axis, 20000)
                    print(f"dynamic_gather axis={axis} op=({rows},128) f32: "
                          f"{dt * 1e3:.2f} ms -> "
                          f"{elems / dt / 1e9:.2f} G elems/s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"dynamic_gather axis={axis} op=({rows},128): "
                          f"UNSUPPORTED ({type(e).__name__}: "
                          f"{str(e).splitlines()[0][:120]})", flush=True)

    if only in ("", "scalar"):
        try:
            dt, n = probe_scalar_row_gather(4096, 128, 1 << 13)
            print(f"scalar row gather (4096,128)->{1 << 13}: "
                  f"{dt * 1e3:.2f} ms -> {n / dt / 1e6:.1f} Mrows/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"scalar row gather: UNSUPPORTED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)

    if only in ("", "xla"):
        for dtype in (jnp.uint8, jnp.uint16, jnp.uint32):
            dt, n = probe_xla_take_dtype(64 ** 3, 128, 1 << 23, dtype)
            print(f"XLA take rows of 128B as {np.dtype(dtype).name}: "
                  f"{dt * 1e3:.2f} ms -> {n / dt / 1e6:.1f} Mstarts/s",
                  flush=True)


if __name__ == "__main__":
    main()
