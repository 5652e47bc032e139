"""Probe 2: per-op cost of dynamic_gather shapes + the fused-tile inner loop.

Isolates the per-op cost (probe 1's fori_loop body added ~1.5us/iter) by
unrolling 8 gathers per loop iteration, and measures the exact op mix the
fused tile kernel will execute per chunk: 2x (256,128) mega-gathers +
weight fma + repeat-broadcast table build.

    python tools/pallas_probe2.py
"""

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


def probe_unrolled(rows, outer_iters=2000, unroll=8):
    """8 dependent gathers per fori iteration: per-op cost =
    dt / (outer * unroll) once the ~1.5us/iter loop overhead amortizes."""

    def kernel(op_ref, idx_ref, out_ref):
        op = op_ref[...]
        idx0 = idx_ref[...]

        def body(i, carry):
            acc, idx = carry
            for _ in range(unroll):
                g = jnp.take_along_axis(op, idx, axis=1)
                acc = acc + g
                idx = (idx + g.astype(jnp.int32)) & 127
            return acc, idx

        acc, _ = jax.lax.fori_loop(
            0, outer_iters, body, (jnp.zeros_like(op, jnp.float32), idx0))
        out_ref[...] = acc

    rng = np.random.default_rng(0)
    op_np = rng.integers(0, 3, size=(rows, 128)).astype(np.float32)
    variants = [
        (jnp.asarray(op_np),
         jnp.asarray(np.random.default_rng(s).integers(
             0, 128, size=(rows, 128)).astype(np.int32)))
        for s in range(2)
    ]
    call = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    dt = _time(call, variants)
    n_ops = outer_iters * unroll
    return dt / n_ops


def probe_repeat(rows=32, reps=8):
    """pltpu.repeat for the table broadcast (32,128) -> (256,128)."""

    def kernel(tab_ref, out_ref):
        out_ref[...] = pltpu.repeat(tab_ref[...], reps, axis=0)

    tab = jnp.asarray(
        np.arange(rows * 128, dtype=np.float32).reshape(rows, 128))
    call = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows * reps, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    out = np.asarray(call(tab))
    # semantics check: is it tile-major [t;t;...] or element-repeat?
    tiled = np.tile(np.asarray(tab), (reps, 1))
    elem = np.repeat(np.asarray(tab), reps, axis=0)
    kind = ("tile" if np.array_equal(out, tiled)
            else "elem" if np.array_equal(out, elem) else "other")
    return kind


def probe_chunk_mix(n_chunks=2000):
    """The fused-tile per-chunk op mix at realistic shapes:
    table (32,128) -> repeat to (256,128) x2, 2 mega-gathers, 8-corner
    weight fma for 4 channels over (16,128) sample blocks."""

    def kernel(tab_ref, idx_ref, tx_ref, ty_ref, tz_ref, out_ref):
        tab = tab_ref[...]          # (32, 128)
        idx16 = idx_ref[...]        # (16, 128)
        tx, ty, tz = tx_ref[...], ty_ref[...], tz_ref[...]

        idx256 = jnp.broadcast_to(idx16[None], (16, 16, 128)).reshape(256, 128)

        def body(c, acc):
            # dependency: perturb idx from acc
            idx = (idx256 + acc.astype(jnp.int32)[:1].reshape(1, 128)) & 127
            g1 = jnp.take_along_axis(
                pltpu.repeat(tab[:16], 16, axis=0), idx, axis=1)
            g2 = jnp.take_along_axis(
                pltpu.repeat(tab[16:], 16, axis=0), idx, axis=1)
            wx0, wx1 = 1.0 - tx, tx
            wy0, wy1 = 1.0 - ty, ty
            wz0, wz1 = 1.0 - tz, tz
            w = [wz0 * wy0 * wx0, wz0 * wy0 * wx1, wz0 * wy1 * wx0,
                 wz0 * wy1 * wx1, wz1 * wy0 * wx0, wz1 * wy0 * wx1,
                 wz1 * wy1 * wx0, wz1 * wy1 * wx1]
            sig = jnp.zeros((16, 128), jnp.float32)
            cr = jnp.zeros((16, 128), jnp.float32)
            cg = jnp.zeros((16, 128), jnp.float32)
            cb = jnp.zeros((16, 128), jnp.float32)
            for c8 in range(4):
                sig = sig + w[c8] * jax.lax.dynamic_slice_in_dim(
                    g1, c8 * 64, 16, 0)[:16]
                cr = cr + w[c8] * g1[pl.ds(c8 * 16 + 16 - 16, 16), :]
                cg = cg + w[c8 + 4] * g2[pl.ds(c8 * 16, 16), :]
                cb = cb + w[c8 + 4] * g2[pl.ds(c8 * 16 + 112, 16), :]
            return acc + jnp.sum(sig + cr + cg + cb, axis=0, keepdims=True)

        acc = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros((1, 128), jnp.float32))
        out_ref[...] = acc

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 3, size=(32, 128)).astype(np.float32))
    variants = []
    for s in range(2):
        r = np.random.default_rng(s)
        variants.append((
            tab,
            jnp.asarray(r.integers(0, 128, size=(16, 128)).astype(np.int32)),
            jnp.asarray(r.uniform(size=(16, 128)).astype(np.float32)),
            jnp.asarray(r.uniform(size=(16, 128)).astype(np.float32)),
            jnp.asarray(r.uniform(size=(16, 128)).astype(np.float32)),
        ))
    call = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    dt = _time(call, variants)
    return dt / n_chunks  # seconds per chunk of 2048 samples


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device={jax.devices()[0]}", flush=True)

    try:
        kind = probe_repeat()
        print(f"pltpu.repeat (32,128)x8 axis=0: OK, semantics={kind}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pltpu.repeat: UNSUPPORTED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]})", flush=True)

    for rows in (16, 64, 256, 512):
        try:
            per_op = probe_unrolled(rows)
            print(f"dynamic_gather axis=1 ({rows},128) unrolled: "
                  f"{per_op * 1e9:.0f} ns/op -> "
                  f"{rows * 128 / per_op / 1e9:.1f} G elems/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"({rows},128) unrolled: UNSUPPORTED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)

    try:
        per_chunk = probe_chunk_mix()
        rate = 2048 / per_chunk
        print(f"fused-chunk mix: {per_chunk * 1e6:.2f} us/chunk "
              f"(2048 samples) -> {rate / 1e9:.2f} G samples/s "
              f"-> 18.9M samples in {18.9e6 / rate * 1e3:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fused-chunk mix: FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]})", flush=True)


if __name__ == "__main__":
    main()
