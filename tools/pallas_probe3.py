"""Probe 3: dynamic_gather throughput WITHOUT a serializing dependency
chain (probe 2 chained idx through f32->i32 converts: ~2us/op flat was
latency, not throughput), plus the realistic fused-chunk op mix.

    python tools/pallas_probe3.py
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


def probe_independent(rows, outer_iters=1000, unroll=8):
    """8 INDEPENDENT gathers per iteration (precomputed index variants,
    results only joined through adds): measures pipelined throughput."""

    def kernel(op_ref, idx_ref, out_ref):
        op = op_ref[...]
        idxs = [idx_ref[i] for i in range(unroll)]   # (unroll, rows, 128)

        def body(i, acc):
            # cheap scalar-ish perturbation that does not read gather output
            for u in range(unroll):
                g = jnp.take_along_axis(op, idxs[u], axis=1)
                acc = acc + g
            return acc

        out_ref[...] = jax.lax.fori_loop(
            0, outer_iters, body, jnp.zeros_like(op, jnp.float32))

    rng = np.random.default_rng(0)
    op_np = rng.integers(0, 3, size=(rows, 128)).astype(np.float32)
    variants = [
        (jnp.asarray(op_np),
         jnp.asarray(np.random.default_rng(s).integers(
             0, 128, size=(unroll, rows, 128)).astype(np.int32)))
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
    per_op = dt / (outer_iters * unroll)
    return per_op


def probe_chunk_mix(n_chunks=2000):
    """Realistic fused-chunk op mix: 2x (256,128) mega-gathers over a
    repeat-tiled 32-row table, broadcast idx build, 8-corner weight fma
    into 4 channel planes of (16,128)."""

    def kernel(tab_ref, idx_ref, tx_ref, ty_ref, tz_ref, out_ref):
        tab = tab_ref[...]          # (32, 128): rows = corner*4 + channel
        idx16 = idx_ref[...]        # (16, 128)
        tx, ty, tz = tx_ref[...], ty_ref[...], tz_ref[...]

        def body(c, accs):
            sig_a, cr_a, cg_a, cb_a = accs
            # vary indices per chunk cheaply (no gather-output dependency)
            idx = (idx16 + c) & 127
            wx0, wx1 = 1.0 - tx, tx
            wy0, wy1 = 1.0 - ty, ty
            wz0, wz1 = 1.0 - tz, tz
            w = [wz0 * wy0 * wx0, wz0 * wy0 * wx1, wz0 * wy1 * wx0,
                 wz0 * wy1 * wx1, wz1 * wy0 * wx0, wz1 * wy0 * wx1,
                 wz1 * wy1 * wx0, wz1 * wy1 * wx1]
            planes = [jnp.zeros((16, 128), jnp.float32) for _ in range(4)]
            for c8 in range(8):
                for ch in range(4):
                    row = jnp.broadcast_to(
                        tab[c8 * 4 + ch][None, :], (16, 128))
                    g = jnp.take_along_axis(row, idx, axis=1)
                    planes[ch] = planes[ch] + w[c8] * g
            return (sig_a + planes[0], cr_a + planes[1],
                    cg_a + planes[2], cb_a + planes[3])

        z = jnp.zeros((16, 128), jnp.float32)
        sig, cr, cg, cb = jax.lax.fori_loop(
            0, n_chunks, body, (z, z, z, z))
        out_ref[...] = sig + cr + cg + cb

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
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    dt = _time(call, variants)
    return dt / n_chunks


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device={jax.devices()[0]}", flush=True)

    for rows in (16, 256, 512):
        try:
            per_op = probe_independent(rows)
            print(f"independent dynamic_gather ({rows},128): "
                  f"{per_op * 1e9:.0f} ns/op -> "
                  f"{rows * 128 / per_op / 1e9:.1f} G elems/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"({rows},128) independent: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)

    try:
        per_chunk = probe_chunk_mix()
        rate = 2048 / per_chunk
        print(f"fused-chunk mix: {per_chunk * 1e6:.2f} us/chunk "
              f"(2048 samples) -> {rate / 1e9:.2f} G samples/s "
              f"-> 18.9M samples in {18.9e6 / rate * 1e3:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fused-chunk mix: FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]})", flush=True)


if __name__ == "__main__":
    main()
