"""Pallas TPU kernel for fused transmittance integration (fwd + custom VJP).

The performance path for the reference's ``hp_int`` / ``hp_samp_int_fused``
hot loop (``hotpath/src/cpu/int_cpu.cpp:173-226``,
``hotpath/src/cuda/graph_cuda.cu`` steady state): one kernel per ray tile
computes radiance/transmittance/opacity/depth entirely in VMEM.

TPU mapping:
- rays tile the sublane axis (TILE_N per program), steps lie along the lane
  axis (K padded to 128);
- the prefix sums along steps (cumulative optical depth, cumulative dt) are
  **matmuls against a constant triangular ones matrix on the MXU** - the
  canonical TPU prefix-scan, O(K^2) MACs but at MXU rates, replacing the
  reference's sequential per-sample loop;
- early termination is the monotone-prefix mask ``T_before > 1e-4``
  (see ops/integrate.py for the derivation);
- the backward kernel recomputes transmittance in-kernel (no aux storage,
  unlike the reference which persists 4 floats/sample - int_cpu.cpp:201-207)
  and needs one suffix-sum matmul:

      dL/dod_j = proc_j * dot_j * P_j - sum_{k>j} dot_k * w_k
      dsigma_j = dL/dod_j * dt_j        (od = sigma * dt)
      dcolor_{j,c} = w_j * g_c          (diff_cpu.cpp:183-185 identity)

Layout note: color channels travel as three separate (N, K) planes so every
ref keeps K on the lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvren_tpu.ops.integrate import OPACITY_EPS, STOP_THRESHOLD

DEFAULT_TILE_N = 256
LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _inclusive_tri(k: int, dtype=jnp.float32):
    """M[j, k] = 1 if j <= k, so (od @ M)_k = sum_{j<=k} od_j."""
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (row <= col).astype(dtype)


def _strict_upper(k: int, dtype=jnp.float32):
    """U[k, j] = 1 if k > j, so (x @ U)_j = sum_{k>j} x_k."""
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (row > col).astype(dtype)


def _fwd_kernel(sigma_ref, dt_ref, cr_ref, cg_ref, cb_ref, tri_ref,
                scal_ref, out_ref):
    t_near = scal_ref[0]
    t_far = scal_ref[1]

    sigma = sigma_ref[...]
    dt = dt_ref[...]
    od = jnp.maximum(sigma * dt, 0.0)

    # prefix sums on the MXU
    s_incl = jnp.dot(od, tri_ref[...], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    dts = jnp.dot(dt, tri_ref[...], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

    p = jnp.exp(-s_incl)
    t_before = jnp.exp(od - s_incl)
    proc = (dt > 0.0) & (t_before > STOP_THRESHOLD)
    procf = proc.astype(jnp.float32)
    w = (t_before - p) * procf

    rad_r = jnp.sum(w * cr_ref[...], axis=1)
    rad_g = jnp.sum(w * cg_ref[...], axis=1)
    rad_b = jnp.sum(w * cb_ref[...], axis=1)

    t_final = jnp.min(jnp.where(proc, p, 1.0), axis=1)
    opacity = 1.0 - t_final

    mid = t_near + (dts - dt) + 0.5 * dt
    depth_w = jnp.sum(w * mid, axis=1)
    depth = jnp.where(opacity > OPACITY_EPS,
                      depth_w / jnp.maximum(opacity, OPACITY_EPS), t_far)

    out_ref[:, 0] = rad_r
    out_ref[:, 1] = rad_g
    out_ref[:, 2] = rad_b
    out_ref[:, 3] = t_final
    out_ref[:, 4] = opacity
    out_ref[:, 5] = depth
    out_ref[:, 6] = jnp.zeros_like(depth)
    out_ref[:, 7] = jnp.zeros_like(depth)


def _bwd_kernel(sigma_ref, dt_ref, cr_ref, cg_ref, cb_ref, g_ref,
                tri_ref, up_ref, dsig_ref, dcr_ref, dcg_ref, dcb_ref):
    sigma = sigma_ref[...]
    dt = dt_ref[...]
    od = jnp.maximum(sigma * dt, 0.0)
    s_incl = jnp.dot(od, tri_ref[...], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    p = jnp.exp(-s_incl)
    t_before = jnp.exp(od - s_incl)
    proc = (dt > 0.0) & (t_before > STOP_THRESHOLD)
    procf = proc.astype(jnp.float32)
    w = (t_before - p) * procf

    g_r = g_ref[:, 0:1]
    g_g = g_ref[:, 1:2]
    g_b = g_ref[:, 2:3]

    dot = cr_ref[...] * g_r + cg_ref[...] * g_g + cb_ref[...] * g_b
    dotw = dot * w
    suffix = jnp.dot(dotw, up_ref[...], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    dl_dod = procf * dot * p - suffix
    dsig_ref[...] = dl_dod * dt * (sigma * dt >= 0.0)
    dcr_ref[...] = w * g_r
    dcg_ref[...] = w * g_g
    dcb_ref[...] = w * g_b


def _pad_nk(x, n_pad, k_pad):
    n, k = x.shape
    if n == n_pad and k == k_pad:
        return x
    return jnp.pad(x, ((0, n_pad - n), (0, k_pad - k)))


def _prepare(sigma, color, dt, mask, tile_n):
    n, k = sigma.shape
    k_pad = _round_up(max(k, LANE), LANE)
    n_pad = _round_up(max(n, tile_n), tile_n)
    dt_eff = jnp.where(mask, dt, 0.0).astype(jnp.float32)
    sig = _pad_nk(sigma.astype(jnp.float32), n_pad, k_pad)
    dtp = _pad_nk(dt_eff, n_pad, k_pad)
    if isinstance(color, (tuple, list)):   # SoA planes (hot path)
        cr_s, cg_s, cb_s = color
    else:
        cr_s, cg_s, cb_s = color[..., 0], color[..., 1], color[..., 2]
    cr = _pad_nk(cr_s.astype(jnp.float32), n_pad, k_pad)
    cg = _pad_nk(cg_s.astype(jnp.float32), n_pad, k_pad)
    cb = _pad_nk(cb_s.astype(jnp.float32), n_pad, k_pad)
    return sig, dtp, cr, cg, cb, n_pad, k_pad


def _fwd_call(sigma, color, dt, mask, t_near, t_far, tile_n, interpret):
    n = sigma.shape[0]
    sig, dtp, cr, cg, cb, n_pad, k_pad = _prepare(
        sigma, color, dt, mask, tile_n)
    tri = _inclusive_tri(k_pad)
    scal = jnp.asarray([t_near, t_far], jnp.float32)

    row_spec = pl.BlockSpec((tile_n, k_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((k_pad, k_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _fwd_kernel,
        grid=(n_pad // tile_n,),
        in_specs=[row_spec, row_spec, row_spec, row_spec, row_spec,
                  full_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((tile_n, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k_pad * k_pad * 2 + 10 * n_pad * k_pad,
            bytes_accessed=5 * n_pad * k_pad * 4 + n_pad * 32,
            transcendentals=2 * n_pad * k_pad,
        ),
    )(sig, dtp, cr, cg, cb, tri, scal)

    out = out[:n]
    radiance = out[:, 0:3]
    return radiance, out[:, 3], out[:, 4], out[:, 5]


def _bwd_call(sigma, color, dt, mask, g_rad, tile_n, interpret):
    n, k = sigma.shape
    sig, dtp, cr, cg, cb, n_pad, k_pad = _prepare(
        sigma, color, dt, mask, tile_n)
    g_pad = jnp.pad(g_rad.astype(jnp.float32),
                    ((0, n_pad - n), (0, 8 - 3)))
    tri = _inclusive_tri(k_pad)
    up = _strict_upper(k_pad)

    row_spec = pl.BlockSpec((tile_n, k_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((k_pad, k_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((tile_n, 8), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    shapes = jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32)
    dsig, dcr, dcg, dcb = pl.pallas_call(
        _bwd_kernel,
        grid=(n_pad // tile_n,),
        in_specs=[row_spec, row_spec, row_spec, row_spec, row_spec, g_spec,
                  full_spec, full_spec],
        out_specs=[row_spec, row_spec, row_spec, row_spec],
        out_shape=[shapes, shapes, shapes, shapes],
        interpret=interpret,
    )(sig, dtp, cr, cg, cb, g_pad, tri, up)

    d_sigma = dsig[:n, :k]
    return d_sigma, (dcr[:n, :k], dcg[:n, :k], dcb[:n, :k])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def integrate_pallas(sigma, color, dt, mask, t_near, t_far,
                     tile_n=DEFAULT_TILE_N, interpret=False):
    """Fused integration: (radiance (N,3), trans, opacity, depth (N,)).

    KEPT ABLATION - not on the production path (which is the fused tile
    kernel, ops/fused_tiles.py; the staged/streamed paths use the jnp
    ``ops.integrate``). This standalone Pallas integrator is retained as
    the measured per-op baseline the fused kernel is compared against
    (tools/pallas_probe*.py) and as the reference implementation of the
    in-kernel-recompute backward in isolation (tests/test_pallas_parity.py;
    FEATURES.md #14/15 notes the ablation status).

    Fully differentiable w.r.t. sigma and color: the radiance head (the
    ``hp_diff`` contract) runs the in-kernel recompute backward; the
    transmittance/opacity/depth heads are pulled back through the jnp
    reference math (``ops.integrate``), so a loss over ANY output head
    gets exact gradients (a silent radiance-only restriction previously
    zeroed them). ``mask``/``dt`` are non-differentiable inputs.
    """
    return _fwd_call(sigma, color, dt, mask, t_near, t_far, tile_n, interpret)


def _unwrap_primal(x):
    """Extract values from CustomVJPPrimal leaves (symbolic_zeros=True
    wraps each fwd argument leaf with .value/.perturbed)."""
    is_primal = lambda l: hasattr(l, "perturbed") and hasattr(l, "value")
    return jax.tree.map(lambda l: l.value if is_primal(l) else l, x,
                        is_leaf=is_primal)


def _vjp_fwd(sigma, color, dt, mask, t_near, t_far, tile_n, interpret):
    sigma, color, dt, mask = (
        _unwrap_primal(v) for v in (sigma, color, dt, mask))
    out = _fwd_call(sigma, color, dt, mask, t_near, t_far, tile_n, interpret)
    return out, (sigma, color, dt, mask)


def _vjp_bwd(t_near, t_far, tile_n, interpret, residuals, cotangents):
    from jax.custom_derivatives import SymbolicZero

    sigma, color, dt, mask = residuals
    g_rad, g_t, g_op, g_depth = cotangents
    zero = lambda g: isinstance(g, SymbolicZero)

    if zero(g_rad):
        d_sigma = jnp.zeros_like(sigma)
        d_planes = [jnp.zeros_like(sigma) for _ in range(3)]
    else:
        d_sigma, d_planes = _bwd_call(sigma, color, dt, mask, g_rad,
                                      tile_n, interpret)
    if isinstance(color, (tuple, list)):
        d_color = type(color)(d_planes)
    else:
        d_color = jnp.stack(list(d_planes), axis=-1)

    # Non-radiance heads: pulled back through the jnp reference
    # formulation (ops.integrate) ONLY when their cotangents are not
    # symbolic zeros - a radiance-only loss skips the cumsum pullback
    # entirely (ADVICE r2: XLA dead-code elimination of a literal-zero
    # branch is not guaranteed).
    if not (zero(g_t) and zero(g_op) and zero(g_depth)):
        from dvren_tpu.ops.integrate import integrate as _integrate_ref

        def heads(sig, col):
            out = _integrate_ref(sig, col, dt, mask, t_near, t_far,
                                 with_aux=False)
            return out.transmittance, out.opacity, out.depth

        outs, pull = jax.vjp(heads, sigma, color)
        cts = tuple(jnp.zeros_like(o) if zero(g) else g
                    for o, g in zip(outs, (g_t, g_op, g_depth)))
        ds2, dc2 = pull(cts)
        d_sigma = d_sigma + ds2
        if isinstance(color, (tuple, list)):
            d_color = type(color)(a + b for a, b in zip(d_color, dc2))
        else:
            d_color = d_color + dc2
    return d_sigma, d_color, None, None


integrate_pallas.defvjp(_vjp_fwd, _vjp_bwd, symbolic_zeros=True)
