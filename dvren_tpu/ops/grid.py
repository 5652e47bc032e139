"""Dense voxel grid field evaluation: nearest / trilinear, OOB zero / clamp.

TPU-native replacement for ``hotpath/src/cpu/grid_dense_cpu.cpp:56-245``:
batched gathers over a (Z, Y, X[, C]) grid instead of a per-sample fetch
lambda. Written as one differentiable jnp program - its ``jax.vjp`` w.r.t.
the grid *is* the trilinear 8-corner scatter-add the reference hand-codes in
``src/fields/dense_grid.cpp:171-309`` (deterministic on TPU), and its vjp
w.r.t. positions feeds camera gradients.

Coordinate convention (grid_dense_cpu.cpp:94-119,157-159): world position is
normalized by the field bbox to local in [0,1], then scaled by (n-1) so voxel
centers sit at the lattice points. OOB_ZERO returns 0 outside; OOB_CLAMP
clamps local coords into [0,1].

Note: the reference *forward* hardcodes the bbox to [0,1]^3
(hp_internal.hpp:29-30) while its gradient scatter honors the configured bbox
(dense_grid.cpp:201-213) - a forward/backward inconsistency we do not
replicate: here one bbox is honored on both sides by construction.

Nearest rounding matches C++ ``std::round`` (half away from zero) via
``floor(x + 0.5)``; jnp.round would round half to even.
"""

from __future__ import annotations

import jax.numpy as jnp

from dvren_tpu.core.plan import InterpMode, OobPolicy


def _local_coords(positions, bbox_min, bbox_max, oob: OobPolicy):
    """World -> [0,1] local coords + outside mask (grid_dense_cpu.cpp:94-119)."""
    bbox_min = jnp.asarray(bbox_min, jnp.float32)
    bbox_max = jnp.asarray(bbox_max, jnp.float32)
    extent = bbox_max - bbox_min
    safe = jnp.where(extent != 0.0, extent, 1.0)
    local = jnp.where(extent != 0.0, (positions - bbox_min) / safe, 0.0)
    outside = jnp.any((local < 0.0) | (local > 1.0), axis=-1)
    if oob == OobPolicy.CLAMP:
        local = jnp.clip(local, 0.0, 1.0)
        outside = jnp.zeros_like(outside)
    return local, outside


def _lattice_coords(local, shape_xyz):
    """[0,1] local -> continuous lattice coords fx, fy, fz in [0, n-1]."""
    nx, ny, nz = shape_xyz
    scale = jnp.asarray(
        [float(nx - 1), float(ny - 1), float(nz - 1)], jnp.float32)
    return local * scale


def _gather(grid, ix, iy, iz):
    """grid[(z, y, x)] batched gather; indices are in-bounds by construction.

    grid: (Z, Y, X) or (Z, Y, X, C); index arrays share a common shape.
    """
    return grid[iz, iy, ix]


def _interp_weights(f):
    """Per-axis floor indices + fractions. f: (..., 3) lattice coords."""
    i0 = jnp.floor(f).astype(jnp.int32)
    frac = f - i0.astype(jnp.float32)
    return i0, frac


def eval_grid(
    grid: jnp.ndarray,
    positions: jnp.ndarray,
    bbox_min,
    bbox_max,
    interp: InterpMode = InterpMode.LINEAR,
    oob: OobPolicy = OobPolicy.ZERO,
) -> jnp.ndarray:
    """Evaluate a dense grid at world positions.

    grid: (Z, Y, X) scalar field or (Z, Y, X, C) vector field, any float dtype
          (accumulation runs in float32).
    positions: (..., 3) world coordinates in xyz order.
    Returns (...,) or (..., C) float32.
    """
    scalar = grid.ndim == 3
    nz, ny, nx = grid.shape[0], grid.shape[1], grid.shape[2]

    local, outside = _local_coords(positions, bbox_min, bbox_max, oob)
    f = _lattice_coords(local, (nx, ny, nz))
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    if interp == InterpMode.NEAREST:
        # round-half-away-from-zero for non-negative coords
        ix = jnp.clip(jnp.floor(fx + 0.5).astype(jnp.int32), 0, nx - 1)
        iy = jnp.clip(jnp.floor(fy + 0.5).astype(jnp.int32), 0, ny - 1)
        iz = jnp.clip(jnp.floor(fz + 0.5).astype(jnp.int32), 0, nz - 1)
        out = _gather(grid, ix, iy, iz).astype(jnp.float32)
    else:
        ix0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 1)
        iy0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny - 1)
        iz0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, nz - 1)
        ix1 = jnp.minimum(ix0 + 1, nx - 1)
        iy1 = jnp.minimum(iy0 + 1, ny - 1)
        iz1 = jnp.minimum(iz0 + 1, nz - 1)
        tx = (fx - ix0.astype(jnp.float32))
        ty = (fy - iy0.astype(jnp.float32))
        tz = (fz - iz0.astype(jnp.float32))
        if not scalar:
            tx = tx[..., None]
            ty = ty[..., None]
            tz = tz[..., None]

        c000 = _gather(grid, ix0, iy0, iz0).astype(jnp.float32)
        c100 = _gather(grid, ix1, iy0, iz0).astype(jnp.float32)
        c010 = _gather(grid, ix0, iy1, iz0).astype(jnp.float32)
        c110 = _gather(grid, ix1, iy1, iz0).astype(jnp.float32)
        c001 = _gather(grid, ix0, iy0, iz1).astype(jnp.float32)
        c101 = _gather(grid, ix1, iy0, iz1).astype(jnp.float32)
        c011 = _gather(grid, ix0, iy1, iz1).astype(jnp.float32)
        c111 = _gather(grid, ix1, iy1, iz1).astype(jnp.float32)

        # Same lerp chain as trilinear_sample (grid_dense_cpu.cpp:57-85).
        c00 = c000 + (c100 - c000) * tx
        c10 = c010 + (c110 - c010) * tx
        c01 = c001 + (c101 - c001) * tx
        c11 = c011 + (c111 - c011) * tx
        c0 = c00 + (c10 - c00) * ty
        c1 = c01 + (c11 - c01) * ty
        out = c0 + (c1 - c0) * tz

    zero_mask = outside if scalar else outside[..., None]
    return jnp.where(zero_mask, 0.0, out)


def scatter_grid_grads(
    grid_shape: tuple[int, ...],
    positions: jnp.ndarray,
    sample_grads: jnp.ndarray,
    bbox_min,
    bbox_max,
    interp: InterpMode = InterpMode.LINEAR,
    oob: OobPolicy = OobPolicy.ZERO,
) -> jnp.ndarray:
    """Scatter per-sample gradients back into a voxel grid.

    The analogue of ``DenseGridField::AccumulateSampleGradients``
    (dense_grid.cpp:171-309), derived as the exact vjp of :func:`eval_grid`
    so forward and backward interpolation weights always agree. XLA
    scatter-add is deterministic on TPU, matching the reference's ordered
    CPU accumulation.
    """
    import jax

    zeros = jnp.zeros(grid_shape, jnp.float32)

    def f(grid):
        return eval_grid(grid, positions, bbox_min, bbox_max, interp, oob)

    _, vjp = jax.vjp(f, zeros)
    (grads,) = vjp(sample_grads.astype(jnp.float32))
    return grads
