"""Dense voxel grid field: sigma (Z,Y,X) + color (Z,Y,X,3) with gradients.

The analogue of ``dvren::DenseGridField`` (reference
``include/dvren/fields/dense_grid.hpp:13-78``, ``src/fields/dense_grid.cpp``).
The field is a JAX pytree: its arrays flow through jit/grad/shard_map, and
its static configuration (interp, oob, bbox) is part of the jit cache key.

Unlike the reference - where the hotpath forward hardcodes the bbox to
[0,1]^3 (hp_internal.hpp:29-30) while the gradient scatter honors the
configured bbox (dense_grid.cpp:201-213) - a single bbox is honored on both
sides here by construction.

Gradient accumulation state is explicit and functional: ``zero_grads`` makes
a zeroed grad pytree, :meth:`accumulate_sample_gradients` returns updated
grads (the vjp of the field evaluation itself, so the trilinear scatter
weights match the forward exactly; XLA scatter-add is deterministic on TPU).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import jax.numpy as jnp
import numpy as np

from dvren_tpu.core.plan import InterpMode, OobPolicy
from dvren_tpu.core.status import check
from dvren_tpu.ops import grid as grid_ops
from dvren_tpu.utils.pytree import pytree_dataclass


@dataclass(frozen=True)
class DenseGridConfig:
    """Mirrors ``dvren::DenseGridConfig``.

    resolution is (nx, ny, nz); sigma is flat [z][y][x] length nx*ny*nz;
    color is flat [z][y][x][c] length 3*nx*ny*nz (CLI defaults color to the
    grayscale density, main.cpp:167-177 - handled by the io layer).
    """

    resolution: tuple[int, int, int]
    sigma: np.ndarray | list[float] = dc_field(default_factory=list)
    color: np.ndarray | list[float] = dc_field(default_factory=list)
    bbox_min: tuple[float, float, float] = (0.0, 0.0, 0.0)
    bbox_max: tuple[float, float, float] = (1.0, 1.0, 1.0)
    interp: InterpMode = InterpMode.LINEAR
    oob: OobPolicy = OobPolicy.ZERO


@pytree_dataclass(meta_fields=("bbox_min", "bbox_max", "interp", "oob",
                               "packed_dtype"))
@dataclass(frozen=True)
class DenseGridField:
    """sigma: (Z, Y, X) float32; color: (Z, Y, X, 3) float32.

    ``packed_dtype``: element type of the packed-stencil gather table
    ("float32" parity default; "bfloat16" / "float16" halve gather
    bandwidth - measured ~1.9x faster field evaluation - at reduced field
    precision; f16 mirrors the reference's HP_DTYPE_F16, hp.h:44-50).
    """

    sigma: jnp.ndarray
    color: jnp.ndarray
    bbox_min: tuple[float, float, float] = (0.0, 0.0, 0.0)
    bbox_max: tuple[float, float, float] = (1.0, 1.0, 1.0)
    interp: InterpMode = InterpMode.LINEAR
    oob: OobPolicy = OobPolicy.ZERO
    packed_dtype: str = "float32"

    # -- construction ---------------------------------------------------------

    @staticmethod
    def create(config: DenseGridConfig) -> "DenseGridField":
        """Validates like ``DenseGridField::Create`` (dense_grid.cpp:69-130)."""
        nx, ny, nz = (int(v) for v in config.resolution)
        check(nx > 0 and ny > 0 and nz > 0, "resolution must be positive")
        voxels = nx * ny * nz
        sigma = np.asarray(config.sigma, dtype=np.float32).reshape(-1)
        color = np.asarray(config.color, dtype=np.float32).reshape(-1)
        check(sigma.size == voxels, "sigma data size mismatch")
        check(color.size == voxels * 3, "color data size mismatch")
        return DenseGridField(
            sigma=jnp.asarray(sigma.reshape(nz, ny, nx)),
            color=jnp.asarray(color.reshape(nz, ny, nx, 3)),
            bbox_min=tuple(float(v) for v in config.bbox_min),
            bbox_max=tuple(float(v) for v in config.bbox_max),
            interp=config.interp,
            oob=config.oob,
        )

    # -- shape facts ----------------------------------------------------------

    @property
    def resolution(self) -> tuple[int, int, int]:
        """(nx, ny, nz)."""
        nz, ny, nx = self.sigma.shape
        return (nx, ny, nz)

    @property
    def voxel_count(self) -> int:
        return int(np.prod(self.sigma.shape))

    # -- evaluation (the Field protocol used by the render pipeline) ----------

    def sigma_at(self, positions: jnp.ndarray) -> jnp.ndarray:
        """Density at world positions (...,3) -> (...,). Differentiable."""
        return grid_ops.eval_grid(
            self.sigma, positions, self.bbox_min, self.bbox_max,
            self.interp, self.oob)

    def color_at(self, positions: jnp.ndarray) -> jnp.ndarray:
        """Color at world positions (...,3) -> (...,3). Differentiable."""
        return grid_ops.eval_grid(
            self.color, positions, self.bbox_min, self.bbox_max,
            self.interp, self.oob)

    def sigma_at_planes(self, px, py, pz) -> jnp.ndarray:
        """SoA hot-path variant: coordinate planes in, density plane out."""
        return grid_ops.eval_grid_planes(
            self.sigma, px, py, pz, self.bbox_min, self.bbox_max,
            self.interp, self.oob)

    def color_at_planes(self, px, py, pz) -> tuple[jnp.ndarray, ...]:
        """SoA hot-path variant: coordinate planes in, (r, g, b) planes out."""
        return grid_ops.eval_grid_planes(
            self.color, px, py, pz, self.bbox_min, self.bbox_max,
            self.interp, self.oob)

    @property
    def supports_packed_eval(self) -> bool:
        """Packed-stencil fast path needs trilinear + all dims >= 2."""
        nz, ny, nx = self.sigma.shape
        return (self.interp == InterpMode.LINEAR
                and min(nx, ny, nz) >= 2)

    def packed_eval_planes(self, px, py, pz):
        """(sigma, r, g, b) planes via ONE gather per sample: the packed
        trilinear stencil (ops.grid.build_packed_stencil). Value-identical
        to sigma_at_planes + color_at_planes under LINEAR interpolation,
        ~18x faster on TPU. The packing is rebuilt in-graph from the
        current parameters (cheap shifted-slice concat), so gradients flow
        back into sigma/color exactly."""
        packed = grid_ops.build_packed_stencil(
            self.sigma, self.color,
            dtype=grid_ops.table_dtype(self.packed_dtype))
        return grid_ops.eval_packed_trilinear(
            packed, self.sigma.shape, px, py, pz,
            self.bbox_min, self.bbox_max, self.oob)

    # -- gradients -------------------------------------------------------------

    def zero_grads(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(sigma_grad, color_grad) zeroed; DenseGridField::ZeroGradients."""
        return (jnp.zeros_like(self.sigma), jnp.zeros_like(self.color))

    def accumulate_sample_gradients(
        self,
        positions: jnp.ndarray,
        grad_sigma: jnp.ndarray,
        grad_color: jnp.ndarray,
        grads: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Scatter per-sample gradients into voxel gradients.

        The analogue of ``AccumulateSampleGradients`` (dense_grid.cpp:171-309)
        derived as the exact vjp of the field evaluation. ``positions`` is
        (..., 3) and grads broadcast over the same leading shape.
        """
        sigma_g = grid_ops.scatter_grid_grads(
            self.sigma.shape, positions, grad_sigma,
            self.bbox_min, self.bbox_max, self.interp, self.oob)
        color_g = grid_ops.scatter_grid_grads(
            self.color.shape, positions, grad_color,
            self.bbox_min, self.bbox_max, self.interp, self.oob)
        if grads is not None:
            sigma_g = grads[0] + sigma_g
            color_g = grads[1] + color_g
        return (sigma_g, color_g)

    # -- functional updates ----------------------------------------------------

    def with_params(self, sigma: jnp.ndarray, color: jnp.ndarray) -> "DenseGridField":
        return DenseGridField(
            sigma=sigma, color=color,
            bbox_min=self.bbox_min, bbox_max=self.bbox_max,
            interp=self.interp, oob=self.oob,
            packed_dtype=self.packed_dtype)

    def with_packed_dtype(self, dtype: str) -> "DenseGridField":
        return DenseGridField(
            sigma=self.sigma, color=self.color,
            bbox_min=self.bbox_min, bbox_max=self.bbox_max,
            interp=self.interp, oob=self.oob, packed_dtype=dtype)
