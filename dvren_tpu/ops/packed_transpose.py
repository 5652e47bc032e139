"""Pallas 32-column transpose kernels for the packed-stencil table.

The packed table wants (P, 32) cell-major rows (one row-gather per
scheduled cell), but its cheap construction is the COLUMN-major shift
stack: column ch*8+corner of the full-pitch table is the flattened grid
plane shifted by a PURE offset dz*Y*X + dy*X + dx (only at full pitch -
cell-pitch ids wrap at each x row). XLA builds the (32, P) stack at
memory speed (32 one-dimensional offset slices), but its transpose to
(P, 32) materializes lane-padded intermediates (minor dims < 128 pad to
full lane tiles) - measured 4.6 ms/frame at 64^3 on the tunnel chip for
the whole build. These kernels do ONLY the transpose, blockwise in VMEM,
reading and writing each byte once; the adjoint (used by the backward's
d(table) -> d(planes) chain) is the same kernel with roles swapped.

Interpret mode runs on CPU (tests); the TPU path is selected by
ops.grid.build_packed_stencil_fullpitch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 2048  # cells per grid step: (32, 2048) f32 = 256 KB in VMEM


def _t_fwd_kernel(i_ref, o_ref):
    o_ref[...] = i_ref[...].T


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnums=(1,))
def stack_to_rows(stack: jnp.ndarray, interpret: bool | None = None):
    """(32, P) column-major shift stack -> (P, 32) cell-major rows.

    P must be a multiple of 2048 (callers pad the cell space; full-pitch
    padding already rounds up).
    """
    if interpret is None:
        interpret = _interpret_default()
    n = stack.shape[1]
    assert n % _BLOCK == 0, n
    return pl.pallas_call(
        _t_fwd_kernel,
        grid=(n // _BLOCK,),
        in_specs=[pl.BlockSpec((32, _BLOCK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((_BLOCK, 32), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 32), stack.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(stack)


@functools.partial(jax.jit, static_argnums=(1,))
def rows_to_stack(rows: jnp.ndarray, interpret: bool | None = None):
    """(P, 32) rows -> (32, P) stack (the adjoint-side transpose)."""
    if interpret is None:
        interpret = _interpret_default()
    n = rows.shape[0]
    assert n % _BLOCK == 0, n
    return pl.pallas_call(
        _t_fwd_kernel,
        grid=(n // _BLOCK,),
        in_specs=[pl.BlockSpec((_BLOCK, 32), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((32, _BLOCK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((32, n), rows.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(rows)
