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


def _t_split_kernel(i_ref, o_ref):
    bits = pltpu.bitcast(i_ref[...], jnp.uint32)          # (32, BLOCK)
    bt = bits.T                                           # (BLOCK, 32)
    hi = (bt >> jnp.uint32(16)).astype(jnp.uint16)
    lo = (bt & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    o_ref[...] = jnp.concatenate([hi, lo], axis=1)        # (BLOCK, 64)


@functools.partial(jax.jit, static_argnums=(1,))
def stack_to_u16_rows(stack: jnp.ndarray, interpret: bool | None = None):
    """(32, P) f32 column-major shift stack -> (P, 64) u16 split rows
    (row v = [hi16 of the 32 channels | lo16], the exact layout
    ops/grid.py::_split_u16 produces from the (P, 32) f32 table).

    Fuses :func:`stack_to_rows` with the per-frame u16 split: the f32
    (P, 32) table never exists. That matters beyond saving a pass - a
    minor dim of 32 pads to 128 lanes in XLA:TPU's tiled layout, so the
    f32 table costs 4x its logical bytes on every HBM write/read; the
    u16 rows (minor 64) cost 2x. Bit-exact (integer plumbing on the same
    f32 values).
    """
    if interpret is None:
        interpret = _interpret_default()
    n = stack.shape[1]
    assert n % _BLOCK == 0, n
    assert stack.dtype == jnp.float32, stack.dtype
    return pl.pallas_call(
        _t_split_kernel,
        grid=(n // _BLOCK,),
        in_specs=[pl.BlockSpec((32, _BLOCK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((_BLOCK, 64), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 64), jnp.uint16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(stack)


def _t_merge_kernel(i_ref, o_ref):
    rows = i_ref[...]                                     # (BLOCK, 64)
    hi = rows[:, :32].astype(jnp.uint32) << jnp.uint32(16)
    lo = rows[:, 32:].astype(jnp.uint32)
    o_ref[...] = pltpu.bitcast(hi | lo, jnp.float32).T    # (32, BLOCK)


@functools.partial(jax.jit, static_argnums=(1,))
def u16_rows_to_stack(rows: jnp.ndarray, interpret: bool | None = None):
    """(P, 64) u16 split rows -> (32, P) f32 stack: the adjoint-side
    counterpart of :func:`stack_to_u16_rows` (recombine + transpose in
    one VMEM pass), consuming the backward's table cotangent directly in
    its u16 row form - the lane-padded f32 (P, 32) cotangent (4x bytes)
    never materializes. Bit-exact."""
    if interpret is None:
        interpret = _interpret_default()
    n = rows.shape[0]
    assert n % _BLOCK == 0, n
    assert rows.dtype == jnp.uint16, rows.dtype
    return pl.pallas_call(
        _t_merge_kernel,
        grid=(n // _BLOCK,),
        in_specs=[pl.BlockSpec((_BLOCK, 64), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((32, _BLOCK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((32, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(rows)


_CB = 8  # bank blocks per grid step: (8, 32, 128) f32 in + u16 out = 256 KB


def _b2r_kernel(i_ref, o_ref):
    for b in range(_CB):
        bits = pltpu.bitcast(i_ref[b], jnp.uint32)        # (32, 128)
        bt = bits.T                                       # (128, 32) u32
        hi = (bt >> jnp.uint32(16)).astype(jnp.uint16)
        lo = (bt & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        o_ref[b] = jnp.concatenate([hi, lo], axis=1)      # (128, 64) u16


@functools.partial(jax.jit, static_argnums=(1,))
def banks_to_u16_rows(banks: jnp.ndarray, interpret: bool | None = None):
    """Bank-block cotangents (B, 32, 128) f32 -> u16 slot rows
    (B*128, 64), row s = lane s%128 of block s//128, columns
    [hi16 of the 32 channels | lo16] (the take_rows_exact split layout,
    ops/grid.py::_split_u16).

    The backward's gather-transpose needs the per-SLOT cotangent rows the
    kernel's per-bank layout stores lane-wise; XLA's bitcast + u16 split
    + swapaxes materializes lane-padded sub-128-minor intermediates (the
    same disease the forward build had - see module docstring). Here the
    whole transform is one blockwise VMEM pass: bitcast, one 32-bit
    transpose per block, shift/mask into u16 halves, each byte read and
    written once. Bit-exact by construction (pure integer plumbing).

    B must be a multiple of 8 (tile groups are padded to multiples of 8
    tiles, so per-group B = n_tiles * banks always is).
    """
    if interpret is None:
        interpret = _interpret_default()
    nb = banks.shape[0]
    assert nb % _CB == 0, nb
    out = pl.pallas_call(
        _b2r_kernel,
        grid=(nb // _CB,),
        in_specs=[pl.BlockSpec((_CB, 32, 128), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((_CB, 128, 64), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, 128, 64), jnp.uint16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(banks)
    return out.reshape(nb * 128, 64)
