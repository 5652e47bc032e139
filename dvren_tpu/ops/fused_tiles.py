"""Fused tile-group render kernel: the north-star Pallas hot path.

Consumes the host-resolved bank-packed tile-table schedule
(render/tiled.py): for each 16x16-pixel tile the host has collected, per
8-step chunk, the <= 256 distinct grid cells its 2048 samples touch, and
packed every chunk's cell run DENSELY into the tile's shared bank space
(NB banks of 128 lanes; a run may start at any lane offset and spans at
most two consecutive banks). Measured on the 512^2/64^3 headline scene,
only ~38% of the round-2 per-chunk 128-slot tables were live cells - the
dense packing cuts slot lanes (and with them the host row-gather bytes,
the kernel's table DMA, and the backward's cotangent write) ~2.3x.

This kernel does everything after the per-slot table gather IN ONE PASS
per tile - the TPU-native equivalent of the reference's fused samp+int
device kernel plus CUDA-Graph steady state (role models:
``hotpath/src/cpu/samp_int_fused.cpp:11-76``,
``hotpath/src/cuda/graph_cuda.cu:120-205``; north star per SURVEY.md 2.3):

1. per-sample trilinear fraction recompute from the SLIM schedule
   (sample_t + packed slot|mask + per-tile compact ray planes + per-lane
   cell bases; see :func:`_sample_geometry` - shipping fractions costs
   2.5x the DMA bytes and the kernel is bandwidth-bound);
2. slot -> value expansion with ``tpu.dynamic_gather``: each chunk's
   window is the two banks [b0, b0+1] named by a prefetched scalar; one
   vector shuffle per bank per packed channel replaces 2048 XLA gather
   starts - the measured XLA gather-start ceiling never applies
   in-kernel;
3. the transmittance recurrence, reformulated (like ops/integrate.py) as
   prefix sums of optical depth. All per-ray reductions are SUMS because
   ``processed`` is a prefix mask, so they map onto tiny MXU matmuls with
   group-structure masks: out = x @ M with M[l', l] = [same 8-lane ray
   group and l' < l] (exclusive prefix) or [same group] (broadcast sum),
   The production scheme is "mxu3": 3-pass bf16-split mask matmuls -
   the 0/1 masks are exact in bf16 and the data side splits into three
   bf16 components whose partial products are exact, re-added in f32
   (<= 1 ulp reassociation vs HIGHEST; Mosaic supports only DEFAULT - a
   single f32-truncating bf16 pass, ~1e-3 error - and HIGHEST in-kernel,
   and HIGHEST costs 6 MXU passes vs mxu3's 3). Measured on the REAL
   train step (tools/reduce_ablate.py - the earlier kernel-only ablation
   consumed one group's gradient and XLA dead-code-eliminated the rest):
   mxu3 fwd+bwd 36.3 ms vs HIGHEST's 44.1 at the headline config; the
   forward alone is DMA-bound so both tie there. Ablations kept behind
   ``reduce=``: "mxu" (HIGHEST mask matmuls) and "roll" (VPU butterfly).
   Early termination is exact: T_final = exp(-sum of processed od).

The backward is a custom VJP (no residuals beyond the inputs): pass 1
re-runs the gather+interpolation storing per-chunk planes and prefix
state in VMEM scratch, pass 2 walks the chunks in reverse applying the
adjoint of the telescoped-weight formulation (the jax.grad semantics of
ops/integrate.py::integrate, including the maximum(x, 0) tie gradient of
0.5) and ACCUMULATES d(table) in place into the tile's (NB, 32, 128)
bank block with one-hot matmuls on the MXU - cells shared between a
tile's chunks reduce inside VMEM, so the cotangent write is the bank
block itself, not a full per-chunk table (round-2's dominant backward
cost, ~2.9x larger).

Layouts (see render/tiled.py): samples of a chunk sit at (block row r,
lane l) with ray = r*16 + l//8 and in-chunk step j = l%8; tabs are
(T, NB, 32, 128) with row ch*8 + corner (channel-major packed stencil,
corner = dz*4 + dy*2 + dx) and lane = bank slot; rayt is compact
(T, 12, 128) with row ax*2 + half and lane = ray % 128 (half = ray//128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvren_tpu.core.status import check
from dvren_tpu.ops.integrate import OPACITY_EPS, STOP_THRESHOLD

ROWS = 16          # block rows per chunk
LANES = 128        # lanes per row
GROUP = 8          # lanes per ray (= steps per chunk)
RAYS_PER_TILE = 256
RAYS_COLS = 16     # compacted per-ray output lanes (= LANES // GROUP)
NCH = 32           # packed channels: 4 (sigma, r, g, b) x 8 corners
SUP_NCH = 108      # supercell stencil: 4 channels x 27 vertices
RAYT_ROWS = 12     # compact ray planes: 6 axes x 2 halves of 128 rays


def stencil_rows(stencil: str) -> int:
    """Table rows per bank block: 32 (cell stencil) or 108 (supercell:
    4 channels x 3^3 vertices; ops/grid.py::build_supercell_stencil)."""
    return SUP_NCH if stencil == "super" else NCH


def _group_matrices():
    """(M_excl, M_all, M_suffix): 8-lane-group prefix/broadcast masks."""
    src = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    same = (src // GROUP) == (dst // GROUP)
    m_excl = (same & (src < dst)).astype(jnp.float32)
    m_all = same.astype(jnp.float32)
    m_suf = (same & (src > dst)).astype(jnp.float32)
    return m_excl, m_all, m_suf


# In-kernel dots only support DEFAULT (ONE bf16 pass: truncates the f32
# operand, ~1e-3 error - never use it here) and HIGHEST (6 passes) in
# Mosaic; Precision.HIGH raises NotImplementedError.
_MASK_PRECISION = jax.lax.Precision.HIGHEST

# Production group-reduction strategy (tools/reduce_ablate.py picks it on
# the real fwd+bwd step: mxu3 36.3 ms vs mxu 44.1 at the headline config;
# both are exact-product schemes differing only in f32 reassociation).
DEFAULT_REDUCE = "mxu3"

def _mask_dot(x, m):
    return jnp.dot(x, m, preferred_element_type=jnp.float32,
                   precision=_MASK_PRECISION)


def _split3_bf16(x):
    """f32 -> three bf16 parts summing back exactly (8+8+8 >= 24 mantissa
    bits; round-to-nearest residuals always fit the next part)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _mask_dot3(x, m_bf16):
    """x @ M for a {0,1} mask via the bf16 3-split, folded into ONE
    tall MXU issue.

    Splitting only the f32 operand (the mask is already bf16-exact)
    makes every partial product exact, so three passes reconstruct the
    same sums HIGHEST computes with six (it splits BOTH operands).
    Stacking the three split parts on the M axis turns them into one
    (3M, 128) matmul whose row slices ARE the three per-part results
    (each output row is an independent lane contraction), re-added in
    the same hi + mid + lo order - bit-identical to the separate-pass
    form at a third of the MXU issues (round 4)."""
    hi, mid, lo = _split3_bf16(x)
    big = jnp.concatenate([hi, mid, lo], axis=0)
    d = jnp.dot(big, m_bf16, preferred_element_type=jnp.float32)
    m = x.shape[0]
    return d[:m] + d[m:2 * m] + d[2 * m:]


def _scatter_dot_hi(x, oh):
    """sum_l x[., l] * oh[s, l] at HIGHEST (6 MXU passes)."""
    return jax.lax.dot_general(x, oh, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_MASK_PRECISION)


def _scatter_dot3(x, oh_bf16):
    """Same contraction as :func:`_scatter_dot_hi` via the bf16 3-split
    folded into one tall issue (see :func:`_mask_dot3`). A shallower
    split would save nothing here: at nch <= 32 channels even the
    3-stacked M (96 rows) pads to ONE 128-row MXU tile, so depth only
    trades exactness for zero passes - keep it exact."""
    hi, mid, lo = _split3_bf16(x)
    big = jnp.concatenate([hi, mid, lo], axis=0)
    d = jax.lax.dot_general(big, oh_bf16, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = x.shape[0]
    return d[:m] + d[m:2 * m] + d[2 * m:]


def _lane_pos():
    """(1, 128) int32: lane position within its 8-lane ray group."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) % GROUP


def _prefix_excl_roll(x):
    """Exclusive prefix sum within each 8-lane group via a Hillis-Steele
    butterfly of masked ``pltpu.roll``-adds (measured SLOWER than the MXU
    mask matmul on v5e - cross-lane rotates are expensive - kept for the
    kernel probe's reduce ablation)."""
    pos = _lane_pos()
    s = x
    for sh in (1, 2, 4):
        r = pltpu.roll(s, sh, axis=1)
        s = s + jnp.where(pos >= sh, r, 0.0)
    return s - x


def _suffix_excl_roll(x):
    pos = _lane_pos()
    s = x
    for sh in (1, 2, 4):
        r = pltpu.roll(s, LANES - sh, axis=1)
        s = s + jnp.where(pos < GROUP - sh, r, 0.0)
    return s - x


def _group_sum_roll(x):
    """Group-sum broadcast via cyclic butterfly (see _prefix_excl_roll)."""
    pos = _lane_pos()
    s = x
    for sh in (1, 2, 4):
        a = pltpu.roll(s, sh, axis=1)
        b = pltpu.roll(s, LANES + sh - GROUP, axis=1)
        s = s + jnp.where(pos >= sh, a, b)
    return s


class _MxuReduce:
    """Group reductions as HIGHEST-precision mask matmuls (ablation;
    exact, but 6 MXU passes where _Mxu3Reduce spends 3)."""

    onehot_dtype = jnp.float32
    scatter_dot = staticmethod(_scatter_dot_hi)

    def __init__(self):
        self.m_excl, self.m_all, self.m_suf = _group_matrices()

    def prefix_excl(self, x):
        return _mask_dot(x, self.m_excl)

    def suffix_excl(self, x):
        return _mask_dot(x, self.m_suf)

    def group_sum(self, x):
        return _mask_dot(x, self.m_all)

    def group_sum_many(self, xs):
        """One tall matmul for several group sums (amortizes MXU passes)."""
        cat = jnp.concatenate(xs, axis=0)
        sums = _mask_dot(cat, self.m_all)
        r = xs[0].shape[0]
        return [sums[i * r:(i + 1) * r] for i in range(len(xs))]


class _Mxu3Reduce:
    """Group reductions as 3-pass bf16-split mask matmuls (see
    :func:`_mask_dot3`): same sums as HIGHEST at half the MXU passes
    (the production default; tools/reduce_ablate.py)."""

    onehot_dtype = jnp.bfloat16
    scatter_dot = staticmethod(_scatter_dot3)

    def __init__(self):
        m_excl, m_all, m_suf = _group_matrices()
        self.m_excl = m_excl.astype(jnp.bfloat16)
        self.m_all = m_all.astype(jnp.bfloat16)
        self.m_suf = m_suf.astype(jnp.bfloat16)

    def prefix_excl(self, x):
        return _mask_dot3(x, self.m_excl)

    def suffix_excl(self, x):
        return _mask_dot3(x, self.m_suf)

    def group_sum(self, x):
        return _mask_dot3(x, self.m_all)

    def group_sum_many(self, xs):
        cat = jnp.concatenate(xs, axis=0)
        sums = _mask_dot3(cat, self.m_all)
        r = xs[0].shape[0]
        return [sums[i * r:(i + 1) * r] for i in range(len(xs))]


class _RollReduce:
    """Group reductions as VPU butterflies (probe ablation)."""

    onehot_dtype = jnp.float32
    scatter_dot = staticmethod(_scatter_dot_hi)

    prefix_excl = staticmethod(_prefix_excl_roll)
    suffix_excl = staticmethod(_suffix_excl_roll)
    group_sum = staticmethod(_group_sum_roll)

    def group_sum_many(self, xs):
        return [_group_sum_roll(x) for x in xs]


_REDUCERS = {"mxu": _MxuReduce, "mxu3": _Mxu3Reduce, "roll": _RollReduce}


def _reducer(reduce: str):
    return _REDUCERS[reduce]()


def _expand_rayt(rayt_g):
    """Compact (12, 128) ray planes -> six (16, 128) sample-layout planes.

    Row ax*2 + half holds axis ``ax`` of rays half*128..half*128+127; the
    sample layout wants ray = row*16 + lane//8 replicated across each
    8-lane group. Two lane shuffles + one select per axis replace the
    8x-replicated (6, 16, 128) planes round 2 shipped (44 MB/frame of DMA
    at 512^2)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    idx = (row % 8) * RAYS_COLS + lane // GROUP   # ray % 128
    half_hi = row >= 8                            # ray // 128
    planes = []
    for ax in range(6):
        a = jnp.broadcast_to(rayt_g[2 * ax:2 * ax + 1, :], (ROWS, LANES))
        b = jnp.broadcast_to(rayt_g[2 * ax + 1:2 * ax + 2, :],
                             (ROWS, LANES))
        va = jnp.take_along_axis(a, idx, axis=1)
        vb = jnp.take_along_axis(b, idx, axis=1)
        planes.append(jnp.where(half_hi, vb, va))
    return planes


def _slot_prep(idx2):
    """Decompose window-relative slots ``idx2`` into (bank-0 index,
    bank-1 index, bank-1 select, out rows) ONCE per chunk - every window
    expansion (32 table corners + 3 bases, 67 with camera grads) reuses
    it instead of re-running two clips and a compare per call.

    Single-sublane inputs broadcast to a full 8-sublane vreg here (once)
    because Mosaic's dynamic_gather lowering rejects single-sublane
    shapes ("Shape mismatch in input, indices and output"); the
    expansion slices the first row back."""
    rows = idx2.shape[0]
    if rows == 1:
        idx2 = jnp.broadcast_to(idx2, (8, LANES))
    return (jnp.clip(idx2, 0, LANES - 1),
            jnp.clip(idx2 - LANES, 0, LANES - 1),
            idx2 >= LANES, rows)


def _win_expand(m0, m1, col, prep):
    """Expand prepared window-relative slots (see :func:`_slot_prep`)
    into values of row ``col`` of the two bank matrices m0/m1 ((C, 128)
    loaded blocks) via ``tpu.dynamic_gather`` - one lane shuffle per bank
    + one select. Rows are sliced in ONE step off the loaded block
    (Mosaic rejects broadcast from a re-sliced intermediate, "Invalid
    input layout")."""
    i0, i1, sel, out_rows = prep
    rows = i0.shape[0]
    r0 = jnp.broadcast_to(m0[col:col + 1, :], (rows, LANES))
    r1 = jnp.broadcast_to(m1[col:col + 1, :], (rows, LANES))
    v0 = jnp.take_along_axis(r0, i0, axis=1)
    v1 = jnp.take_along_axis(r1, i1, axis=1)
    v = jnp.where(sel, v1, v0)
    return v[:out_rows] if out_rows != rows else v


class _Windows:
    """Per-chunk bank-window state for ``subs`` sub-tiles.

    Each sub-tile of a chunk has its own 2-bank window [b0_s, b0_s + 1]
    into the tile's shared bank space (subs == 1 is the classic whole-
    tile window; subs == 4 is the fine-grid mode: 8x8-pixel sub-tiles,
    rows 4s..4s+3 of the block - measured 0% slot overflow at 512^2 over
    128^3 and at the 800^2/160^3 SDF shell with occupancy, where 16x16
    tiles overflow 58-91% of tiles). ``expand`` runs one dynamic-gather
    window expansion per sub-tile on its row slice and concatenates; for
    subs == 1 it is exactly the single-window expansion."""

    def __init__(self, tabs_ref, base_ref, g, b0_ref, tile_idx, c, nc, nb,
                 subs):
        self.subs = subs
        self.rps = ROWS // subs
        # bank0 scalars carry an ALIGNED bit at 30 (render/tiled.py):
        # set when the window's run provably fits bank b0 alone (never
        # crosses into b0+1) - the backward's scatter then contracts
        # against a 128-slot one-hot instead of the 256-slot two-bank
        # window (measured 6 ms of the 40 ms headline train step,
        # tools/bwdscatter_probe.py). Bit clear = the original two-bank
        # path, so schedules that never set it (posed, pre-flag) are
        # unchanged.
        raw = [b0_ref[(tile_idx * nc + c) * subs + s]
               for s in range(subs)]
        self.b0s = [r & 0x3FFF for r in raw]
        self.aligned = [(r >> 30) & 1 for r in raw]
        self.mats = []
        self.bases = []
        for b0 in self.b0s:
            b1 = jnp.minimum(b0 + 1, nb - 1)
            self.mats.append((tabs_ref[g, b0], tabs_ref[g, b1]))
            self.bases.append((base_ref[g, b0], base_ref[g, b1]))

    def idx2(self, lidx):
        """Window-relative slots: lidx (16, 128) tile-local -> per-row
        offset by the owning sub-tile's window start bank."""
        if self.subs == 1:
            return lidx - self.b0s[0] * LANES
        return jnp.concatenate(
            [lidx[s * self.rps:(s + 1) * self.rps] - self.b0s[s] * LANES
             for s in range(self.subs)], axis=0)

    def prep(self, idx2):
        """Per-sub-tile :func:`_slot_prep` list, computed once per chunk
        and reused by every expansion."""
        if self.subs == 1:
            return [_slot_prep(idx2)]
        return [_slot_prep(idx2[s * self.rps:(s + 1) * self.rps])
                for s in range(self.subs)]

    def _expand(self, mats, col, preps):
        if self.subs == 1:
            m0, m1 = mats[0]
            return _win_expand(m0, m1, col, preps[0])
        outs = []
        for s in range(self.subs):
            m0, m1 = mats[s]
            outs.append(_win_expand(m0, m1, col, preps[s]))
        return jnp.concatenate(outs, axis=0)

    def expand_tab(self, col, preps):
        return self._expand(self.mats, col, preps)

    def expand_base(self, ax, preps):
        return self._expand(self.bases, ax, preps)


def _sample_geometry(samp_c, win, rayt, *, lo, inv, ns):
    """Recompute per-sample trilinear weights IN-KERNEL from the slim
    schedule: sample_t + packed (slot | mask) + per-tile ray planes +
    per-lane cell bases.

    Shipping fractions cost 32 KB/chunk of DMA (the kernel is
    bandwidth-bound at this chip's ~100 GB/s effective HBM rate, measured
    in tools/hbm_probe.py); recomputing them costs ~30 vector ops. The
    cell assignment stays HOST-authoritative (slot ids + mask bit + the
    gathered cell base), so the 1-ulp fma difference between host and
    device positions only perturbs a fraction continuously - it can never
    flip a sample to a different cell or into/out of the mask.

    samp_c: (3, R, 128) u16 = [sample_t hi16, sample_t lo16,
    tile-local lidx | m << 15] (6 B/sample; sample_t's exact f32 bits
    reassemble as (hi << 16) | lo).
    win: the chunk's :class:`_Windows` (per-sub-tile bank windows).
    rayt: six (R, 128) planes ox, oy, oz, dx, dy, dz (from _expand_rayt).
    Returns (idx2 (R,128) window-relative i32, prep (the chunk's
    :func:`_slot_prep` list, reused by every expansion), weights
    ((wx0,wx1),(wy..),(wz..)) with m folded into wz).
    """
    st = pltpu.bitcast(
        (samp_c[0].astype(jnp.uint32) << 16)
        | samp_c[1].astype(jnp.uint32), jnp.float32)
    packed = samp_c[2].astype(jnp.int32)
    m = ((packed >> 15) & 1).astype(jnp.float32)
    idx2 = win.idx2(packed & 0x7FFF)
    prep = win.prep(idx2)

    def axis(o_pl, d_pl, ax):
        p = o_pl + d_pl * st
        local = (p - jnp.float32(lo[ax])) * jnp.float32(inv[ax])
        f = local * jnp.float32(ns[ax])
        return f - win.expand_base(ax, prep)

    tx = axis(rayt[0], rayt[3], 0)
    ty = axis(rayt[1], rayt[4], 1)
    tz = axis(rayt[2], rayt[5], 2)
    wx = (1.0 - tx, tx)
    wy = (1.0 - ty, ty)
    wz = (m * (1.0 - tz), m * tz)
    return idx2, prep, (wx, wy, wz)


def _sample_geometry_super(samp_c, win, rayt, *, lo, inv, ns):
    """Supercell variant of :func:`_sample_geometry`: packed bits are
    lane(12) | lx<<12 | ly<<13 | lz<<14 | m<<15 (lane < 4096 => <= 31
    banks per tile; the scheduler enforces it), the gathered base is the
    supercell's VERTEX ORIGIN (2*s per axis), and the sample's cell is
    origin + l. The fraction subtracts (base + l) - an exact integer f32
    add - so t is BIT-IDENTICAL to the cell-stencil path's f - cellbase.
    Returns (idx2, prep, weights, lbits) with lbits int32 planes."""
    st = pltpu.bitcast(
        (samp_c[0].astype(jnp.uint32) << 16)
        | samp_c[1].astype(jnp.uint32), jnp.float32)
    packed = samp_c[2].astype(jnp.int32)
    m = ((packed >> 15) & 1).astype(jnp.float32)
    lb = (((packed >> 12) & 1), ((packed >> 13) & 1),
          ((packed >> 14) & 1))
    idx2 = win.idx2(packed & 0xFFF)
    prep = win.prep(idx2)

    def axis(o_pl, d_pl, ax):
        p = o_pl + d_pl * st
        local = (p - jnp.float32(lo[ax])) * jnp.float32(inv[ax])
        f = local * jnp.float32(ns[ax])
        basec = (win.expand_base(ax, prep)
                 + lb[ax].astype(jnp.float32))
        return f - basec

    tx = axis(rayt[0], rayt[3], 0)
    ty = axis(rayt[1], rayt[4], 1)
    tz = axis(rayt[2], rayt[5], 2)
    wx = (1.0 - tx, tx)
    wy = (1.0 - ty, ty)
    wz = (m * (1.0 - tz), m * tz)
    return idx2, prep, (wx, wy, wz), lb


def _axis_hats(w, lb):
    """Hat-basis weights over the supercell's 3 vertex positions along
    one axis: h[a] = w0 at a == l, w1 at a == l + 1, exactly 0.0
    elsewhere - the piecewise-linear interpolation basis, selected (not
    recomputed) from the cell weights so nonzero values match the cell
    stencil bit for bit."""
    return [jnp.where(lb == a, w[0],
                      jnp.where(lb == a - 1, w[1], 0.0))
            for a in range(3)]


def _hat_weights(weights, lbits):
    """27 per-sample vertex weights in packed order vz*9 + vy*3 + vx.

    Products run (hz*hy)*hx - the same multiplication order as
    :func:`_corner_weights` - so each sample's 8 nonzero weights are
    bit-identical to its cell-stencil corner weights, and the other 19
    are exact zeros (adding them never changes a finite sum). Returns
    (w27 list, hzy dict (az, ay) -> hz*hy for the camera adjoint)."""
    wx, wy, wz = weights
    lbx, lby, lbz = lbits
    hx = _axis_hats(wx, lbx)
    hy = _axis_hats(wy, lby)
    hz = _axis_hats(wz, lbz)
    hzy = {(az, ay): hz[az] * hy[ay]
           for az in range(3) for ay in range(3)}
    w27 = [hzy[(vz, vy)] * hx[vx]
           for vz in range(3) for vy in range(3) for vx in range(3)]
    return w27, hzy


def _gather_planes_super(win, prep, w27):
    """Per-sample (sigma, r, g, b) planes from a supercell bank window:
    27 vertex expansions per channel, hat-weighted. Vertex order matches
    the corner order of the cell path under the l-shift, so the running
    sum hits the 8 nonzero terms in the same sequence (bit-identical
    accumulation; zero terms add exact zeros)."""
    planes = []
    for ch in range(4):
        acc = None
        for v in range(27):
            val = win.expand_tab(ch * 27 + v, prep)
            term = w27[v] * val
            acc = term if acc is None else acc + term
        planes.append(acc)
    return planes


def _corner_weights(weights):
    """The eight trilinear corner-weight planes in packed-corner order
    (dz*4 + dy*2 + dx), computed ONCE per chunk - the naive per-(channel,
    corner) recompute costs 96 full-plane multiplies per chunk vs 16
    here (same multiplication order, bit-identical products)."""
    wx, wy, wz = weights
    return [wz[dz] * wy[dy] * wx[dx]
            for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]


def _gather_planes_dg(win, prep, weights):
    """Per-sample (sigma, r, g, b) planes for one chunk, each (R, 128),
    via ``tpu.dynamic_gather`` over each sub-tile's 2-bank window.

    prep: prepared slot decomposition (from :func:`_sample_geometry`);
    weights: trilinear weights (mask folded into wz).
    """
    w8 = _corner_weights(weights)
    planes = []
    for ch in range(4):
        acc = None
        for corner in range(8):
            val = win.expand_tab(ch * 8 + corner, prep)
            term = w8[corner] * val
            acc = term if acc is None else acc + term
        planes.append(acc)
    return planes


def _gather_planes_mxu(mat0, mat1, idx2, weights):
    """Same contract as :func:`_gather_planes_dg`, but the slot expansion
    runs on the MXU: per block row r, cube_r = mat @ OH_r with
    OH_r[s, l] = [idx2[r, l] == s (+128 for bank 1)]. One-hot f32 matmuls
    are EXACT (each output column is a single table value: the bf16x3
    split of v times exactly-representable 0/1 recombines to v, and zero
    terms add exactly), so the gathered values match the dynamic-gather
    variant bitwise.
    Trilinear reduction happens per row in channel-major layout
    ((32, 128) -> (4, 8, 128) corner sum; the 8-corner reduction may
    reassociate vs the sequential corner adds - within the 1e-5 budget),
    avoiding cross-row relayouts.
    """
    n_rows = idx2.shape[0]
    slot = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    w8 = _corner_weights(weights)
    rows = [[] for _ in range(4)]
    for r in range(n_rows):
        lrow = jnp.broadcast_to(idx2[r:r + 1, :], (LANES, LANES))
        oh0 = (slot == lrow).astype(jnp.float32)
        oh1 = (slot + LANES == lrow).astype(jnp.float32)
        cube_r = (jnp.dot(mat0, oh0, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
                  + jnp.dot(mat1, oh1, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST))
        # corner weights in packed-corner order (dz*4 + dy*2 + dx)
        wc8 = jnp.concatenate(
            [w8[c][r:r + 1, :] for c in range(8)], axis=0)    # (8, 128)
        weighted = cube_r.reshape(4, 8, LANES) * wc8[None]    # (4, 8, 128)
        vals = jnp.sum(weighted, axis=1)                      # (4, 128)
        for ch in range(4):
            rows[ch].append(vals[ch:ch + 1, :])
    return [jnp.concatenate(rs, axis=0) for rs in rows]


def _chunk_gather(win, idx2, prep, weights, gather):
    if gather == "mxu":   # MXU one-hot ablation: whole-tile windows only
        m0, m1 = win.mats[0]
        return _gather_planes_mxu(m0, m1, idx2, weights)
    return _gather_planes_dg(win, prep, weights)


def _chunk_eval(stencil, samp_c, win, rayt, geom, gather):
    """One chunk's (sigma, r, g, b) planes for either stencil, plus the
    geometry tuple (idx2, prep, weights, lbits) the backward reuses."""
    if stencil == "super":
        idx2, prep, weights, lb = _sample_geometry_super(
            samp_c, win, rayt, **geom)
        w27, _ = _hat_weights(weights, lb)
        return _gather_planes_super(win, prep, w27), (idx2, prep,
                                                      weights, lb)
    idx2, prep, weights = _sample_geometry(samp_c, win, rayt, **geom)
    return (_chunk_gather(win, idx2, prep, weights, gather),
            (idx2, prep, weights, None))


def _chunk_geometry(ke, c, consts):
    """(live mask f32, dt_actual, t cursor) for chunk c of a tile at ke.

    The t cursor (sum of every upstream step's dt_actual, the depth
    head's segment start) is CLOSED-FORM: dta depends only on the step
    index, never on field data, so its running sum telescopes to
    max(0, min(base_t, t_stop) - min(t_origin, t_stop)) with
    t_stop = min(t_far, t_near + k_max*dt). This deletes a 6-pass
    HIGHEST MXU prefix per chunk plus the cross-chunk carry in both the
    forward and the backward (the jnp referee integrates by cumsum and
    compares at ~5e-6; the closed form is the exact real-arithmetic
    value, at least as close)."""
    dt, t_near, t_far, k_max = consts
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    k = ke + c * GROUP + lane % GROUP
    base_t = jnp.float32(t_near) + k.astype(jnp.float32) * jnp.float32(dt)
    live = (base_t < jnp.float32(t_far)) & (k < k_max)
    livef = live.astype(jnp.float32)
    dta = jnp.where(
        live,
        jnp.minimum(base_t + jnp.float32(dt), jnp.float32(t_far)) - base_t,
        0.0)
    t_origin = (jnp.float32(t_near)
                + ke.astype(jnp.float32) * jnp.float32(dt))
    t_stop = jnp.float32(min(float(t_far),
                             float(t_near) + float(k_max) * float(dt)))
    tcur = t_origin + jnp.maximum(
        jnp.minimum(base_t, t_stop) - jnp.minimum(t_origin, t_stop), 0.0)
    return livef, dta, tcur


def _fwd_kernel(ke_ref, b0_ref, tabs_ref, samp_ref, base_ref, rayt_ref,
                out_ref, *, nc, nb, subs, g_tiles, dt, t_near, t_far,
                k_max, stop, gather, reduce, lo, inv, ns,
                stencil="cell"):
    red = _reducer(reduce)
    consts = (dt, t_near, t_far, k_max)
    geom = dict(lo=lo, inv=inv, ns=ns)
    tile0 = pl.program_id(0) * g_tiles

    def tile(g, _):
        ke = ke_ref[tile0 + g]
        rayt = _expand_rayt(rayt_ref[g])
        zeros = jnp.zeros((ROWS, LANES), jnp.float32)
        init = (zeros, zeros, zeros, zeros, zeros,   # acc r, g, b, wd, odp
                zeros)                               # carry: sum of live od

        def chunk(c, carry):
            acc_r, acc_g, acc_b, acc_wd, acc_odp, carry_od = carry
            win = _Windows(tabs_ref, base_ref, g, b0_ref, tile0 + g, c,
                           nc, nb, subs)
            (sig, cr, cg, cb), _ = _chunk_eval(
                stencil, samp_ref[g, c], win, rayt, geom, gather)
            livef, dta, tcur = _chunk_geometry(ke, c, consts)

            od = jnp.maximum(sig * dta, 0.0) * livef
            s_pre = carry_od + red.prefix_excl(od)
            tb = jnp.exp(-s_pre)
            p = jnp.exp(-(s_pre + od))
            procf = (livef * (tb > jnp.float32(stop)).astype(jnp.float32))
            w = (tb - p) * procf

            mid = tcur + 0.5 * dta

            sums = red.group_sum_many(
                [w * cr, w * cg, w * cb, w * mid, od * procf, od])
            return (acc_r + sums[0], acc_g + sums[1], acc_b + sums[2],
                    acc_wd + sums[3], acc_odp + sums[4],
                    carry_od + sums[5])

        acc_r, acc_g, acc_b, acc_wd, acc_odp, _ = jax.lax.fori_loop(
            0, nc, chunk, init)
        # Compact the group-replicated (16, 128) accumulators to one value
        # per ray in lanes 0..15: the consumer then reads a contiguous
        # (T, 5, 16, 16) array instead of a strided ::8 lane slice (40
        # strided slices cost ~4 ms/frame of XLA relayouts at 512^2).
        # Mosaic's gather wants idx.shape == operand.shape: gather at full
        # width, then slice-store the leading 16 lanes.
        ray16 = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1),
            RAYS_COLS - 1) * GROUP
        for i, acc in enumerate((acc_r, acc_g, acc_b, acc_wd, acc_odp)):
            cacc = jnp.take_along_axis(acc, ray16, axis=1)
            out_ref[g, i] = cacc[:, :RAYS_COLS]
        return 0

    jax.lax.fori_loop(0, g_tiles, tile, 0)


def _bwd_kernel(ke_ref, b0_ref, tabs_ref, samp_ref, base_ref, rayt_ref,
                gs_ref, dtabs_ref, *rest,
                nc, nb, subs, g_tiles, dt, t_near, t_far, k_max, stop,
                gather, reduce, lo, inv, ns, cam, emit="banks",
                stencil="cell"):
    nch = stencil_rows(stencil)
    rest = list(rest)
    dacc_ref = rest.pop() if emit == "rows16" else None
    if cam:
        dcam_ref, planes_s, state_s = rest
    else:
        planes_s, state_s = rest
        dcam_ref = None
    red = _reducer(reduce)
    consts = (dt, t_near, t_far, k_max)
    geom = dict(lo=lo, inv=inv, ns=ns)
    tile0 = pl.program_id(0) * g_tiles

    def tile(g, _):
        ke = ke_ref[tile0 + g]
        rayt = _expand_rayt(rayt_ref[g])

        # The tile's gradient accumulates IN PLACE into its bank block:
        # chunks sharing cells reduce in VMEM and the HBM write is one
        # (NB, 32, 128) block per tile (round 2 wrote a full per-chunk
        # (nc, 32, banks*128) cotangent - 2.9x the bytes at the headline
        # config - and reduced it host-side). With emit="rows16" the
        # accumulator is a VMEM scratch block and the epilogue below
        # writes the u16 SLOT-ROW form instead (the merged params->
        # output VJP's layout) - the 168 MB/step XLA/Pallas bank->row
        # relayout pass this replaces was the single largest backward
        # phase at the headline config (tools/bwdsplit_probe.py).
        if emit == "rows16":
            def acc_get(b):
                return dacc_ref[b]

            def acc_set(b, v):
                dacc_ref[b] = v
        else:
            def acc_get(b):
                return dtabs_ref[g, b]

            def acc_set(b, v):
                dtabs_ref[g, b] = v
        for b in range(nb):
            acc_set(b, jnp.zeros((nch, LANES), jnp.float32))

        # Expand the compacted per-ray cotangents (16, 16) back to all
        # lanes of each 8-lane ray group (16, 128). Pad to full lane width
        # first (Mosaic's gather wants idx.shape == operand.shape).
        lane_ray = jax.lax.broadcasted_iota(
            jnp.int32, (ROWS, LANES), 1) // GROUP

        def expand(gs16):
            padded = jnp.concatenate(
                [gs16, jnp.zeros((ROWS, LANES - RAYS_COLS), jnp.float32)],
                axis=1)
            return jnp.take_along_axis(padded, lane_ray, axis=1)

        g_r, g_g, g_b, g_wd, g_odp = (
            expand(gs_ref[g, i]) for i in range(5))

        def win(c):
            return _Windows(tabs_ref, base_ref, g, b0_ref, tile0 + g, c,
                            nc, nb, subs)

        # Pass 1 (forward): recompute planes and prefix state per chunk.
        def fwd_chunk(c, carry_od):
            w = win(c)
            (sig, cr, cg, cb), _ = _chunk_eval(
                stencil, samp_ref[g, c], w, rayt, geom, gather)
            planes_s[c, 0] = sig
            planes_s[c, 1] = cr
            planes_s[c, 2] = cg
            planes_s[c, 3] = cb
            livef, dta, _ = _chunk_geometry(ke, c, consts)
            od = jnp.maximum(sig * dta, 0.0) * livef
            state_s[c, 0] = carry_od + red.prefix_excl(od)   # S (excl)
            return carry_od + red.group_sum(od)

        jax.lax.fori_loop(0, nc, fwd_chunk,
                          jnp.zeros((ROWS, LANES), jnp.float32))

        # Pass 2 (reverse): adjoint of the telescoped-weight integration.
        zero_p = jnp.zeros((ROWS, LANES), jnp.float32)

        def bwd_chunk(i, carry):
            carry_suf, dcams = carry
            c = nc - 1 - i
            sig = planes_s[c, 0]
            cr = planes_s[c, 1]
            cg = planes_s[c, 2]
            cb = planes_s[c, 3]
            s_pre = state_s[c, 0]
            livef, dta, tcur = _chunk_geometry(ke, c, consts)

            x = sig * dta
            od = jnp.maximum(x, 0.0) * livef
            tb = jnp.exp(-s_pre)
            p = jnp.exp(-(s_pre + od))
            procf = (livef * (tb > jnp.float32(stop)).astype(jnp.float32))
            w = (tb - p) * procf
            mid = tcur + 0.5 * dta

            # dL/dw_k (radiance + depth heads), then dL/dod_k:
            #  a) own-alpha term: gw * procf * p
            #  b) downstream prefix term: -sum_{j>k} gw_j w_j  (suffix sum)
            #  c) early-term sum head (t_final/opacity): g_odp * procf
            gw = g_r * cr + g_g * cg + g_b * cb + g_wd * mid
            gww = gw * w
            suffix = red.suffix_excl(gww) + carry_suf
            dod = gw * procf * p - suffix + g_odp * procf

            # od = maximum(x, 0) * livef with JAX's 0.5 tie grad at x == 0.
            tie = jnp.where(x > 0.0, 1.0, jnp.where(x < 0.0, 0.0, 0.5))
            dsig = dod * livef * tie * dta
            dplanes = (dsig, g_r * w, g_g * w, g_b * w)

            w2 = win(c)
            if stencil == "super":
                idx2, prep, (wx, wy, wz), lb = _sample_geometry_super(
                    samp_ref[g, c], w2, rayt, **geom)
                w27, hzy = _hat_weights((wx, wy, wz), lb)
                # wp[ch*27 + v] = hat weight * d(plane) - the supercell
                # analogue of the cell hoist below (108 full-plane
                # products per chunk; rows below only slice).
                wp = [w27[v] * dplanes[ch]
                      for ch in range(4) for v in range(27)]
            else:
                idx2, prep, (wx, wy, wz) = _sample_geometry(
                    samp_ref[g, c], w2, rayt, **geom)
                # FULL-plane weight products hoisted out of the row
                # loop: wp[ch*8 + corner] = corner weight * d(plane),
                # 48 (16, 128) multiplies per chunk instead of 768
                # single-row ones (the row loop below only slices) -
                # bit-identical products.
                w8 = _corner_weights((wx, wy, wz))
                wp = [w8[corner] * dplanes[ch]
                      for ch in range(4) for corner in range(8)]

            slot = jax.lax.broadcasted_iota(jnp.int32,
                                            (2 * LANES, LANES), 0)
            slot1 = slot[:LANES]
            rps = ROWS // subs
            for s2 in range(subs):
                b0 = w2.b0s[s2]
                rows2 = range(s2 * rps, (s2 + 1) * rps)

                # Single-bank fast path: the schedule's ALIGNED bit
                # promises every slot of this window lives in bank b0
                # (idx2 < 128), so the one-hot narrows to 128 slots -
                # half the MXU tile-passes AND half the one-hot compare
                # work. Same partial products in the same add order per
                # slot column as the wide path (whose bank-1 half is
                # exactly zero here): bit-identical bank gradients.
                @pl.when(w2.aligned[s2] == 1)
                def _aligned(b0=b0, rows2=rows2):
                    d0 = jnp.zeros((nch, LANES), jnp.float32)
                    for r in rows2:
                        d_cr = jnp.concatenate(
                            [p[r:r + 1, :] for p in wp], axis=0)
                        lrow = jnp.broadcast_to(idx2[r:r + 1, :],
                                                (LANES, LANES))
                        oh = (slot1 == lrow).astype(red.onehot_dtype)
                        d0 = d0 + red.scatter_dot(d_cr, oh)
                    acc_set(b0, acc_get(b0) + d0)

                @pl.when(w2.aligned[s2] == 0)
                def _wide(b0=b0, rows2=rows2):
                    d01 = jnp.zeros((nch, 2 * LANES), jnp.float32)
                    for r in rows2:
                        d_cr = jnp.concatenate(
                            [p[r:r + 1, :] for p in wp], axis=0)
                        # one-hot oh[s, l] = [idx2[r, l] == s], s
                        # spanning BOTH banks (s >= 128 = bank 1);
                        # contract on lanes: d[ch, s] = sum_l d_cr * oh.
                        # One 256-slot matmul replaces the earlier
                        # per-bank pair - same partial products and add
                        # order per output column (bit-identical), half
                        # the MXU issues and ONE bf16 3-split of d_cr
                        # per row instead of two.
                        lrow = jnp.broadcast_to(idx2[r:r + 1, :],
                                                (2 * LANES, LANES))
                        oh = (slot == lrow).astype(red.onehot_dtype)
                        d01 = d01 + red.scatter_dot(d_cr, oh)
                    # In-place bank accumulation into the sub-tile's
                    # window; when a window clamps (b1 == b0) no idx2
                    # reaches bank-1 slots, so the second half of d01 is
                    # exactly zero.
                    b1 = jnp.minimum(b0 + 1, nb - 1)
                    acc_set(b0, acc_get(b0) + d01[:, :LANES])
                    acc_set(b1, acc_get(b1) + d01[:, LANES:])

            if cam and stencil == "super":
                # Supercell camera adjoint: same chain as the cell
                # branch below, with the corner difference generalized
                # to hat-basis derivatives - dh[a]/dt is -1 at a == l,
                # +1 at a == l + 1, 0 elsewhere (m folded like the cell
                # path's wz/wyxm folding).
                packed = samp_ref[g, c, 2].astype(jnp.int32)
                m = ((packed >> 15) & 1).astype(jnp.float32)
                st = pltpu.bitcast(
                    (samp_ref[g, c, 0].astype(jnp.uint32) << 16)
                    | samp_ref[g, c, 1].astype(jnp.uint32), jnp.float32)
                lbx, lby, lbz = lb
                hx = _axis_hats((wx[0], wx[1]), lbx)
                hy = _axis_hats((wy[0], wy[1]), lby)
                hz = _axis_hats((wz[0], wz[1]), lbz)

                def dhat(lb_pl, scale):
                    return [jnp.where(lb_pl == a, -scale,
                                      jnp.where(lb_pl == a - 1, scale,
                                                0.0))
                            for a in range(3)]

                dhx = dhat(lbx, 1.0)
                dhy = dhat(lby, 1.0)
                dhz = dhat(lbz, m)
                hzx = {(a, b): hz[a] * hx[b]
                       for a in range(3) for b in range(3)}
                hyx = {(a, b): hy[a] * hx[b]
                       for a in range(3) for b in range(3)}
                dtx = dty = dtz = 0.0
                for ch in range(4):
                    dp = dplanes[ch]
                    v = {}
                    for vz in range(3):
                        for vy in range(3):
                            for vx in range(3):
                                v[(vz, vy, vx)] = w2.expand_tab(
                                    ch * 27 + vz * 9 + vy * 3 + vx, prep)
                    for az in range(3):
                        for ay in range(3):
                            inner = sum(dhx[ax] * v[(az, ay, ax)]
                                        for ax in range(3))
                            dtx += dp * (hzy[(az, ay)] * inner)
                    for az in range(3):
                        for ax in range(3):
                            inner = sum(dhy[ay] * v[(az, ay, ax)]
                                        for ay in range(3))
                            dty += dp * (hzx[(az, ax)] * inner)
                    for ay in range(3):
                        for ax in range(3):
                            inner = sum(dhz[az] * v[(az, ay, ax)]
                                        for az in range(3))
                            dtz += dp * (hyx[(ay, ax)] * inner)
                kx = jnp.float32(inv[0] * ns[0])
                ky = jnp.float32(inv[1] * ns[1])
                kz = jnp.float32(inv[2] * ns[2])
                dcams = (dcams[0] + dtx * kx, dcams[1] + dty * ky,
                         dcams[2] + dtz * kz,
                         dcams[3] + dtx * st * kx,
                         dcams[4] + dty * st * ky,
                         dcams[5] + dtz * st * kz)
            elif cam:
                # Camera adjoint: dL/d(trilinear fraction) per axis from
                # the weight adjoints (needs the corner VALUES again - 32
                # more window expansions), chained to the ray planes:
                # t_ax = ((o_ax + d_ax*st) - lo)*inv*ns - base, so
                # d(o_ax) = dt_ax * inv*ns and d(d_ax) = dt_ax * st*inv*ns.
                # Supersedes the reference's permanent zero dCam stub
                # (/root/reference/hotpath/src/cpu/diff_cpu.cpp:41-47,74)
                # ON the fused fast path.
                packed = samp_ref[g, c, 2].astype(jnp.int32)
                m = ((packed >> 15) & 1).astype(jnp.float32)
                st = pltpu.bitcast(
                    (samp_ref[g, c, 0].astype(jnp.uint32) << 16)
                    | samp_ref[g, c, 1].astype(jnp.uint32), jnp.float32)
                dtx = dty = dtz = 0.0
                # axis-PAIR weight products hoisted out of the channel
                # loop (12 full-plane multiplies instead of 48; same
                # multiplication order per term, bit-identical)
                wzy = {(a, b): wz[a] * wy[b] for a in (0, 1)
                       for b in (0, 1)}
                wzx = {(a, b): wz[a] * wx[b] for a in (0, 1)
                       for b in (0, 1)}
                wyxm = {(a, b): m * wy[a] * wx[b] for a in (0, 1)
                        for b in (0, 1)}
                for ch in range(4):
                    dp = dplanes[ch]
                    v = {}
                    for dz in (0, 1):
                        for dy in (0, 1):
                            for dx_ in (0, 1):
                                v[(dz, dy, dx_)] = w2.expand_tab(
                                    ch * 8 + dz * 4 + dy * 2 + dx_, prep)
                    for dz in (0, 1):
                        for dy in (0, 1):
                            dtx += dp * (wzy[(dz, dy)]
                                         * (v[(dz, dy, 1)] - v[(dz, dy, 0)]))
                    for dz in (0, 1):
                        for dx_ in (0, 1):
                            dty += dp * (wzx[(dz, dx_)]
                                         * (v[(dz, 1, dx_)] - v[(dz, 0, dx_)]))
                    for dy in (0, 1):
                        for dx_ in (0, 1):
                            dtz += dp * (wyxm[(dy, dx_)]
                                         * (v[(1, dy, dx_)] - v[(0, dy, dx_)]))
                kx = jnp.float32(inv[0] * ns[0])
                ky = jnp.float32(inv[1] * ns[1])
                kz = jnp.float32(inv[2] * ns[2])
                dcams = (dcams[0] + dtx * kx, dcams[1] + dty * ky,
                         dcams[2] + dtz * kz,
                         dcams[3] + dtx * st * kx, dcams[4] + dty * st * ky,
                         dcams[5] + dtz * st * kz)

            return (carry_suf + red.group_sum(gww), dcams)

        _, dcams = jax.lax.fori_loop(
            0, nc, bwd_chunk,
            (jnp.zeros((ROWS, LANES), jnp.float32), (zero_p,) * 6))

        if emit == "rows16":
            # Emit the tile's bank gradients as u16 SLOT ROWS (row =
            # lane, cols [hi16 of the 32 channels | lo16]) - exactly
            # ops/packed_transpose.py::banks_to_u16_rows of the f32
            # block, computed on the VMEM accumulator so the separate
            # relayout pass (and its HBM round trip) disappears.
            for b in range(nb):
                bits = pltpu.bitcast(dacc_ref[b], jnp.uint32)  # (32,128)
                bt = bits.T                                    # (128,32)
                hi = (bt >> jnp.uint32(16)).astype(jnp.uint16)
                lo = (bt & jnp.uint32(0xFFFF)).astype(jnp.uint16)
                dtabs_ref[g, b] = jnp.concatenate([hi, lo], axis=1)

        if cam:
            ray16 = jnp.minimum(
                jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1),
                RAYS_COLS - 1) * GROUP
            sums = red.group_sum_many(list(dcams))
            for ax in range(6):
                cacc = jnp.take_along_axis(sums[ax], ray16, axis=1)
                dcam_ref[g, ax] = cacc[:, :RAYS_COLS]
        return 0

    jax.lax.fori_loop(0, g_tiles, tile, 0)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pick_g_tiles(t_cnt, nc, nb, bwd_scratch=True,
                  vmem_budget=6 << 20, nch=NCH):
    """Tiles per grid step: amortize DMA-issue overhead while keeping
    double-buffered blocks + backward scratch within the VMEM budget. The
    schedule pads every group to a multiple of 8, so any power-of-two
    choice <= 8 divides t_cnt. ``nch``: table rows per bank (32 cell /
    108 supercell)."""
    per_tile = (nb * nch * LANES                     # tabs
                + nb * 3 * LANES                     # base
                + 16 * LANES) * 4                    # rayt (12 -> 16 pad)
    per_tile += nc * 3 * ROWS * LANES * 2            # samp (u16 planes)
    scratch = nc * 5 * ROWS * LANES * 4 if bwd_scratch else 0
    if bwd_scratch:
        per_tile += nb * nch * LANES * 4             # dtabs out block
        # (the emit="rows16" variant's u16 block is the SAME byte size:
        # (128, 64) u16 == (32, 128) f32 per bank)
        scratch += nb * nch * LANES * 4              # rows16 accumulator
    g = 8
    while g > 1 and (2 * g * per_tile + scratch > vmem_budget
                     or t_cnt % g):
        g //= 2
    return g


@functools.lru_cache(maxsize=64)
def _tile_op(nc, nb, subs, g_tiles, dt, t_near, t_far, k_max, stop,
             interpret, gather, reduce, lo, inv, ns, cam=False,
             stencil="cell"):
    """custom_vjp'd accumulator op for one (chunk count, bank count) group.

    (tabs (T,NB,32,128), samp (T,nc,3,16,128) u16, base (T,NB,3,128),
     rayt (T,12,128), ke (T,) int32, bank0 (T*nc,) int32) ->
    out (T,5,16,16): per-ray sums: radiance r/g/b, weighted mid-segment
    depth, processed optical depth (T_final = exp(-odp)). Each grid step
    processes ``g_tiles`` tiles; trilinear fractions are recomputed
    in-kernel from the slim schedule (lo/inv/ns = field bbox min, inverse
    extent, grid n-1 per axis). The lru_cache is bounded (ADVICE round 2):
    long-lived processes rendering many plans would otherwise accumulate
    unbounded custom_vjp objects and their jit caches.
    """
    # the MXU one-hot ablation expands against whole-tile windows
    # (win.mats[0]); sub-tiled schedules (subs > 1) carry PER-SUB-TILE
    # window-relative slots that would silently index the wrong banks
    check(not (gather == "mxu" and subs > 1),
          "gather='mxu' supports whole-tile windows only (subs == 1)")
    check(not (gather == "mxu" and stencil == "super"),
          "gather='mxu' supports the cell stencil only")
    nch = stencil_rows(stencil)
    kw = dict(nc=nc, nb=nb, subs=subs, g_tiles=g_tiles, dt=dt,
              t_near=t_near, t_far=t_far, k_max=k_max, stop=stop,
              gather=gather, reduce=reduce, lo=lo, inv=inv, ns=ns,
              stencil=stencil)
    kw_bwd = dict(kw, cam=cam)

    def in_specs():
        return [
            pl.BlockSpec((g_tiles, nb, nch, LANES),
                         lambda i, ke, b0: (i, 0, 0, 0)),
            pl.BlockSpec((g_tiles, nc, 3, ROWS, LANES),
                         lambda i, ke, b0: (i, 0, 0, 0, 0)),
            pl.BlockSpec((g_tiles, nb, 3, LANES),
                         lambda i, ke, b0: (i, 0, 0, 0)),
            pl.BlockSpec((g_tiles, RAYT_ROWS, LANES),
                         lambda i, ke, b0: (i, 0, 0)),
        ]

    def fwd_call(tabs, samp, base, rayt, ke, bank0):
        t_cnt = tabs.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # ke (T,), bank0 (T*nc,) in SMEM
            grid=(t_cnt // g_tiles,),
            in_specs=in_specs(),
            out_specs=pl.BlockSpec((g_tiles, 5, ROWS, RAYS_COLS),
                                   lambda i, ke, b0: (i, 0, 0, 0)),
        )
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (t_cnt, 5, ROWS, RAYS_COLS), jnp.float32),
            # Independent tiles: "parallel" lets Mosaic overlap each grid
            # step's DMA with the previous step's compute - measured 2x
            # over the default "arbitrary" semantics (tile_kernel_probe).
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(ke, bank0, tabs, samp, base, rayt)

    def bwd_call(tabs, samp, base, rayt, ke, bank0, gs, emit="banks"):
        t_cnt = tabs.shape[0]
        check(not (emit == "rows16" and stencil == "super"),
              "rows16 emit is cell-stencil only (the u16 slot-row "
              "relayout is 32-channel)")
        if emit == "rows16":
            out_shapes = [jax.ShapeDtypeStruct(
                (t_cnt, nb, LANES, 64), jnp.uint16)]
            out_specs = [pl.BlockSpec((g_tiles, nb, LANES, 64),
                                      lambda i, ke, b0: (i, 0, 0, 0))]
        else:
            out_shapes = [jax.ShapeDtypeStruct(
                (t_cnt, nb, nch, LANES), jnp.float32)]
            out_specs = [pl.BlockSpec((g_tiles, nb, nch, LANES),
                                      lambda i, ke, b0: (i, 0, 0, 0))]
        if cam:
            out_shapes.append(jax.ShapeDtypeStruct(
                (t_cnt, 6, ROWS, RAYS_COLS), jnp.float32))
            out_specs.append(pl.BlockSpec(
                (g_tiles, 6, ROWS, RAYS_COLS),
                lambda i, ke, b0: (i, 0, 0, 0)))
        scratch = [
            pltpu.VMEM((nc, 4, ROWS, LANES), jnp.float32),
            pltpu.VMEM((nc, 1, ROWS, LANES), jnp.float32),
        ]
        if emit == "rows16":
            scratch.append(pltpu.VMEM((nb, NCH, LANES), jnp.float32))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t_cnt // g_tiles,),
            in_specs=in_specs() + [
                pl.BlockSpec((g_tiles, 5, ROWS, RAYS_COLS),
                             lambda i, ke, b0: (i, 0, 0, 0)),
            ],
            out_specs=out_specs if cam else out_specs[0],
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel, emit=emit, **kw_bwd),
            grid_spec=grid_spec,
            out_shape=out_shapes if cam else out_shapes[0],
            # Steps are independent (scratch is fully rewritten by pass 1
            # before pass 2 reads it, within each step).
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(ke, bank0, tabs, samp, base, rayt, gs)

    @jax.custom_vjp
    def op(tabs, samp, base, rayt, ke, bank0):
        return fwd_call(tabs, samp, base, rayt, ke, bank0)

    def op_fwd(tabs, samp, base, rayt, ke, bank0):
        return fwd_call(tabs, samp, base, rayt, ke, bank0), (
            tabs, samp, base, rayt, ke, bank0)

    def op_bwd(res, g):
        tabs, samp, base, rayt, ke, bank0 = res
        out = bwd_call(tabs, samp, base, rayt, ke, bank0, g)
        if cam:
            dtabs, dcam = out
            # (T, 6, 16, 16) per-ray sums -> the compact rayt layout
            # (T, 12, 128): flatten (16, 16) to the within-tile ray id
            # (row-major), then split into the two 128-ray halves.
            t_cnt = dcam.shape[0]
            d_rayt = dcam.reshape(t_cnt, 6, 2, LANES).reshape(
                t_cnt, RAYT_ROWS, LANES)
        else:
            dtabs = out
            d_rayt = jnp.zeros_like(rayt)
        # samp is integer data (u16 planes): its cotangent type is float0
        d_samp = np.zeros(samp.shape, jax.dtypes.float0)
        return (dtabs, d_samp, jnp.zeros_like(base),
                d_rayt, None, None)

    op.defvjp(op_fwd, op_bwd)
    # Raw pallas entry points for the merged params->output VJP
    # (render/tiled.py::_groupset_from_params): it spans from (sigma,
    # color) so the per-group cotangent never has to match the bank
    # blocks' f32 aval - the backward kernel emits u16 slot rows
    # directly (emit="rows16") and the relayout pass disappears.
    op.fwd_call = fwd_call
    op.bwd_call = bwd_call
    return op


def tile_op_params(plan, geom, nb, n_chunks, subs, t_cnt,
                   interpret=None, gather="dg", reduce=None,
                   cam_grads=False, stencil="cell"):
    """The hashable `_tile_op` key for one group - shared by
    render_tile_group_raw and the merged params->output VJP so both
    routes hit the same cached op (and the same compiled Mosaic
    variants)."""
    if interpret is None:
        interpret = _interpret_default()
    if reduce is None:
        reduce = DEFAULT_REDUCE
    bbox_min, bbox_max, grid_shape = geom
    nz, ny, nx = (int(v) for v in grid_shape)
    lo = tuple(float(v) for v in bbox_min)
    inv = tuple(
        float(1.0 / (float(hi) - float(l))) if float(hi) != float(l)
        else 0.0
        for l, hi in zip(bbox_min, bbox_max))
    ns = (float(nx - 1), float(ny - 1), float(nz - 1))
    g_tiles = _pick_g_tiles(int(t_cnt), int(n_chunks), int(nb),
                            nch=stencil_rows(stencil))
    return (int(n_chunks), int(nb), int(subs), int(g_tiles),
            float(plan.sampling.dt), float(plan.t_near),
            float(plan.t_far), int(plan.sampling.max_steps),
            float(STOP_THRESHOLD), bool(interpret), str(gather),
            str(reduce), lo, inv, ns, bool(cam_grads), str(stencil))


def render_tile_group_raw(plan, geom, tabs, samp, base, rayt, k_enter,
                          bank0, n_chunks, subs: int = 1,
                          interpret: bool | None = None,
                          gather: str = "dg", reduce: str = DEFAULT_REDUCE,
                          cam_grads: bool = False,
                          stencil: str = "cell"):
    """Fused forward for one tile group, RAW accumulator heads.

    ``geom`` = (bbox_min, bbox_max, grid_shape_zyx) - the field geometry
    the schedule was built for (fraction recompute constants).
    Returns (T, 5, 16, 16) float32: radiance r/g/b, weighted mid-segment
    depth, processed optical depth per ray, laid out as image tiles
    (row = pixel y, lane = pixel x within the 16x16 tile). Differentiable
    w.r.t. ``tabs``; with ``cam_grads=True`` also w.r.t. ``rayt`` (the
    backward's pass 2 emits the ray-plane adjoint - the fast path's
    camera gradient, superseding the reference's permanent zero dCam
    stub, diff_cpu.cpp:41-47,74).
    """
    op = _tile_op(*tile_op_params(
        plan, geom, int(tabs.shape[1]), n_chunks, subs,
        int(tabs.shape[0]), interpret=interpret, gather=gather,
        reduce=reduce, cam_grads=cam_grads, stencil=stencil))
    ke1 = k_enter.reshape(-1).astype(jnp.int32)
    b01 = bank0.reshape(-1).astype(jnp.int32)
    return op(tabs, samp, base, rayt, ke1, b01)


def finalize_heads(plan, raw, axis=1):
    """Raw accumulator heads -> (radiance(3), transmittance, opacity,
    depth) with the integration output semantics (ops/integrate.py)."""
    r, g, b, wd, odp = (jnp.take(raw, i, axis=axis) for i in range(5))
    t_final = jnp.exp(-odp)
    opacity = 1.0 - t_final
    depth = jnp.where(opacity > OPACITY_EPS,
                      wd / jnp.maximum(opacity, OPACITY_EPS),
                      jnp.float32(plan.t_far))
    return (r, g, b), t_final, opacity, depth


def render_tile_group(plan, geom, tabs, samp, base, rayt, k_enter,
                      bank0, n_chunks, subs: int = 1,
                      interpret: bool | None = None,
                      gather: str = "dg", reduce: str = DEFAULT_REDUCE):
    """Per-ray integration outputs for one tile group (flat ray order,
    matching TileGroup.pixel_ids): (radiance (R, 3), transmittance (R,),
    opacity (R,), depth (R,)) with R = n_tiles * 256."""
    out = render_tile_group_raw(plan, geom, tabs, samp, base, rayt,
                                k_enter, bank0, n_chunks, subs=subs,
                                interpret=interpret, gather=gather,
                                reduce=reduce)
    (r, g, b), t_final, opacity, depth = finalize_heads(plan, out)
    flat = lambda a: a.reshape(-1)
    radiance = jnp.stack([flat(r), flat(g), flat(b)], axis=-1)
    return radiance, flat(t_final), flat(opacity), flat(depth)
