"""Fused tile-group render kernel: the north-star Pallas hot path.

Consumes the host-resolved tile-table schedule (render/tiled.py): for each
(16x16-pixel tile, 8-step chunk) the host has already collected the <= 128
distinct grid cells touched and per-sample slot ids + trilinear fractions.
This kernel does everything after the per-slot table gather IN ONE PASS per
tile - the TPU-native equivalent of the reference's fused samp+int device
kernel plus CUDA-Graph steady state (role models:
``hotpath/src/cpu/samp_int_fused.cpp:11-76``,
``hotpath/src/cuda/graph_cuda.cu:120-205``; north star per SURVEY.md 2.3):

1. slot -> value expansion with ``tpu.dynamic_gather``
   (``jnp.take_along_axis(op, idx, axis=1)`` with op/idx both (16, 128)):
   one vector shuffle per packed channel replaces 2048 XLA gather starts -
   the measured ~150M starts/s XLA ceiling never applies in-kernel;
2. trilinear interpolation from the host-precomputed fractions (corner-order
   sum, matching render/tiled.py::_group_reference_planes bit-for-bit on the
   gathered values);
3. the transmittance recurrence, reformulated (like ops/integrate.py) as
   prefix sums of optical depth. All per-ray reductions are SUMS because
   ``processed`` is a prefix mask, so they map onto tiny MXU matmuls with
   group-structure masks: out = x @ M with M[l', l] = [same 8-lane ray
   group and l' < l] (exclusive prefix) or [same group] (broadcast sum),
   at Precision.HIGH - exact for 0/1 masks (see _MASK_PRECISION) at half
   the passes of HIGHEST. (A VPU butterfly of masked ``pltpu.roll``-adds
   measured ~25% slower than the mask matmuls on v5e - cross-lane rotates
   are expensive; it survives as the ``reduce="roll"`` probe ablation.)
   Early termination is exact: T_final = exp(-sum of processed od).

The backward is a custom VJP (no residuals beyond the inputs): pass 1
re-runs the gather+interpolation storing per-chunk planes and prefix state
in VMEM scratch, pass 2 walks the chunks in reverse applying the adjoint of
the telescoped-weight formulation (the jax.grad semantics of
ops/integrate.py::integrate, including the maximum(x, 0) tie gradient of
0.5) and scatter-accumulates d(table) with one-hot matmuls on the MXU.

Layouts (see render/tiled.py): samples of a chunk sit at (block row r,
lane l) with ray = r*16 + l//8 and in-chunk step j = l%8; tabs are
(T, nc, 32, 128) with row ch*8 + corner (channel-major packed stencil,
corner = dz*4 + dy*2 + dx) and lane = cell slot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvren_tpu.ops.integrate import OPACITY_EPS, STOP_THRESHOLD

ROWS = 16          # block rows per chunk
LANES = 128        # lanes per row
GROUP = 8          # lanes per ray (= steps per chunk)
RAYS_PER_TILE = 256
NCH = 32           # packed channels: 4 (sigma, r, g, b) x 8 corners


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
    """x @ M for a {0,1} mask in THREE native bf16 MXU passes.

    Splitting only the f32 operand (the mask is already bf16-exact) makes
    every partial product exact, so three passes reconstruct the same sums
    HIGHEST computes with six (it splits BOTH operands). The three partial
    results re-add in f32 (<= 1 ulp reassociation vs a fused accumulate)."""
    acc = None
    for part in _split3_bf16(x):
        d = jnp.dot(part, m_bf16, preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


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
    """Group reductions on the MXU (the production default)."""

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
    :func:`_mask_dot3`): same sums as HIGHEST at half the MXU passes."""

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

    prefix_excl = staticmethod(_prefix_excl_roll)
    suffix_excl = staticmethod(_suffix_excl_roll)
    group_sum = staticmethod(_group_sum_roll)

    def group_sum_many(self, xs):
        return [_group_sum_roll(x) for x in xs]


_REDUCERS = {"mxu": _MxuReduce, "mxu3": _Mxu3Reduce, "roll": _RollReduce}


def _reducer(reduce: str):
    return _REDUCERS[reduce]()


def _samp_unpack(samp_c):
    """Split one chunk's packed sample block (5, 16, 128) f32 into
    (fracs (4, 16, 128), lidx (16, 128) int32).

    Channel 4 carries the slot ids BITCAST to f32 (host-side
    ``lidx.view(np.float32)``): packing the static schedule into ONE array
    per group halves the kernel's input DMA count - the measured kernel
    floor is DMA-issue overhead, not bytes or compute (tile_kernel_probe).
    """
    lidx = pltpu.bitcast(samp_c[4], jnp.int32)
    return samp_c[0:4], lidx


def _gather_planes_dg(tabs_c, lidx_c, fracs_c):
    """Per-sample (sigma, r, g, b) planes for one chunk, each (16, 128),
    via ``tpu.dynamic_gather`` (one vector shuffle per packed channel).

    tabs_c: (32, 128) cell table; lidx_c: (16, 128) int32 slots;
    fracs_c: (4, 16, 128) = tx, ty, tz, m (m folds inside-bbox AND live).
    """
    banks = tabs_c.shape[1] // LANES
    tx, ty, tz, m = (fracs_c[0], fracs_c[1], fracs_c[2], fracs_c[3])
    wx = (1.0 - tx, tx)
    wy = (1.0 - ty, ty)
    wz = (m * (1.0 - tz), m * tz)
    bank_of = lidx_c // LANES
    planes = []
    for ch in range(4):
        acc = jnp.zeros((ROWS, LANES), jnp.float32)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    col = ch * 8 + dz * 4 + dy * 2 + dx
                    val = jnp.zeros((ROWS, LANES), jnp.float32)
                    for b in range(banks):
                        row = jnp.broadcast_to(
                            tabs_c[col:col + 1, b * LANES:(b + 1) * LANES],
                            (ROWS, LANES))
                        idx = jnp.clip(lidx_c - b * LANES, 0, LANES - 1)
                        got = jnp.take_along_axis(row, idx, axis=1)
                        val = got if banks == 1 else jnp.where(
                            bank_of == b, got, val)
                    acc = acc + (wz[dz] * wy[dy] * wx[dx]) * val
        planes.append(acc)
    return planes


def _gather_planes_mxu(tabs_c, lidx_c, fracs_c):
    """Same contract as :func:`_gather_planes_dg`, but the slot expansion
    runs on the MXU: per block row r, cube_r = tabs_c @ OH_r with
    OH_r[s, l] = [lidx[r, l] == s]. One-hot f32 matmuls are EXACT (each
    output column is a single table value: the bf16x3 split of v times
    exactly-representable 0/1 recombines to v, and zero terms add
    exactly), so the gathered values match the dynamic-gather variant
    bitwise.
    Trilinear reduction happens per row in channel-major layout
    ((32, 128) -> (4, 8, 128) corner sum; the 8-corner reduction may
    reassociate vs the sequential corner adds - within the 1e-5 budget),
    avoiding cross-row relayouts.
    """
    banks = tabs_c.shape[1] // LANES
    slot = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    fr = fracs_c  # (4, 16, 128)
    rows = [[] for _ in range(4)]
    for r in range(ROWS):
        lrow = jnp.broadcast_to(lidx_c[r:r + 1, :], (LANES, LANES))
        cube_r = jnp.zeros((NCH, LANES), jnp.float32)
        for b in range(banks):
            oh = (slot + b * LANES == lrow).astype(jnp.float32)
            cube_r = cube_r + jnp.dot(
                tabs_c[:, b * LANES:(b + 1) * LANES], oh,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (32, 128)
        tx = fr[0, r:r + 1, :]
        ty = fr[1, r:r + 1, :]
        tz = fr[2, r:r + 1, :]
        m = fr[3, r:r + 1, :]
        wx = (1.0 - tx, tx)
        wy = (1.0 - ty, ty)
        wz = (m * (1.0 - tz), m * tz)
        # corner weights in packed-corner order (dz*4 + dy*2 + dx)
        wc8 = jnp.concatenate(
            [wz[dz] * wy[dy] * wx[dx]
             for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
            axis=0)                                           # (8, 128)
        weighted = cube_r.reshape(4, 8, LANES) * wc8[None]    # (4, 8, 128)
        vals = jnp.sum(weighted, axis=1)                      # (4, 128)
        for ch in range(4):
            rows[ch].append(vals[ch:ch + 1, :])
    return [jnp.concatenate(rs, axis=0) for rs in rows]


_GATHER_IMPLS = {"dg": _gather_planes_dg, "mxu": _gather_planes_mxu}


def _chunk_geometry(ke, c, consts):
    """(live mask f32, dt_actual) for chunk c of a tile starting at ke."""
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
    return livef, dta


def _fwd_kernel(ke_ref, tabs_ref, samp_ref, out_ref,
                *, nc, g_tiles, dt, t_near, t_far, k_max, stop, gather,
                reduce):
    red = _reducer(reduce)
    consts = (dt, t_near, t_far, k_max)
    tile0 = pl.program_id(0) * g_tiles

    def tile(g, _):
        ke = ke_ref[tile0 + g]
        t_origin = (jnp.float32(t_near)
                    + ke.astype(jnp.float32) * jnp.float32(dt))
        zeros = jnp.zeros((ROWS, LANES), jnp.float32)
        init = (zeros, zeros, zeros, zeros, zeros,   # acc r, g, b, wd, odp
                zeros,                               # carry: sum of live od
                jnp.full((ROWS, LANES), t_origin, jnp.float32))  # t cursor

        def chunk(c, carry):
            acc_r, acc_g, acc_b, acc_wd, acc_odp, carry_od, carry_t = carry
            fracs_c, lidx_c = _samp_unpack(samp_ref[g, c])
            sig, cr, cg, cb = _GATHER_IMPLS[gather](
                tabs_ref[g, c], lidx_c, fracs_c)
            livef, dta = _chunk_geometry(ke, c, consts)

            od = jnp.maximum(sig * dta, 0.0) * livef
            s_pre = carry_od + red.prefix_excl(od)
            tb = jnp.exp(-s_pre)
            p = jnp.exp(-(s_pre + od))
            procf = (livef * (tb > jnp.float32(stop)).astype(jnp.float32))
            w = (tb - p) * procf

            tcur = carry_t + red.prefix_excl(dta)
            mid = tcur + 0.5 * dta

            sums = red.group_sum_many(
                [w * cr, w * cg, w * cb, w * mid, od * procf, od, dta])
            return (acc_r + sums[0], acc_g + sums[1], acc_b + sums[2],
                    acc_wd + sums[3], acc_odp + sums[4],
                    carry_od + sums[5], carry_t + sums[6])

        acc_r, acc_g, acc_b, acc_wd, acc_odp, _, _ = jax.lax.fori_loop(
            0, nc, chunk, init)
        out_ref[g, 0] = acc_r
        out_ref[g, 1] = acc_g
        out_ref[g, 2] = acc_b
        out_ref[g, 3] = acc_wd
        out_ref[g, 4] = acc_odp
        return 0

    jax.lax.fori_loop(0, g_tiles, tile, 0)


def _bwd_kernel(ke_ref, tabs_ref, samp_ref, gs_ref,
                dtabs_ref, planes_s, state_s,
                *, nc, g_tiles, dt, t_near, t_far, k_max, stop, gather,
                reduce):
    red = _reducer(reduce)
    consts = (dt, t_near, t_far, k_max)
    tile0 = pl.program_id(0) * g_tiles

    def tile(g, _):
        ke = ke_ref[tile0 + g]
        # Broadcast output cotangents to all lanes of each ray group (the
        # forward emitted per-ray values replicated across the group, so
        # the true accumulator cotangent is the sum over its lanes).
        g_r, g_g, g_b, g_wd, g_odp = red.group_sum_many(
            [gs_ref[g, 0], gs_ref[g, 1], gs_ref[g, 2], gs_ref[g, 3],
             gs_ref[g, 4]])

        t_origin = (jnp.float32(t_near)
                    + ke.astype(jnp.float32) * jnp.float32(dt))

        # Pass 1 (forward): recompute planes and prefix state per chunk.
        def fwd_chunk(c, carry):
            carry_od, carry_t = carry
            fracs_c, lidx_c = _samp_unpack(samp_ref[g, c])
            sig, cr, cg, cb = _GATHER_IMPLS[gather](
                tabs_ref[g, c], lidx_c, fracs_c)
            planes_s[c, 0] = sig
            planes_s[c, 1] = cr
            planes_s[c, 2] = cg
            planes_s[c, 3] = cb
            livef, dta = _chunk_geometry(ke, c, consts)
            od = jnp.maximum(sig * dta, 0.0) * livef
            state_s[c, 0] = carry_od + red.prefix_excl(od)   # S (excl)
            state_s[c, 1] = carry_t + red.prefix_excl(dta)   # t cursor
            sums = red.group_sum_many([od, dta])
            return (carry_od + sums[0], carry_t + sums[1])

        jax.lax.fori_loop(
            0, nc, fwd_chunk,
            (jnp.zeros((ROWS, LANES), jnp.float32),
             jnp.full((ROWS, LANES), t_origin, jnp.float32)))

        # Pass 2 (reverse): adjoint of the telescoped-weight integration.
        def bwd_chunk(i, carry_suf):
            c = nc - 1 - i
            sig = planes_s[c, 0]
            cr = planes_s[c, 1]
            cg = planes_s[c, 2]
            cb = planes_s[c, 3]
            s_pre = state_s[c, 0]
            tcur = state_s[c, 1]
            livef, dta = _chunk_geometry(ke, c, consts)

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

            fracs_c, lidx_c = _samp_unpack(samp_ref[g, c])
            tx, ty, tz, m = (fracs_c[0], fracs_c[1], fracs_c[2], fracs_c[3])
            wx = (1.0 - tx, tx)
            wy = (1.0 - ty, ty)
            wz = (m * (1.0 - tz), m * tz)

            slot = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            banks = dtabs_ref.shape[-1] // LANES
            dtabs_c = [jnp.zeros((NCH, LANES), jnp.float32)
                       for _ in range(banks)]
            for r in range(ROWS):
                rows = []
                for ch in range(4):
                    dp_r = dplanes[ch][r:r + 1, :]
                    for dz in (0, 1):
                        for dy in (0, 1):
                            for dx in (0, 1):
                                wc = (wz[dz] * wy[dy] * wx[dx])[r:r + 1, :]
                                rows.append(wc * dp_r)
                d_cr = jnp.concatenate(rows, axis=0)          # (32, 128)
                # one-hot oh[s, l] = [lidx[r, l] == s + b*128] per bank;
                # contract both on lanes: dtabs[ch, s] = sum_l d_cr * oh
                lrow = jnp.broadcast_to(lidx_c[r:r + 1, :], (LANES, LANES))
                for b in range(banks):
                    oh = (slot + b * LANES == lrow).astype(jnp.float32)
                    dtabs_c[b] = dtabs_c[b] + jax.lax.dot_general(
                        d_cr, oh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_MASK_PRECISION)
            dtabs_ref[g, c] = (dtabs_c[0] if banks == 1
                               else jnp.concatenate(dtabs_c, axis=1))

            return carry_suf + red.group_sum(gww)

        jax.lax.fori_loop(0, nc, bwd_chunk,
                          jnp.zeros((ROWS, LANES), jnp.float32))
        return 0

    jax.lax.fori_loop(0, g_tiles, tile, 0)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pick_g_tiles(t_cnt, nc, banks, bwd_scratch=True,
                  vmem_budget=6 << 20):
    """Tiles per grid step: amortize DMA-issue overhead (the measured
    kernel floor) while keeping double-buffered blocks + backward scratch
    within the VMEM budget. The schedule pads every group to a multiple of
    8, so any power-of-two choice <= 8 divides t_cnt."""
    per_tile = nc * (NCH * banks * LANES + 5 * ROWS * LANES) * 4
    scratch = nc * 6 * ROWS * LANES * 4 if bwd_scratch else 0
    g = 8
    while g > 1 and (2 * g * per_tile + scratch > vmem_budget
                     or t_cnt % g):
        g //= 2
    return g


@functools.lru_cache(maxsize=None)
def _tile_op(nc, banks, g_tiles, dt, t_near, t_far, k_max, stop, interpret,
             gather, reduce):
    """custom_vjp'd accumulator op for one chunk-count group.

    (tabs (T,nc,32,banks*128), samp (T,nc,5,16,128), ke (T,) int32) ->
    out (T,5,16,128): per-ray sums replicated across each 8-lane group:
    radiance r/g/b, weighted mid-segment depth, processed optical depth
    (T_final = exp(-odp)). Each grid step processes ``g_tiles`` tiles with
    single fat input/output DMAs (the kernel is DMA-issue-bound).
    """
    kw = dict(nc=nc, g_tiles=g_tiles, dt=dt, t_near=t_near, t_far=t_far,
              k_max=k_max, stop=stop, gather=gather, reduce=reduce)

    def fwd_call(tabs, samp, ke):
        t_cnt = tabs.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # ke: (T,) int32, whole array in SMEM
            grid=(t_cnt // g_tiles,),
            in_specs=[
                pl.BlockSpec((g_tiles, nc, NCH, banks * LANES),
                             lambda i, ke: (i, 0, 0, 0)),
                pl.BlockSpec((g_tiles, nc, 5, ROWS, LANES),
                             lambda i, ke: (i, 0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((g_tiles, 5, ROWS, LANES),
                                   lambda i, ke: (i, 0, 0, 0)),
        )
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (t_cnt, 5, ROWS, LANES), jnp.float32),
            interpret=interpret,
        )(ke, tabs, samp)

    def bwd_call(tabs, samp, ke, gs):
        t_cnt = tabs.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_cnt // g_tiles,),
            in_specs=[
                pl.BlockSpec((g_tiles, nc, NCH, banks * LANES),
                             lambda i, ke: (i, 0, 0, 0)),
                pl.BlockSpec((g_tiles, nc, 5, ROWS, LANES),
                             lambda i, ke: (i, 0, 0, 0, 0)),
                pl.BlockSpec((g_tiles, 5, ROWS, LANES),
                             lambda i, ke: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((g_tiles, nc, NCH, banks * LANES),
                                   lambda i, ke: (i, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((nc, 4, ROWS, LANES), jnp.float32),
                pltpu.VMEM((nc, 2, ROWS, LANES), jnp.float32),
            ],
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (t_cnt, nc, NCH, banks * LANES), jnp.float32),
            interpret=interpret,
        )(ke, tabs, samp, gs)

    @jax.custom_vjp
    def op(tabs, samp, ke):
        return fwd_call(tabs, samp, ke)

    def op_fwd(tabs, samp, ke):
        return fwd_call(tabs, samp, ke), (tabs, samp, ke)

    def op_bwd(res, g):
        tabs, samp, ke = res
        dtabs = bwd_call(tabs, samp, ke, g)
        return (dtabs, jnp.zeros_like(samp), None)

    op.defvjp(op_fwd, op_bwd)
    return op


def render_tile_group(plan, tabs, samp, k_enter, n_chunks,
                      interpret: bool | None = None,
                      gather: str = "dg", reduce: str = "mxu"):
    """Fused forward for one tile group: per-ray integration outputs.

    Returns (radiance (R, 3), transmittance (R,), opacity (R,), depth (R,))
    with R = n_tiles * 256 in tile-local ray order (matches
    TileGroup.pixel_ids). Differentiable w.r.t. ``tabs``.
    """
    if interpret is None:
        interpret = _interpret_default()
    banks = tabs.shape[-1] // LANES
    t_cnt = int(tabs.shape[0])
    g_tiles = _pick_g_tiles(t_cnt, int(n_chunks), int(banks))
    op = _tile_op(int(n_chunks), int(banks), int(g_tiles),
                  float(plan.sampling.dt),
                  float(plan.t_near), float(plan.t_far),
                  int(plan.sampling.max_steps), float(STOP_THRESHOLD),
                  bool(interpret), str(gather), str(reduce))
    ke1 = k_enter.reshape(-1).astype(jnp.int32)
    out = op(tabs, samp, ke1)

    def per_ray(i):  # group-replicated (T,16,128) -> (T*256,) ray order
        return out[:, i, :, ::GROUP].reshape(-1)

    odp = per_ray(4)
    t_final = jnp.exp(-odp)
    opacity = 1.0 - t_final
    wd = per_ray(3)
    depth = jnp.where(opacity > OPACITY_EPS,
                      wd / jnp.maximum(opacity, OPACITY_EPS),
                      jnp.float32(plan.t_far))
    radiance = jnp.stack(
        [per_ray(0), per_ray(1), per_ray(2)], axis=-1)
    return radiance, t_final, opacity, depth
