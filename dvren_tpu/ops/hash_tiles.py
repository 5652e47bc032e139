"""Fused hash-MLP tile kernel: the field's fast path on TPU.

The reference built (dead) device kernels for this field
(``/root/reference/hotpath/src/cuda/hash_mlp_cuda.cu:12-326`` - compiled
but never wired into the sampling path); here the whole pipeline - hash
encoding, trilinear feature interpolation, both MLP heads, and the
transmittance recurrence with early termination - runs in ONE Pallas
kernel per tile group, sharing the dense path's tile/block structure
(ops/fused_tiles.py).

Key structural facts that make this kernel SLOT-FREE:

- the reference's hash tables are TINY (``table_size`` rows per level,
  default 16, 2 features each): each (level, feature) row of the whole
  table fits the 128-lane register width, so the ENTIRE table lives in
  VMEM as an (L*F, 128) block and per-sample lookups are
  ``tpu.dynamic_gather`` lane shuffles against in-kernel computed hash
  indices (wrapping uint32 3-prime XOR, hash_mlp_cpu.cpp:9-18) - no
  host-resolved slots, no per-camera tables, and therefore ZERO
  schedule rebuild cost under camera motion (unlike the dense path's
  capture-specialized cell tables);
- the MLP heads read their (tiny) weights from SMEM scalars (scalar
  prefetch) and run as per-plane FMAs over the (16, 128) sample blocks;
  per-chunk costs are almost pure VPU work (the kernel's only DMA is
  rayt + the sample_t planes).

The backward is a custom VJP (recompute, no residuals): pass 1 re-runs
the forward storing per-chunk (sigma, r, g, b) planes + the prefix
state; pass 2 walks chunks in reverse applying the integration adjoint
(identical to the dense kernel's telescoped-weight form), then chains
through clamp/ReLU ties (matching jax.grad's 0.5 tie conventions),
accumulates the MLP weight gradients with per-row MXU dots, and
accumulates the hash TABLE gradient with per-(row, level) weighted
one-hot contractions: the 8 corner one-hots of one block row stack to a
(8*T, 128) matrix whose single MXU contraction against the F feature
adjoints emits every corner/feature contribution at once.

Requires ``table_size <= 128`` and a power of two (the default 16 is),
``hidden_dim <= 8`` and ``encoding_dim <= 64`` (see ``fast_path_ok``);
other specs fall back to the streamed XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dvren_tpu.core.status import check
from dvren_tpu.ops.fused_tiles import (GROUP, LANES, RAYS_COLS, RAYT_ROWS,
                                       ROWS, _chunk_geometry, _expand_rayt,
                                       _interpret_default, _reducer)
from dvren_tpu.ops.hashmlp import _PRIME_Y, _PRIME_Z, HashMLPSpec
from dvren_tpu.ops.integrate import STOP_THRESHOLD

_HI = jax.lax.Precision.HIGHEST


def level_resolutions(spec: HashMLPSpec) -> tuple:
    """Per-level resolutions with ops/hashmlp.py::eval_planes' float32
    arithmetic (base * exp(l * ln(finest/base)/(L-1))), or the spec's
    explicit ``resolutions`` when set."""
    if spec.resolutions is not None:
        return tuple(float(np.float32(r)) for r in spec.resolutions)
    L = spec.n_levels
    denom = np.float32(L - 1) if L > 1 else np.float32(1)
    log_scale = np.float32(
        np.log(np.float32(spec.finest_resolution)
               / np.float32(spec.base_resolution),
               dtype=np.float32)) / denom
    return tuple(
        float(np.float32(spec.base_resolution)
              * np.exp(np.float32(l) * log_scale, dtype=np.float32))
        for l in range(L))


def fast_path_ok(spec: HashMLPSpec) -> bool:
    t = spec.table_size
    return (0 < t <= 128 and (t & (t - 1)) == 0
            and spec.encoding_dim <= 64
            and spec.hidden_dim <= 8)


def _mlp_layout(spec: HashMLPSpec):
    """Static offsets into the packed MLP scalar vector."""
    enc, hid = spec.encoding_dim, spec.hidden_dim
    o = {}
    i = 0
    for name, n in (("sw1", hid * enc), ("sb1", hid), ("sw2", hid),
                    ("sb2", 1), ("cw1", hid * enc), ("cb1", hid),
                    ("cw2", 3 * hid), ("cb2", 3)):
        o[name] = i
        i += n
    o["total"] = i
    return o


def pack_mlp_scalars(params: dict, spec: HashMLPSpec) -> jnp.ndarray:
    """Flatten the MLP head parameters (everything but the hash table)
    into one (P,) f32 vector for SMEM scalar prefetch (:func:`_mlp_layout`
    gives the offsets)."""
    return jnp.concatenate([
        params["sigma_w1"].reshape(-1), params["sigma_b1"].reshape(-1),
        params["sigma_w2"].reshape(-1),
        jnp.atleast_1d(params["sigma_b2"]).reshape(-1),
        params["color_w1"].reshape(-1), params["color_b1"].reshape(-1),
        params["color_w2"].reshape(-1), params["color_b2"].reshape(-1),
    ]).astype(jnp.float32)


def table_block(params: dict, spec: HashMLPSpec) -> jnp.ndarray:
    """Hash table as the kernel's (8, 128) VMEM block: row l*F + f,
    lane = table entry (zero-padded beyond table_size; rows pad to the
    f32 sublane tile)."""
    L, F, T = spec.n_levels, spec.features_per_level, spec.table_size
    rows = -(-(L * F) // 8) * 8
    t = jnp.transpose(params["hash_table"], (0, 2, 1)).reshape(L * F, T)
    return jnp.pad(t.astype(jnp.float32),
                   ((0, rows - L * F), (0, LANES - T)))


def grads_from_blocks(dtab, dmlp, spec: HashMLPSpec) -> dict:
    """Assemble the params-dict cotangent from the backward kernel's
    padded blocks (XLA-side slicing; ``dtab`` is (128, 128) with row =
    table entry t and lane = l*F + f; dmlp slot layout as written by
    ``_bwd_kernel``)."""
    L, F, T = spec.n_levels, spec.features_per_level, spec.table_size
    enc, hid = spec.encoding_dim, spec.hidden_dim
    d_table = jnp.transpose(
        dtab[:T, :L * F].reshape(T, L, F), (1, 0, 2))
    return dict(
        hash_table=d_table,
        sigma_w1=dmlp[0, :hid, :enc],
        sigma_b1=dmlp[1, 0, :hid],
        sigma_w2=dmlp[1, 1, :hid],
        sigma_b2=dmlp[1, 2, 0],
        color_w1=dmlp[2, :hid, :enc],
        color_b1=dmlp[3, 0, :hid],
        color_w2=dmlp[3, 1:4, :hid],
        color_b2=dmlp[3, 4, :3],
    )


def _hash_plane(ix, iy, iz, t_size: int):
    """Wrapping uint32 3-prime XOR hash on (16, 128) int32 planes
    (hash_mlp_cpu.cpp:9-18; t_size is a power of two here)."""
    h = (ix.astype(jnp.uint32)
         ^ (iy.astype(jnp.uint32) * jnp.uint32(_PRIME_Y))
         ^ (iz.astype(jnp.uint32) * jnp.uint32(_PRIME_Z)))
    return (h & jnp.uint32(t_size - 1)).astype(jnp.int32)


def _relu_tie(x):
    """d max(x, 0)/dx with jax.grad's 0.5 tie at x == 0."""
    return jnp.where(x > 0.0, 1.0, jnp.where(x < 0.0, 0.0, 0.5))


def _encode_chunk(st, rayt, table_rows, *, spec, resolutions):
    """Per-chunk hash encoding: enc planes (list of L*F (16, 128)) plus
    per-level (corner weights, corner idx) lists for the backward.
    Corner order and lerp formulation match
    ops/hashmlp.py::eval_planes."""
    L, F, T = spec.n_levels, spec.features_per_level, spec.table_size
    px = rayt[0] + rayt[3] * st
    py = rayt[1] + rayt[4] * st
    pz = rayt[2] + rayt[5] * st
    enc = [None] * (L * F)
    geom = []
    for l in range(L):
        res = jnp.float32(resolutions[l])
        sx, sy, sz = px * res, py * res, pz * res
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        z0 = jnp.floor(sz)
        fx = sx - x0
        fy = sy - y0
        fz = sz - z0
        ix = x0.astype(jnp.int32)
        iy = y0.astype(jnp.int32)
        iz = z0.astype(jnp.int32)
        ws, idxs = [], []
        for dz in (0, 1):
            wz = fz if dz else 1.0 - fz
            for dy in (0, 1):
                wy = fy if dy else 1.0 - fy
                for dx in (0, 1):
                    wx = fx if dx else 1.0 - fx
                    idx = _hash_plane(ix + dx, iy + dy, iz + dz, T)
                    w = (wx * wy) * wz
                    ws.append(w)
                    idxs.append(idx)
                    for f in range(F):
                        v = jnp.take_along_axis(table_rows[l * F + f],
                                                idx, axis=1)
                        term = w * v
                        enc[l * F + f] = (term if enc[l * F + f] is None
                                          else enc[l * F + f] + term)
        geom.append((ws, idxs))
    return enc, geom


def _mlp_heads(enc, sc, *, spec, lay):
    """(sigma, r, g, b) planes + the pre-activation planes the adjoint
    needs. Math matches ops/hashmlp.py::eval_planes (ReLU hiddens, ReLU
    sigma, clamped color); ``sc`` is the SMEM scalar ref."""
    enc_d, hid = spec.encoding_dim, spec.hidden_dim

    def dense1(w_off, b_off):
        pre = []
        for j in range(hid):
            acc = None
            for i in range(enc_d):
                t = sc[w_off + j * enc_d + i] * enc[i]
                acc = t if acc is None else acc + t
            pre.append(acc + sc[b_off + j])
        return pre

    s_pre1 = dense1(lay["sw1"], lay["sb1"])
    s_h = [jnp.maximum(p, 0.0) for p in s_pre1]
    s_pre2 = None
    for j in range(hid):
        t = sc[lay["sw2"] + j] * s_h[j]
        s_pre2 = t if s_pre2 is None else s_pre2 + t
    s_pre2 = s_pre2 + sc[lay["sb2"]]
    sigma = jnp.maximum(s_pre2, 0.0)

    c_pre1 = dense1(lay["cw1"], lay["cb1"])
    c_h = [jnp.maximum(p, 0.0) for p in c_pre1]
    c_pre2 = []
    for ch in range(3):
        acc = None
        for j in range(hid):
            t = sc[lay["cw2"] + ch * hid + j] * c_h[j]
            acc = t if acc is None else acc + t
        c_pre2.append(acc + sc[lay["cb2"] + ch])
    rgb = [jnp.minimum(jnp.maximum(p, 0.0), 1.0) for p in c_pre2]
    return (sigma, rgb[0], rgb[1], rgb[2]), (s_pre1, s_pre2, c_pre1,
                                             c_pre2, s_h, c_h)


def _outer_sum(x_planes, y_planes):
    """sum over all chunk samples of x_a * y_b -> (len(x), len(y)):
    one lane-contraction per block row, both operands ZERO-PADDED to a
    full 8-sublane block.

    The padding is what makes this compile on real TPU: a dot with a
    1-row operand lowers in Mosaic to a vector.multi_reduction, and the
    cross-row accumulation (out = out + dot_r) then fuses into that
    reduction as a non-constant accumulator - rejected with "only
    constant accumulators supported" (CPU interpret mode never sees the
    lowering). 8-sublane operands lower to tpu.matmul and the
    accumulation stays a plain vector add; padded rows contribute exact
    zeros. (Lane-concatenating the 16 rows into one wide contraction
    also fails: tpu.concatenate on lanes rejects inputs at different
    sublane offsets.) HIGHEST precision - these matrices are tiny."""
    nx, ny = len(x_planes), len(y_planes)
    zero = None
    out = None
    for r in range(ROWS):
        xr = jnp.concatenate([p[r:r + 1, :] for p in x_planes], axis=0)
        yr = jnp.concatenate([p[r:r + 1, :] for p in y_planes], axis=0)
        if nx < 8 or ny < 8:
            if zero is None:
                zero = jnp.zeros((8, LANES), jnp.float32)
            if nx < 8:
                xr = jnp.concatenate([xr, zero[:8 - nx]], axis=0)
            if ny < 8:
                yr = jnp.concatenate([yr, zero[:8 - ny]], axis=0)
        d = jax.lax.dot_general(xr, yr, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_HI)
        out = d if out is None else out + d
    return out[:nx, :ny]


def _pad_lanes(x, lanes=LANES):
    return jnp.pad(x, ((0, 0), (0, lanes - x.shape[1])))


def _pad_block(x, rows=8, lanes=LANES):
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, lanes - x.shape[1])))


def _fwd_kernel(sc_ref, samp_ref, rayt_ref, tab_ref, out_ref, *,
                nc, g_tiles, dt, t_near, t_far, k_max, stop, reduce,
                spec, resolutions, lay):
    red = _reducer(reduce)
    consts = (dt, t_near, t_far, k_max)
    table_rows = [jnp.broadcast_to(tab_ref[r:r + 1, :], (ROWS, LANES))
                  for r in range(spec.n_levels
                                 * spec.features_per_level)]

    def tile(g, _):
        rayt = _expand_rayt(rayt_ref[g])
        zeros = jnp.zeros((ROWS, LANES), jnp.float32)
        init = (zeros,) * 6

        def chunk(c, carry):
            acc_r, acc_g, acc_b, acc_wd, acc_odp, carry_od = carry
            st = pltpu.bitcast(
                (samp_ref[g, c, 0].astype(jnp.uint32) << 16)
                | samp_ref[g, c, 1].astype(jnp.uint32), jnp.float32)
            enc, _ = _encode_chunk(st, rayt, table_rows, spec=spec,
                                   resolutions=resolutions)
            (sig, cr, cg, cb), _ = _mlp_heads(enc, sc_ref, spec=spec,
                                              lay=lay)
            livef, dta, tcur = _chunk_geometry(jnp.int32(0), c, consts)

            od = jnp.maximum(sig * dta, 0.0) * livef
            s_pre = carry_od + red.prefix_excl(od)
            tb = jnp.exp(-s_pre)
            p = jnp.exp(-(s_pre + od))
            procf = livef * (tb > jnp.float32(stop)).astype(jnp.float32)
            w = (tb - p) * procf
            mid = tcur + 0.5 * dta
            sums = red.group_sum_many(
                [w * cr, w * cg, w * cb, w * mid, od * procf, od])
            return (acc_r + sums[0], acc_g + sums[1], acc_b + sums[2],
                    acc_wd + sums[3], acc_odp + sums[4],
                    carry_od + sums[5])

        acc_r, acc_g, acc_b, acc_wd, acc_odp, _ = jax.lax.fori_loop(
            0, nc, chunk, init)
        ray16 = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1),
            RAYS_COLS - 1) * GROUP
        for i, acc in enumerate((acc_r, acc_g, acc_b, acc_wd, acc_odp)):
            cacc = jnp.take_along_axis(acc, ray16, axis=1)
            out_ref[g, i] = cacc[:, :RAYS_COLS]
        return 0

    jax.lax.fori_loop(0, g_tiles, tile, 0)


def _bwd_kernel(sc_ref, samp_ref, rayt_ref, tab_ref, gs_ref,
                dtab_ref, dmlp_ref, planes_s, state_s, *,
                nc, g_tiles, dt, t_near, t_far, k_max, stop, reduce,
                spec, resolutions, lay):
    red = _reducer(reduce)
    consts = (dt, t_near, t_far, k_max)
    L, F, T = spec.n_levels, spec.features_per_level, spec.table_size
    enc_d, hid = spec.encoding_dim, spec.hidden_dim
    table_rows = [jnp.broadcast_to(tab_ref[r:r + 1, :], (ROWS, LANES))
                  for r in range(L * F)]
    # the 8 corner one-hots of a block row, stacked: slot (c*T + t)
    slot8 = jax.lax.broadcasted_iota(jnp.int32, (8 * T, LANES), 0) % T
    ones_plane = jnp.ones((ROWS, LANES), jnp.float32)

    def tile(g, _):
        rayt = _expand_rayt(rayt_ref[g])

        @pl.when(g == 0)
        def _init():
            # dtab layout: row = table entry t, lane = l*F + f (the
            # XLA epilogue transposes; in-kernel transposes are what
            # this layout avoids)
            dtab_ref[0] = jnp.zeros((LANES, LANES), jnp.float32)
            dmlp_ref[0] = jnp.zeros((4, 8, LANES), jnp.float32)

        lane_ray = jax.lax.broadcasted_iota(
            jnp.int32, (ROWS, LANES), 1) // GROUP

        def expand(gs16):
            padded = jnp.concatenate(
                [gs16, jnp.zeros((ROWS, LANES - RAYS_COLS),
                                 jnp.float32)], axis=1)
            return jnp.take_along_axis(padded, lane_ray, axis=1)

        g_r, g_g, g_b, g_wd, g_odp = (
            expand(gs_ref[g, i]) for i in range(5))

        def st_of(c):
            return pltpu.bitcast(
                (samp_ref[g, c, 0].astype(jnp.uint32) << 16)
                | samp_ref[g, c, 1].astype(jnp.uint32), jnp.float32)

        def fwd_chunk(c, carry_od):
            enc, _ = _encode_chunk(st_of(c), rayt, table_rows,
                                   spec=spec, resolutions=resolutions)
            (sig, cr, cg, cb), _ = _mlp_heads(enc, sc_ref, spec=spec,
                                              lay=lay)
            planes_s[c, 0] = sig
            planes_s[c, 1] = cr
            planes_s[c, 2] = cg
            planes_s[c, 3] = cb
            livef, dta, _ = _chunk_geometry(jnp.int32(0), c, consts)
            od = jnp.maximum(sig * dta, 0.0) * livef
            state_s[c, 0] = carry_od + red.prefix_excl(od)
            return carry_od + red.group_sum(od)

        jax.lax.fori_loop(0, nc, fwd_chunk,
                          jnp.zeros((ROWS, LANES), jnp.float32))

        zero_tab = jnp.zeros((LANES, LANES), jnp.float32)
        zero_slot = jnp.zeros((8, LANES), jnp.float32)

        def bwd_chunk(i, carry):
            carry_suf, dtab_a, s0, s1, s2, s3 = carry
            c = nc - 1 - i
            sig = planes_s[c, 0]
            cr = planes_s[c, 1]
            cg = planes_s[c, 2]
            cb = planes_s[c, 3]
            s_pre = state_s[c, 0]
            livef, dta, tcur = _chunk_geometry(jnp.int32(0), c, consts)

            x = sig * dta
            od = jnp.maximum(x, 0.0) * livef
            tb = jnp.exp(-s_pre)
            p = jnp.exp(-(s_pre + od))
            procf = livef * (tb > jnp.float32(stop)).astype(jnp.float32)
            w = (tb - p) * procf
            mid = tcur + 0.5 * dta

            gw = g_r * cr + g_g * cg + g_b * cb + g_wd * mid
            gww = gw * w
            suffix = red.suffix_excl(gww) + carry_suf
            dod = gw * procf * p - suffix + g_odp * procf
            dsig = dod * livef * _relu_tie(x) * dta
            dcr, dcg, dcb = g_r * w, g_g * w, g_b * w

            st = st_of(c)
            enc, geom = _encode_chunk(st, rayt, table_rows, spec=spec,
                                      resolutions=resolutions)
            _, (s_pre1, s_pre2, c_pre1, c_pre2, s_h, c_h) = _mlp_heads(
                enc, sc_ref, spec=spec, lay=lay)

            # head adjoints (jax tie conventions)
            dsig_pre2 = dsig * _relu_tie(s_pre2)
            d_rgb = (dcr, dcg, dcb)
            dc_pre2 = []
            for ch in range(3):
                x2 = c_pre2[ch]
                y2 = jnp.maximum(x2, 0.0)
                t_hi = jnp.where(y2 < 1.0, 1.0,
                                 jnp.where(y2 > 1.0, 0.0, 0.5))
                dc_pre2.append(d_rgb[ch] * t_hi * _relu_tie(x2))

            ds_pre1 = [dsig_pre2 * sc_ref[lay["sw2"] + j]
                       * _relu_tie(s_pre1[j]) for j in range(hid)]
            dc_h = []
            for j in range(hid):
                acc = None
                for ch in range(3):
                    t = dc_pre2[ch] * sc_ref[lay["cw2"] + ch * hid + j]
                    acc = t if acc is None else acc + t
                dc_h.append(acc)
            dc_pre1 = [dc_h[j] * _relu_tie(c_pre1[j])
                       for j in range(hid)]

            denc = []
            for i2 in range(enc_d):
                acc = None
                for j in range(hid):
                    t = (ds_pre1[j]
                         * sc_ref[lay["sw1"] + j * enc_d + i2]
                         + dc_pre1[j]
                         * sc_ref[lay["cw1"] + j * enc_d + i2])
                    acc = t if acc is None else acc + t
                denc.append(acc)

            # MLP weight gradients (per-row MXU dots; see _outer_sum)
            ones = [ones_plane]
            s0 = s0 + _pad_block(_outer_sum(ds_pre1, enc))
            s2 = s2 + _pad_block(_outer_sum(dc_pre1, enc))
            s1 = s1 + jnp.concatenate([
                _pad_lanes(_outer_sum(ones, ds_pre1)),      # b1 row
                _pad_lanes(_outer_sum([dsig_pre2], s_h)),   # w2 row
                _pad_lanes(_outer_sum([dsig_pre2], ones)),  # b2 row
                jnp.zeros((5, LANES), jnp.float32)], axis=0)
            s3 = s3 + jnp.concatenate([
                _pad_lanes(_outer_sum(ones, dc_pre1)),      # cb1 row
                _pad_lanes(_outer_sum(dc_pre2, c_h)),       # cw2 rows
                _pad_lanes(_outer_sum(ones, dc_pre2)),      # cb2 row
                jnp.zeros((3, LANES), jnp.float32)], axis=0)

            # hash-table gradient: per-(row, level) weighted one-hot
            # contraction over the stacked corner one-hots; the
            # accumulator keeps the (t sublane, l*F + f lane) layout
            # (no in-kernel transposes; the XLA epilogue reorders)
            for l in range(L):
                ws, idxs = geom[l]
                part_sum = None
                for r in range(ROWS):
                    idx_big = jnp.concatenate(
                        [jnp.broadcast_to(idxs[cc][r:r + 1, :],
                                          (T, LANES))
                         for cc in range(8)], axis=0)      # (8T, 128)
                    w_big = jnp.concatenate(
                        [jnp.broadcast_to(ws[cc][r:r + 1, :],
                                          (T, LANES))
                         for cc in range(8)], axis=0)
                    ohw = (slot8 == idx_big).astype(jnp.float32) * w_big
                    dvals = jnp.concatenate(
                        [denc[l * F + f][r:r + 1, :]
                         for f in range(F)], axis=0)       # (F, 128)
                    part = jax.lax.dot_general(
                        ohw, dvals, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_HI)                     # (8T, F)
                    part_sum = part if part_sum is None \
                        else part_sum + part
                folded = part_sum.reshape(8, T, F).sum(axis=0)  # (T, F)
                dtab_a = dtab_a + jnp.pad(
                    folded, ((0, LANES - T),
                             (l * F, LANES - (l + 1) * F)))

            return (carry_suf + red.group_sum(gww), dtab_a,
                    s0, s1, s2, s3)

        out = jax.lax.fori_loop(
            0, nc, bwd_chunk,
            (jnp.zeros((ROWS, LANES), jnp.float32), zero_tab,
             zero_slot, zero_slot, zero_slot, zero_slot))
        _, dtab_a, s0, s1, s2, s3 = out
        dtab_ref[0] = dtab_ref[0] + dtab_a
        dmlp_ref[0, 0] = dmlp_ref[0, 0] + s0
        dmlp_ref[0, 1] = dmlp_ref[0, 1] + s1
        dmlp_ref[0, 2] = dmlp_ref[0, 2] + s2
        dmlp_ref[0, 3] = dmlp_ref[0, 3] + s3
        return 0

    jax.lax.fori_loop(0, g_tiles, tile, 0)


def _pick_g_tiles_hash(t_cnt, nc, vmem_budget=6 << 20):
    per_tile = nc * 2 * ROWS * LANES * 2 + 16 * LANES * 4
    scratch = nc * 5 * ROWS * LANES * 4
    g = 8
    while g > 1 and (2 * g * per_tile + scratch > vmem_budget
                     or t_cnt % g):
        g //= 2
    return g


@functools.lru_cache(maxsize=32)
def _hash_tile_op(nc, g_tiles, dt, t_near, t_far, k_max, stop,
                  interpret, reduce, spec, resolutions):
    lay = _mlp_layout(spec)
    kw = dict(nc=nc, g_tiles=g_tiles, dt=dt, t_near=t_near,
              t_far=t_far, k_max=k_max, stop=stop, reduce=reduce,
              spec=spec, resolutions=resolutions, lay=lay)
    LF = spec.n_levels * spec.features_per_level
    tab_rows = -(-LF // 8) * 8

    def fwd_call(samp, rayt, tab, sc):
        t_cnt = samp.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,          # sc (P,) f32 in SMEM
            grid=(t_cnt // g_tiles,),
            in_specs=[
                pl.BlockSpec((g_tiles, nc, 2, ROWS, LANES),
                             lambda i, sc_: (i, 0, 0, 0, 0)),
                pl.BlockSpec((g_tiles, RAYT_ROWS, LANES),
                             lambda i, sc_: (i, 0, 0)),
                pl.BlockSpec((tab_rows, LANES),
                             lambda i, sc_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((g_tiles, 5, ROWS, RAYS_COLS),
                                   lambda i, sc_: (i, 0, 0, 0)),
        )
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (t_cnt, 5, ROWS, RAYS_COLS), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(sc, samp, rayt, tab)

    def bwd_call(samp, rayt, tab, sc, gs):
        t_cnt = samp.shape[0]
        n_steps = t_cnt // g_tiles
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((g_tiles, nc, 2, ROWS, LANES),
                             lambda i, sc_: (i, 0, 0, 0, 0)),
                pl.BlockSpec((g_tiles, RAYT_ROWS, LANES),
                             lambda i, sc_: (i, 0, 0)),
                pl.BlockSpec((tab_rows, LANES),
                             lambda i, sc_: (0, 0)),
                pl.BlockSpec((g_tiles, 5, ROWS, RAYS_COLS),
                             lambda i, sc_: (i, 0, 0, 0)),
            ],
            # per-grid-step partial gradients; XLA sums the step axis
            out_specs=[
                pl.BlockSpec((1, LANES, LANES),
                             lambda i, sc_: (i, 0, 0)),
                pl.BlockSpec((1, 4, 8, LANES),
                             lambda i, sc_: (i, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((nc, 4, ROWS, LANES), jnp.float32),
                pltpu.VMEM((nc, 1, ROWS, LANES), jnp.float32),
            ],
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_steps, LANES, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((n_steps, 4, 8, LANES),
                                     jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(sc, samp, rayt, tab, gs)

    class _Op:
        pass

    op = _Op()
    op.fwd_call = fwd_call
    op.bwd_call = bwd_call
    return op


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _hash_group(op_key, spec, samp, rayt, params):
    """params-dict entry point: packs (table block, scalar vector) and
    runs the fused forward; the VJP runs the fused backward and
    reassembles the params-dict cotangent (grads_from_blocks)."""
    op = _hash_tile_op(*op_key)
    return op.fwd_call(samp, rayt, table_block(params, spec),
                       pack_mlp_scalars(params, spec))


def _hash_group_fwd(op_key, spec, samp, rayt, params):
    return (_hash_group(op_key, spec, samp, rayt, params),
            (samp, rayt, params))


def _hash_group_bwd(op_key, spec, res, g):
    samp, rayt, params = res
    op = _hash_tile_op(*op_key)
    dtab_steps, dmlp_steps = op.bwd_call(
        samp, rayt, table_block(params, spec),
        pack_mlp_scalars(params, spec), g)
    d_params = grads_from_blocks(dtab_steps.sum(axis=0),
                                 dmlp_steps.sum(axis=0), spec)
    return (np.zeros(samp.shape, jax.dtypes.float0),
            jnp.zeros_like(rayt), d_params)


_hash_group.defvjp(_hash_group_fwd, _hash_group_bwd)


def render_hash_tile_group_raw(plan, spec: HashMLPSpec, samp, rayt,
                               params: dict, n_chunks,
                               interpret: bool | None = None,
                               reduce: str | None = None):
    """Fused hash-MLP forward for one tile group: (T, 5, 16, 16) raw
    accumulator heads (radiance r/g/b, weighted mid-depth, processed
    optical depth), laid out as image tiles. Differentiable w.r.t.
    ``params`` (hash table + both MLP heads)."""
    from dvren_tpu.ops.fused_tiles import DEFAULT_REDUCE

    check(fast_path_ok(spec),
          "hash fast path needs a power-of-two table_size <= 128, "
          "hidden_dim <= 8 and encoding_dim <= 64")
    if interpret is None:
        interpret = _interpret_default()
    if reduce is None:
        reduce = DEFAULT_REDUCE
    t_cnt = int(samp.shape[0])
    g_tiles = _pick_g_tiles_hash(t_cnt, int(n_chunks))
    op_key = (int(n_chunks), g_tiles, float(plan.sampling.dt),
              float(plan.t_near), float(plan.t_far),
              int(plan.sampling.max_steps), float(STOP_THRESHOLD),
              bool(interpret), str(reduce), spec,
              level_resolutions(spec))
    return _hash_group(op_key, spec, samp, rayt, params)
