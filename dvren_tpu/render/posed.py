"""Device-side schedule build: moving-camera rendering in ONE dispatch.

The tiled schedule is capture-specialized: the host resolves the sample
lattice, packs each (tile, chunk)'s unique cells into bank lanes, and
uploads ~130 arrays (render/tiled.py::build_tiled_schedule). That build
is 6-9 s of single-core host work per camera - fine for training views
(built once), fatal for pose sweeps (ANIM_r04: 10.8 s/frame; the
camera-stable :class:`~dvren_tpu.render.animate.MovingCameraRenderer`
removed the recompiles but kept the host build).

This module moves the WHOLE schedule build onto the TPU. Under the
camera-stable contract (every image tile in one uniform (nc, nb) group)
each schedule leaf's shape is a pure function of the plan geometry, so
build + render compile to ONE jitted program of (camera, field): per
frame there is no host work, no upload beyond two 3x4 camera arrays, and
exactly one dispatch.

The host packer's sort/unique lane assignment does not map to TPU (sorts
pay ~100 passes over 134 MB; scatters run ~10x slower than gathers
here). Instead lanes come from a closed-form SLICED-BOX assignment: per
(tile, chunk) run, slice the touched cell set by z; each slice gets its
tight 2D x/y bounding box; a sample's lane is

    lane = prefix[zrel] + (iy - y0[zrel]) * ex[zrel] + (ix - x0[zrel])

with prefix the running sum of slice areas. Everything is elementwise
math plus EZ masked min/max reductions - no sort, no scatter. Slicing by
z keeps oblique bundles tight where a single 3D box explodes (measured
at 512^2/64^3 over an orbit: sliced-box max run 234 <= 256 and ~1.1-1.7x
the exact-unique lane count; the axis-aligned 3D box hits 360 cells and
~10x lanes on diagonal poses). Untouched box lanes cost bank-gather
bytes but are never selected by a sample, so they point at row 0.

Exactness: the lane layout never enters the math (each sample reads its
own cell's table row; integration order is fixed by the k layout), so
the only differences vs the host-built schedule are (a) the tile window
start - derived here from the exact in-bbox mask instead of the host's
f64 slab test, conservative by one step (windowed.py::_windows), which
shifts chunk boundaries and with them the mxu3 reduction grouping by
<= 1 ulp - and (b) any elementwise f32 rounding differences between
numpy and this backend's fused lattice math. tests/test_posed.py gates
the CPU backend bit-exactly against the host tiled render and the
windowed reference within 1e-6.

Reference role model: per-frame CUDA-Graph re-capture is the reference's
normal mode under scene changes
(``tests/render/test_smoke_animation.cpp:211``); its capture runs on the
GPU timeline. This is the TPU equivalent: the capture IS part of the
compiled program.

Restrictions (checked): dense f32 OOB_ZERO LINEAR field, full-image ROI
with width/height % 16 == 0, tile_px=16, pitch=1, cell_scale=1,
forward-only (no backward gather plan - training under camera motion
rebuilds host-side, as before).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dvren_tpu.core.plan import (CameraModel, InterpMode, OobPolicy, Plan,
                                 SamplingMode)
from dvren_tpu.core.status import check
from dvren_tpu.ops.raygen import generate_rays
from dvren_tpu.render.pipeline import plan_jitter_table
from dvren_tpu.render.tiled import (CHUNK, MAX_CELLS, TileGroup,
                                    TiledSchedule, _tile_rays, render_tiled)

_BIG = np.int32(1 << 30)


def _plan_geometry(plan: Plan) -> tuple:
    roi = plan.roi
    return (plan.width, plan.height, float(plan.t_near),
            float(plan.t_far), float(plan.sampling.dt),
            int(plan.sampling.max_steps), int(plan.sampling.mode),
            int(plan.seed), (roi.x, roi.y, roi.width, roi.height),
            int(plan.camera.model))


def _tiles_transpose(a, ty_n, tx_n):
    """(..., H*W) row-major rays -> (..., T, 256) tile-major (16x16
    blocks, row-major within a block). Pure reshape/transpose."""
    lead = a.shape[:-1]
    a = a.reshape(lead + (ty_n, 16, tx_n, 16))
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (0, 2, 1, 3))
    return a.transpose(perm).reshape(lead + (ty_n * tx_n, 256))


def _rays_to_lanes(a):
    """(T, 256) per-ray -> (T, 16, 128) sample layout (ray = row*16 +
    lane//8; every ray value replicated over its 8 step lanes)."""
    t = a.shape[0]
    return jnp.broadcast_to(a.reshape(t, 16, 16, 1),
                            (t, 16, 16, CHUNK)).reshape(t, 16, 128)


class PosedRenderer:
    """One compiled program renders ANY camera pose: the tile schedule is
    built on-device inside the render jit (module docstring).

    >>> r = PosedRenderer(plan0, field)
    >>> planes = r.render(plan_for(pose), field)   # one dispatch

    ``nc_pin`` / ``nb_pin`` / ``ez_pin`` pin the uniform chunk count,
    bank count and max z-slices per run; they default to an init-time
    device probe at the base pose plus ``headroom``. A pose that exceeds
    a pin raises (with the measured requirement) on the next
    :meth:`check_ok` / :meth:`render` fetch - re-create with larger pins.
    """

    def __init__(self, base_plan: Plan, field, nc_pin=None, nb_pin=None,
                 ez_pin=None, headroom=(1, 2, 2), use_kernel: bool = True,
                 fused: bool | None = None, probe_plans=None):
        check(getattr(field, "oob", OobPolicy.ZERO) == OobPolicy.ZERO,
              "posed rendering requires an OOB_ZERO field")
        check(getattr(field, "interp", InterpMode.LINEAR)
              == InterpMode.LINEAR,
              "posed rendering requires LINEAR interpolation")
        check(not hasattr(field, "bricks")
              and getattr(field, "packed_dtype", "float32") == "float32",
              "posed rendering supports dense float32 grids")
        roi = base_plan.roi
        check(roi.x == 0 and roi.y == 0 and roi.width == base_plan.width
              and roi.height == base_plan.height
              and roi.width % 16 == 0 and roi.height % 16 == 0,
              "posed rendering requires a full-image ROI with "
              "width/height multiples of 16")
        self._geom = _plan_geometry(base_plan)
        self._plan = base_plan
        self._use_kernel = use_kernel
        self._grid = tuple(int(v)
                           for v in np.asarray(field.sigma.shape[:3]))
        self._bbox = (tuple(float(v) for v in field.bbox_min),
                      tuple(float(v) for v in field.bbox_max))
        nz, ny, nx = self._grid
        check(min(nx, ny, nz) >= 2, "grids must have dims >= 2")

        self._ty_n = roi.height // 16
        self._tx_n = roi.width // 16
        self._t_cnt = self._ty_n * self._tx_n
        check(self._t_cnt % 8 == 0,
              "posed rendering needs a tile count divisible by 8 "
              "(kernel DMA blocks); use images >= 128 px on one side")
        k_max = base_plan.sampling.max_steps
        check(k_max % CHUNK == 0,
              "posed rendering requires max_steps % 8 == 0")

        # --- camera-independent constants -----------------------------
        tiles, sub_ids = _tile_rays(base_plan, 16)
        ref = _tiles_transpose(np.arange(roi.width * roi.height,
                                         dtype=np.int64)[None],
                               self._ty_n, self._tx_n)[0]
        assert (tiles == ref).all(), "tile layout mismatch"
        self._tile_ids = jnp.asarray(sub_ids.astype(np.int32))
        self._pixel_ids = jnp.asarray(tiles.reshape(-1).astype(np.int32))
        self._ray_ids = jnp.asarray(tiles.astype(np.int32))

        jt = plan_jitter_table(base_plan)
        if jt is None:
            self._jt_k = None
        else:
            # tile-major, k-major jitter: (T, K, 256) f32; the table is
            # camera-independent so this is built ONCE
            jt = np.asarray(jt, np.float32)[:, :k_max]
            jtt = _tiles_transpose(np.ascontiguousarray(jt.T),
                                   self._ty_n, self._tx_n)  # (K, T, 256)
            self._jt_k = jnp.asarray(np.ascontiguousarray(
                jtt.transpose(1, 0, 2)))                     # (T, K, 256)

        # Device-resident constants are passed as jit ARGUMENTS, never
        # closed over: closure arrays embed as HLO literals (the jitter
        # table alone is 134 MB at 512^2) - slow remote compiles and no
        # persistent-cache hits (CLAUDE.md).
        self._consts = (self._jt_k, self._ray_ids, self._pixel_ids,
                        self._tile_ids)
        if nc_pin is None or nb_pin is None or ez_pin is None:
            # ``probe_plans``: representative poses of the intended
            # sweep - the pins take the elementwise max over them (the
            # probe executable is shared, so extra poses cost one
            # dispatch each, not a recompile)
            probe_fn = jax.jit(self._probe_stats)
            stats = np.stack([
                np.asarray(probe_fn(*self._cam_arrays(p), self._consts))
                for p in [base_plan] + list(probe_plans or [])]).max(0)
            span_c, run_max, ez_max, nb_need = (int(v) for v in stats)
            check(run_max <= 2 * MAX_CELLS,
                  f"sliced-box run exceeds 2 banks at the base pose "
                  f"({run_max} cells): scene too coarse for the posed "
                  f"path (use finer tiles via the host builder)")
            nc_pin = min(span_c + int(headroom[0]), k_max // CHUNK) \
                if nc_pin is None else nc_pin
            nb_pin = nb_need + int(headroom[1]) if nb_pin is None \
                else nb_pin
            ez_pin = ez_max + int(headroom[2]) if ez_pin is None \
                else ez_pin
        self.nc_pin = int(nc_pin)
        self.nb_pin = int(nb_pin)
        self.ez_pin = int(ez_pin)
        check(self.nb_pin <= 255, "bank space exceeds the 15-bit lane id")
        if fused is None:
            # CPU's kLoop fusion recomputes gather-operand producer
            # chains per accessed element (see _build_and_render) and
            # jax.lax.optimization_barrier does not survive to its
            # fusion pass - split the dispatch there. TPU gathers read
            # materialized operands, so the single-dispatch form is
            # safe (and saves one ~36 ms tunnel roundtrip per frame).
            fused = jax.default_backend() == "tpu"
        self._fused = bool(fused)
        self._render_fn = jax.jit(self._build_and_render)
        self._sched_fn = jax.jit(self._build_schedule)
        self._consume_fn = jax.jit(
            lambda sigma, color, s: render_tiled(
                self._plan, self._field_tpl.with_params(sigma, color), s,
                use_kernel=self._use_kernel))
        self._last_diag = None

    # ------------------------------------------------------------------
    def _cam_arrays(self, plan: Plan):
        """(K (3,3), c2w-with-scale (4,4)): ortho_scale rides row 3 so
        every camera parameter incl. orthographic scale crosses the jit
        boundary in one array."""
        k = jnp.asarray(plan.camera.k, jnp.float32).reshape(3, 3)
        c2w = jnp.asarray(plan.camera.c2w, jnp.float32).reshape(3, 4)
        s = jnp.full((1, 4), jnp.float32(plan.camera.ortho_scale))
        return k, jnp.concatenate([c2w, s], axis=0)

    def _tile_rays_planes(self, k, c2w):
        """Device raygen -> per-axis (T, 256) origin/direction planes."""
        rays = generate_rays(self._plan, k=k, c2w=c2w[:3],
                             ortho_scale=c2w[3, 0])
        o = [_tiles_transpose(rays.origins[:, i][None], self._ty_n,
                              self._tx_n)[0] for i in range(3)]
        d = [_tiles_transpose(rays.directions[:, i][None], self._ty_n,
                              self._tx_n)[0] for i in range(3)]
        return o, d

    def _lattice_consts(self):
        p = self._plan
        nz, ny, nx = self._grid
        lo, hi = self._bbox
        inv = [np.float32(1.0 / (hi[i] - lo[i])) if hi[i] != lo[i]
               else np.float32(0.0) for i in range(3)]
        nudge = np.nextafter(np.float32(p.t_far), np.float32(p.t_near),
                             dtype=np.float32)
        return (np.float32(p.t_near), np.float32(p.t_far),
                np.float32(p.sampling.dt), nudge, lo, inv,
                (nx, ny, nz))

    def _mask_full(self, o, d, jt_k):
        """Pass A: the exact in-bbox sample mask over the FULL lattice,
        (T, K, 256) layout -> per-tile window (tke, span)."""
        p = self._plan
        K = p.sampling.max_steps
        t_near, t_far, dt, nudge, lo, inv, (nx, ny, nz) = \
            self._lattice_consts()
        kf = jnp.arange(K, dtype=jnp.float32)[None, :, None]
        base_t = t_near + kf * dt
        jt = jnp.float32(0.5) if jt_k is None else jt_k
        st = base_t + jt * dt
        st = jnp.where(st >= t_far, nudge, st)
        m = jnp.broadcast_to(base_t < t_far, st.shape)
        for ax, npts in ((0, nx), (1, ny), (2, nz)):
            pos = o[ax][:, None, :] + d[ax][:, None, :] * st
            local = (pos - jnp.float32(lo[ax])) * inv[ax]
            m = m & (local >= 0.0) & (local <= 1.0)
        kidx = jnp.arange(K, dtype=jnp.int32)[None, :, None]
        tke = jnp.min(jnp.where(m, kidx, _BIG), axis=(1, 2))
        klast = jnp.max(jnp.where(m, kidx, -1), axis=(1, 2))
        tke = jnp.where(klast >= 0, tke, 0).astype(jnp.int32)
        span = jnp.maximum(klast + 1 - tke, 0).astype(jnp.int32)
        return tke, span

    def _window_lattice(self, o, d, tke, nc, jt_k):
        """Pass B: st / cell indices / mask in the kernel's
        (T, nc, 16, 128) window layout (chunk boundaries at tke)."""
        p = self._plan
        K = p.sampling.max_steps
        T = self._t_cnt
        t_near, t_far, dt, nudge, lo, inv, (nx, ny, nz) = \
            self._lattice_consts()
        nc8 = nc * CHUNK
        if jt_k is None:
            jw = jnp.full((T, nc, 16, 128), 0.5, jnp.float32)
        else:
            pad = jnp.zeros((T, nc8, 256), jnp.float32)
            jtp = jnp.concatenate([jt_k, pad], axis=1)
            jw = jax.vmap(
                lambda a, s: jax.lax.dynamic_slice_in_dim(a, s, nc8, 0)
            )(jtp, tke)                                  # (T, nc8, 256)
            jw = jw.reshape(T, nc, CHUNK, 16, 16).transpose(
                0, 1, 3, 4, 2).reshape(T, nc, 16, 128)
        j_in = jnp.arange(128, dtype=jnp.int32)[None, None, None, :] % CHUNK
        c_of = (jnp.arange(nc, dtype=jnp.int32)
                * CHUNK)[None, :, None, None]
        kw = tke[:, None, None, None] + c_of + j_in      # (T,nc,16,128)
        base_t = t_near + kw.astype(jnp.float32) * dt
        st = base_t + jw * dt
        st = jnp.where(st >= t_far, nudge, st)
        live = (base_t < t_far) & (kw < K)
        m = live
        idx = []
        for ax, npts in ((0, nx), (1, ny), (2, nz)):
            o_s = _rays_to_lanes(o[ax])[:, None]
            d_s = _rays_to_lanes(d[ax])[:, None]
            pos = o_s + d_s * st
            local = (pos - jnp.float32(lo[ax])) * inv[ax]
            m = m & (local >= 0.0) & (local <= 1.0)
            f = local * jnp.float32(npts - 1)
            idx.append(jnp.clip(jnp.floor(f), 0,
                                npts - 2).astype(jnp.int32))
        return st, idx[0], idx[1], idx[2], m

    def _probe_stats(self, k, c2w, consts):
        """Init-time device probe at full-lattice chunking: (window span
        chunks, max run lanes, max z-slices, banks needed)."""
        jt_k = consts[0]
        o, d = self._tile_rays_planes(k, c2w)
        tke, span = self._mask_full(o, d, jt_k)
        K = self._plan.sampling.max_steps
        zero = jnp.zeros_like(tke)
        st, ix, iy, iz, m = self._window_lattice(o, d, zero, K // CHUNK,
                                                 jt_k)
        stats = self._run_stats(ix, iy, iz, m, ez=32)
        _, _, _, _, run_lanes, ez_max = stats
        cur, _off = self._pack_offsets(run_lanes)
        span_c = jnp.max(-(-span // CHUNK))
        return jnp.stack([
            span_c.astype(jnp.int32),
            jnp.max(run_lanes).astype(jnp.int32),
            ez_max.astype(jnp.int32),
            jnp.max(-(-cur // MAX_CELLS)).astype(jnp.int32)])

    def _run_stats(self, ix, iy, iz, m, ez):
        """Per-(tile, chunk) sliced-box stats: z0 (T,nc), per-slice
        x0/y0/ex (T,nc,ez), exclusive lane prefix (T,nc,ez), total run
        lanes (T,nc), max z-extent scalar."""
        z0 = jnp.min(jnp.where(m, iz, _BIG), axis=(2, 3))
        z0 = jnp.where(z0 == _BIG, 0, z0)                # (T, nc)
        zrel = jnp.where(m, iz - z0[:, :, None, None], 0)
        ez_max = jnp.max(jnp.where(m, zrel, -1)) + 1
        x0s, y0s, exs, areas = [], [], [], []
        for s in range(ez):
            sel = m & (zrel == s)
            x0 = jnp.min(jnp.where(sel, ix, _BIG), axis=(2, 3))
            x1 = jnp.max(jnp.where(sel, ix, -1), axis=(2, 3))
            y0 = jnp.min(jnp.where(sel, iy, _BIG), axis=(2, 3))
            y1 = jnp.max(jnp.where(sel, iy, -1), axis=(2, 3))
            ex = jnp.maximum(x1 - x0 + 1, 0)
            ey = jnp.maximum(y1 - y0 + 1, 0)
            x0s.append(jnp.where(ex > 0, x0, 0))
            y0s.append(jnp.where(ey > 0, y0, 0))
            exs.append(ex)
            areas.append(ex * ey)
        x0s = jnp.stack(x0s, -1)                         # (T, nc, ez)
        y0s = jnp.stack(y0s, -1)
        exs = jnp.stack(exs, -1)
        areas = jnp.stack(areas, -1)
        prefix = jnp.cumsum(areas, axis=-1) - areas      # exclusive
        run_lanes = jnp.sum(areas, axis=-1)              # (T, nc)
        return z0, (x0s, y0s, exs, areas, prefix), zrel, m, run_lanes, \
            ez_max

    @staticmethod
    def _pack_offsets(run_lanes):
        """The host packer's lane-offset recurrence (tiled.py:858-876):
        runs > 128 align to a bank boundary; empty runs anchor at 0."""
        T, nc = run_lanes.shape
        cur = jnp.zeros((T,), jnp.int32)
        offs = []
        for c in range(nc):
            n = run_lanes[:, c]
            cur = jnp.where(n > MAX_CELLS,
                            -(-cur // MAX_CELLS) * MAX_CELLS, cur)
            offs.append(jnp.where(n > 0, cur, 0))
            cur = cur + n
        return cur, jnp.stack(offs, -1)                  # (T,), (T, nc)

    # ------------------------------------------------------------------
    def _build_schedule(self, k, c2w, consts):
        """The full device schedule build: (T-group TiledSchedule pytree,
        diagnostics (4,) i32 [span_chunks, max_run, ez_max, nb_needed])."""
        nc, nb, ez = self.nc_pin, self.nb_pin, self.ez_pin
        T = self._t_cnt
        nz, ny, nx = self._grid

        jt_k, ray_ids, pixel_ids, tile_ids = consts
        o, d = self._tile_rays_planes(k, c2w)
        tke, span = self._mask_full(o, d, jt_k)
        st, ix, iy, iz, m = self._window_lattice(o, d, tke, nc, jt_k)
        z0, (x0s, y0s, exs, areas, prefix), zrel, m, run_lanes, ez_max \
            = self._run_stats(ix, iy, iz, m, ez)
        cur, off = self._pack_offsets(run_lanes)

        diag = jnp.stack([
            jnp.max(-(-span // CHUNK)).astype(jnp.int32),
            jnp.max(run_lanes).astype(jnp.int32),
            ez_max.astype(jnp.int32),
            jnp.max(-(-cur // MAX_CELLS)).astype(jnp.int32)])

        # per-sample lane rank inside its run (sliced-box closed form)
        rank = jnp.zeros_like(ix)
        for s in range(ez):
            sel = m & (zrel == s)
            r_s = (prefix[:, :, None, None, s]
                   + (iy - y0s[:, :, None, None, s])
                   * exs[:, :, None, None, s]
                   + (ix - x0s[:, :, None, None, s]))
            rank = jnp.where(sel, r_s, rank)
        lidx = jnp.where(m, off[:, :, None, None] + rank,
                         off[:, :, None, None]).astype(jnp.int32)

        # slim samp pack: [st hi16, st lo16, lane | mask << 15]
        st_bits = jax.lax.bitcast_convert_type(st, jnp.uint32)
        packed = (lidx | (m.astype(jnp.int32) << 15)).astype(jnp.uint32)
        samp = jnp.stack([
            (st_bits >> 16).astype(jnp.uint16),
            (st_bits & jnp.uint32(0xFFFF)).astype(jnp.uint16),
            packed.astype(jnp.uint16)], axis=2)      # (T, nc, 3, 16, 128)

        # hostmap: lane -> cell decode from the run/slice stats
        lanes = nb * MAX_CELLS
        lane_i = jnp.arange(lanes, dtype=jnp.int32)[None, :]  # (1, lanes)
        cell_ix = jnp.zeros((T, lanes), jnp.int32)
        cell_iy = jnp.zeros((T, lanes), jnp.int32)
        cell_iz = jnp.zeros((T, lanes), jnp.int32)
        for c in range(nc):
            off_c = off[:, c][:, None]
            n_c = run_lanes[:, c][:, None]
            in_run = (n_c > 0) & (lane_i >= off_c) & (lane_i < off_c + n_c)
            r_in = lane_i - off_c
            for s in range(ez):
                a_s = areas[:, c, s][:, None]
                p_s = prefix[:, c, s][:, None]
                sel = in_run & (a_s > 0) & (r_in >= p_s) \
                    & (r_in < p_s + a_s)
                q = r_in - p_s
                e_s = jnp.maximum(exs[:, c, s][:, None], 1)
                gx = x0s[:, c, s][:, None] + q % e_s
                gy = y0s[:, c, s][:, None] + q // e_s
                gz = (z0[:, c] + s)[:, None]
                cell_ix = jnp.where(sel, gx, cell_ix)
                cell_iy = jnp.where(sel, gy, cell_iy)
                cell_iz = jnp.where(sel, gz, cell_iz)
        hostmap = ((cell_iz * ny + cell_iy) * nx
                   + cell_ix).astype(jnp.int32)          # (T, lanes)
        base = jnp.stack([cell_ix, cell_iy, cell_iz],
                         axis=1).astype(jnp.float32)     # (T, 3, lanes)
        base = base.reshape(T, 3, nb, MAX_CELLS).transpose(0, 2, 1, 3)

        rayt = jnp.stack(
            [o[i].reshape(T, 2, 128) for i in range(3)]
            + [d[i].reshape(T, 2, 128) for i in range(3)],
            axis=1).reshape(T, 12, 128)

        hm_flat = hostmap.reshape(-1)
        group = TileGroup(
            n_chunks=nc, n_tiles=T, banks=nb,
            hostmap=hm_flat, gathermap=hm_flat,
            samp=samp, base=base, rayt=rayt,
            bank0=(off // MAX_CELLS).astype(jnp.int32)[:, :, None],
            ray_ids=ray_ids, k_enter=tke,
            pixel_ids=pixel_ids, tile_ids=tile_ids,
            samples=0)
        sched = TiledSchedule(
            groups=(group,), fallback=None,
            hostmap_all=hm_flat, gathermap_all=hm_flat,
            gather_plan=None, total_rays=self._plan.ray_count,
            tiled_samples=0,
            full_lattice_samples=(self._plan.ray_count
                                  * self._plan.sampling.max_steps),
            fallback_rays=0, grid_shape=(nz, ny, nx), bbox=self._bbox,
            tile_px=16, table_kind="dense", pitch=1, cell_scale=1)
        return sched, diag

    def _build_and_render(self, sigma, color, k, c2w, consts):
        """Single-dispatch build + render (TPU mode). Do NOT use on the
        CPU backend: its kLoop fusion pulls the whole ~100-op hostmap
        decode chain into the render's cube gather as producers and
        recomputes it per accessed element (measured 18 s vs 0.3 s
        split at 128^2/16^3; opt-barriers and trip-1 while_loops are
        both simplified away before its fusion pass)."""
        field = self._field_tpl.with_params(sigma, color)
        sched, diag = self._build_schedule(k, c2w, consts)
        planes = render_tiled(self._plan, field, sched,
                              use_kernel=self._use_kernel)
        return planes, diag

    # ------------------------------------------------------------------
    def schedule_for(self, plan: Plan):
        """The device-built schedule for ``plan``'s camera (diagnostics
        checked eagerly). For tests/inspection; :meth:`render` fuses the
        build into the render dispatch instead."""
        check(_plan_geometry(plan) == self._geom,
              "PosedRenderer: plan differs from the base plan beyond "
              "the camera (re-create the renderer)")
        k, c2w = self._cam_arrays(plan)
        sched, diag = self._sched_fn(k, c2w, self._consts)
        self._check_diag(np.asarray(diag))
        return sched

    def _check_diag(self, diag):
        span_c, run_max, ez_max, nb_need = (int(v) for v in diag)
        check(span_c <= self.nc_pin,
              f"pose needs {span_c} chunks > nc_pin={self.nc_pin}; "
              "re-create the PosedRenderer with a larger nc_pin")
        check(run_max <= 2 * MAX_CELLS,
              f"sliced-box run of {run_max} cells exceeds the kernel's "
              "2-bank window; use the host-built path for this pose")
        check(ez_max <= self.ez_pin,
              f"pose spans {ez_max} z-slices > ez_pin={self.ez_pin}; "
              "re-create the PosedRenderer with a larger ez_pin")
        check(nb_need <= self.nb_pin,
              f"pose needs {nb_need} banks > nb_pin={self.nb_pin}; "
              "re-create the PosedRenderer with a larger nb_pin")

    def render(self, plan: Plan, field, check_diag: bool = True):
        """ImagePlanes for ``plan``'s camera: ONE jitted dispatch doing
        schedule build + table gather + fused render.

        ``check_diag=False`` skips the eager diagnostics fetch (saves a
        device roundtrip in throughput loops; call :meth:`check_ok`
        after the sweep instead - diagnostics of the LAST frame are
        kept)."""
        check(_plan_geometry(plan) == self._geom,
              "PosedRenderer: plan differs from the base plan beyond "
              "the camera (re-create the renderer)")
        check(tuple(float(v) for v in field.bbox_min) == self._bbox[0]
              and tuple(float(v) for v in field.bbox_max) == self._bbox[1]
              and tuple(int(v) for v in np.asarray(field.sigma.shape[:3]))
              == self._grid,
              "field geometry differs from the renderer's")
        self._field_tpl = field
        k, c2w = self._cam_arrays(plan)
        if self._fused:
            planes, diag = self._render_fn(field.sigma, field.color, k,
                                           c2w, self._consts)
        else:
            sched, diag = self._sched_fn(k, c2w, self._consts)
            planes = self._consume_fn(field.sigma, field.color, sched)
        self._last_diag = diag
        if check_diag:
            self._check_diag(np.asarray(diag))
        return planes

    def render_sweep(self, plans, field, check_diag: bool = True):
        """Render a POSE SWEEP in one dispatch: ``lax.scan`` over the
        stacked cameras with the fused build+render as the body (the
        ~36 ms tunnel dispatch amortizes across the sweep). Returns
        (images (F, H, W, 3), diags (F, 4)). TPU mode only (the scan
        body hits the CPU backend's fusion pathology; see
        :meth:`_build_and_render`)."""
        check(self._fused, "render_sweep needs fused mode (TPU)")
        for p in plans:
            check(_plan_geometry(p) == self._geom,
                  "PosedRenderer: plan differs from the base plan "
                  "beyond the camera (re-create the renderer)")
        self._field_tpl = field
        ks = jnp.stack([self._cam_arrays(p)[0] for p in plans])
        c2ws = jnp.stack([self._cam_arrays(p)[1] for p in plans])
        if not hasattr(self, "_sweep_fn"):
            def sweep(sigma, color, ks, c2ws, consts):
                def body(_, kc):
                    planes, diag = self._build_and_render(
                        sigma, color, kc[0], kc[1], consts)
                    return 0, (planes.image, diag)
                return jax.lax.scan(body, 0, (ks, c2ws))[1]
            self._sweep_fn = jax.jit(sweep)
        images, diags = self._sweep_fn(field.sigma, field.color, ks,
                                       c2ws, self._consts)
        self._last_diag = jax.numpy.max(diags, axis=0)
        if check_diag:
            self._check_diag(np.asarray(self._last_diag))
        return images, diags

    def check_ok(self):
        """Validate the most recent frame's pin diagnostics (raises on
        violation)."""
        if self._last_diag is not None:
            self._check_diag(np.asarray(self._last_diag))

    def cache_size(self) -> int:
        return self._render_fn._cache_size()
