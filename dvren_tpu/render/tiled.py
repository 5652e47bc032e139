"""Tile-table render scheduling: the host side of the fused Pallas path.

The TPU-native successor to the bbox window schedule (render/windowed.py):
instead of only clipping each ray's lattice window, the host *fully
resolves the memory access pattern* of the render at schedule-build time -
the capture-specialization model taken to its conclusion. For a fixed
(plan, camera, field bbox) every sample's cell and trilinear weights are
static; only the field VALUES change between calls. The schedule:

1. tiles the ROI into 16x16-pixel blocks (256 rays), each with a shared
   step window [k_enter, k_enter + budget) split into 8-step chunks;
2. per (tile, chunk), collects the <= 128 distinct grid cells its 2048
   samples touch (spatially coherent rays guarantee small cell sets; <=
   256 via two table banks) and assigns each sample a local slot id;
3. per sample, ships only sample_t and the (slot | mask) bits, plus
   per-tile ray planes and per-slot cell bases - the kernel recomputes
   trilinear fractions on-chip (the slim schedule; fractions cost 2.5x
   the DMA bytes and the kernel is bandwidth-bound).

At render time the device gathers each (tile, chunk) cell table from the
packed-stencil table with ONE row-gather per slot (~16x fewer gather
starts than one per sample - the measured XLA bottleneck), and the fused
Pallas kernel (ops/fused_tiles.py) turns table rows into per-sample values
with `tpu.dynamic_gather` lane shuffles: no per-sample gather ever runs.
Composition is by TILE (the kernel emits (16,16) image tiles;
:func:`_compose_tiles`) and the packed-table gradient is accumulated by a
host-planned gather-transpose (:func:`_build_gather_plan`) - XLA scatters
are ~10x slower than gathers on the target chip and appear nowhere on the
hot path.

Tiles whose cell set overflows 256 slots anywhere (extreme grid/frustum
ratios) fall back to the windowed path; correctness never depends on the
tile geometry. Sample layout per (tile, chunk): block row r in [0,16),
lane = (ray_in_tile %% 16) * 8 + step, ray_in_tile = r * 16 + lane // 8.

Reference role model: hp_samp_int_fused + CUDA Graph steady state
(/root/reference/hotpath/src/cpu/samp_int_fused.cpp:11-76,
/root/reference/hotpath/src/cuda/graph_cuda.cu:120-205).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from dvren_tpu.core.plan import OobPolicy, Plan
from dvren_tpu.core.status import check
from dvren_tpu.ops import grid as grid_ops
from dvren_tpu.ops.compose import ImagePlanes
from dvren_tpu.ops.fused_tiles import DEFAULT_REDUCE
from dvren_tpu.ops.integrate import integrate
from dvren_tpu.render import windowed as windowed_mod
from dvren_tpu.utils.pytree import device_put_tree, pytree_dataclass

TILE_W = 16
TILE_H = 16
RAYS_PER_TILE = TILE_W * TILE_H
CHUNK = 8
MAX_CELLS = 128
_SENTINEL = np.int64(1) << 62

# Backward cotangent split strategy: "pallas" runs the f32 bank-block ->
# u16 slot-row relayout in the blockwise VMEM kernel
# (ops/packed_transpose.py::banks_to_u16_rows); "xla" is the plain
# bitcast + split + swapaxes (materializes lane-padded sub-128-minor
# intermediates). Bit-identical outputs (both are pure integer
# plumbing); flag kept until the tradeoff is measured on TPU
# (tools/bwdsplit_probe.py isolates it; bench.py ablates both and
# headlines the best).
BWD_SPLIT = os.environ.get("DVREN_BWD_SPLIT", "xla")


@pytree_dataclass(meta_fields=("n_chunks", "n_tiles", "banks", "samples"))
@dataclass(frozen=True)
class TileGroup:
    """All tiles sharing one (chunk count, bank count) - static kernel
    shapes.

    A registered pytree so schedules flow through jit as ARGUMENTS
    (closing over the group arrays embeds them as HLO constants; at 512^2
    that is >100 MB of literals and overflows the remote-compile upload).

    Bank packing (round 3): each chunk's unique-cell run packs DENSELY
    into the tile's shared lane space (``banks`` banks of 128 lanes); a
    run starts at any offset and spans at most two consecutive banks
    (runs > 128 cells align to a bank boundary). Measured at 512^2/64^3,
    only ~38% of round-2's fixed 128-slot chunk tables were live - dense
    packing cuts slot lanes ~2.3x, and with them the host row-gather
    bytes, the kernel's table DMA, and the backward's cotangent write.
    """

    n_chunks: int
    n_tiles: int             # padded to a multiple of 8 (kernel DMA blocks)
    banks: int               # table banks per TILE (lanes = banks*128)
    hostmap: jnp.ndarray     # (T*banks*128,) int32 packed row per lane
    gathermap: jnp.ndarray   # pitch 1: the same array as ``hostmap``;
    #                          pitch 2: (T*banks*64,) int32 packed-row
    #                          PAIR id per slot pair - the forward table
    #                          gather fetches two consecutive packed rows
    #                          per start (u16 row gathers are start-paced
    #                          and width-flat to 128 elements, so pairing
    #                          halves the dominant start count; see
    #                          build_tiled_schedule(pitch=2))
    samp: jnp.ndarray        # (T, nc, 3, 16, 128) u16, 6 B/sample:
    #                          planes [sample_t hi16, sample_t lo16,
    #                          tile-local lane | mask << 15]. INVARIANT
    #                          (ADVICE r2, tightened round 3): this is
    #                          INTEGER data - sample_t's exact f32 bits
    #                          split in half plus packed slot bits; only
    #                          bit ops and DMA may touch it (host pack
    #                          here; (hi << 16 | lo) bitcast + bit masks
    #                          in ops/fused_tiles.py::_sample_geometry).
    #                          The kernel recomputes trilinear fractions
    #                          from these + base + rayt (f32 planes cost
    #                          8 B/sample, shipped fractions 2.5x more;
    #                          the kernel is bound by this chip's
    #                          ~100 GB/s effective HBM rate)
    base: jnp.ndarray        # (T, banks, 3, 128) f32 cell base coords
    rayt: jnp.ndarray        # (T, 12, 128) f32 compact ray planes: row
    #                          ax*2 + half, lane = ray % 128 for axes
    #                          (ox, oy, oz, dx, dy, dz); the kernel
    #                          expands to sample layout with two lane
    #                          shuffles (round 2 shipped the 8x-replicated
    #                          (6, 16, 128) planes - 44 MB/frame at 512^2)
    bank0: jnp.ndarray       # (T, nc, n_sub) int32: window start bank
    #                          per (chunk, sub-tile) in bits 0..13, plus
    #                          the ALIGNED bit at 30 - set when the
    #                          window's run provably fits bank b0 alone;
    #                          the backward kernel then contracts a
    #                          single-bank 128-slot one-hot (bit-
    #                          identical gradients, half the scatter
    #                          MXU work; fused_tiles.py::_Windows)
    ray_ids: jnp.ndarray     # (T, 256) int32 global ray id per tile lane
    #                          (dead/pad rays -> 0; their weights are 0 so
    #                          camera-gradient flow through ray 0 carries
    #                          zero cotangent) - used to rebuild the ray
    #                          planes as TRACED functions of (K, c2w) for
    #                          the fast path's camera gradients
    k_enter: jnp.ndarray     # (T,) int32 tile window start
    pixel_ids: jnp.ndarray   # (T*256,) int32 compose targets (reference
    #                          consumer + parity paths)
    tile_ids: jnp.ndarray    # (T,) int32 global ROI tile index (row-major
    #                          tile grid; pads/overflow tiles = n_tiles
    #                          -> dropped); the kernel path composes by
    #                          TILE (its (16,16) output block IS the image
    #                          tile), ~1000 scatter starts instead of one
    #                          per ray
    samples: int             # live sample count (stats)


@pytree_dataclass(meta_fields=("meta",))
@dataclass(frozen=True)
class GatherPlan:
    """Backward gather-transpose plan (see :func:`_build_gather_plan`).

    ``meta`` (static) = per count-class (offset, n_k, c_k) into
    ``all_idx``; the arrays are device-resident pytree leaves."""

    all_idx: jnp.ndarray     # (S,) i32 cotangent-row gather order
    inv_map: jnp.ndarray     # (n_cells,) i32 class-order -> table row
    meta: tuple


@pytree_dataclass(meta_fields=("total_rays", "tiled_samples",
                               "full_lattice_samples", "fallback_rays",
                               "grid_shape", "bbox", "tile_px",
                               "table_kind", "pitch", "cell_scale"))
@dataclass(frozen=True)
class TiledSchedule:
    groups: tuple            # of TileGroup
    fallback: object         # windowed.WindowedSchedule | None (overflow rays)
    hostmap_all: jnp.ndarray  # (S,) int32: all groups' packed rows, concat
    gathermap_all: jnp.ndarray  # (S // pitch,) int32: the forward table
    #                          gather's row (pitch 1) / row-pair (pitch 2)
    #                          ids, concat of the groups' gathermaps
    gather_plan: object      # GatherPlan | None: the backward's
    #                          gather-transpose - d(table) is computed by
    #                          gathering each cell's slot cotangents,
    #                          reducing, and assembling the FULL table by
    #                          an inverse-permutation gather. NO scatter:
    #                          XLA:TPU scatters run at ~20-45M rows/s here
    #                          (~10x slower than gathers), so the direct
    #                          .at[hostmap].add dominated the train step.
    total_rays: int
    tiled_samples: int
    full_lattice_samples: int
    fallback_rays: int
    grid_shape: tuple        # (nz, ny, nx) the schedule's cell ids index
    bbox: tuple              # ((min), (max)) the windows/cells assume
    tile_px: int = 16        # compose granularity: 16, 8 or 4 (fine-grid
    #                          sub-tiled modes; kernel subs = (16/tile_px)^2
    table_kind: str = "dense"  # "dense": hostmap rows index the full-pitch
    #                            packed-stencil table; "sparse": rows index
    #                            the brick table (slot * 512 + local), the
    #                            two-level indirection resolved at build
    pitch: int = 1           # cells per forward-gather start (1 or 2);
    #                          pitch 2 packs runs at cell-PAIR granularity
    #                          (lane of cell = 2*pairrank + (cell & 1)),
    #                          halving gather starts for ~1.33x lane
    #                          inflation measured at the headline config
    cell_scale: int = 1      # 1: one slot per grid cell (32-row packed
    #                          stencil); 2: one slot per 2x2x2 SUPERCELL
    #                          (108-row 3^3-vertex table,
    #                          ops/grid.py::build_supercell_stencil) -
    #                          ~8x the cells per slot for coarse views
    #                          where the per-cell table economy collapses
    #                          (the kernel consumes it with hat-basis
    #                          weights, stencil="super")


def build_tiled_schedule_auto(plan: Plan, field,
                              jitter: np.ndarray | None = None,
                              occupancy: bool = False,
                              quantize: bool = False,
                              pitch: int = 1,
                              device: bool = True):
    """Build the schedule at the coarsest configuration whose slot
    tables hold the scene: 16px cell tables first, then 2x2x2 SUPERCELL
    tables at 16px (8x the cells per slot - the coarse-view rescue,
    where rays sweep many cells per chunk), then the 8px / 4px sub-tile
    cascade when >10% of rays still fall back (finer sub-tiles divide
    the cells a table must hold; 4px can never overflow - <= 128
    samples per run, <= 256 lanes even at pitch 2). Returns
    (schedule, note_or_None)."""
    # Probes skip the windowed-fallback construction (only the overflow
    # COUNT ranks configurations); the chosen config is rebuilt with its
    # fallback at the end when it still has overflow rays.
    sched = build_tiled_schedule(plan, field, jitter=jitter,
                                 occupancy=occupancy, quantize=quantize,
                                 pitch=pitch, device=device,
                                 build_fallback=False)
    chosen = (16, 1)
    note = None
    supercell_ok = (not hasattr(field, "bricks")
                    and getattr(field, "packed_dtype", "float32")
                    == "float32")
    if supercell_ok:
        cascade = [(16, 2), (8, 1), (8, 2), (4, 1)]
    else:
        cascade = [(8, 1), (4, 1)]
    for px, scale in cascade:
        if sched.fallback_rays * 10 <= sched.total_rays:
            break
        s_fine = build_tiled_schedule(plan, field, jitter=jitter,
                                      occupancy=occupancy, tile_px=px,
                                      quantize=quantize, pitch=pitch,
                                      cell_scale=scale, device=device,
                                      build_fallback=False)
        if s_fine.fallback_rays < sched.fallback_rays:
            sched = s_fine
            chosen = (px, scale)
            note = (f"tiled_subtiled_{px}px" if scale == 1
                    else f"tiled_supercell_{px}px")
    if sched.fallback_rays:
        sched = build_tiled_schedule(plan, field, jitter=jitter,
                                     occupancy=occupancy,
                                     tile_px=chosen[0],
                                     quantize=quantize, pitch=pitch,
                                     cell_scale=chosen[1], device=device)
    return sched, note


def _tile_rays(plan: Plan, tile_px: int = 16):
    """Global ray ids per 256-ray block, (n_blocks, 256) with -1 padding.

    ``tile_px=16``: one 16x16 image tile per block, row-major ray order.
    ``tile_px=8`` (fine-grid mode): each block covers a 16x16-pixel
    region as 2x2 SUB-TILES of 8x8 pixels, rays ordered sub-major
    (positions s*64..s*64+63 = sub-tile s row-major) so block rows
    4s..4s+3 belong to sub-tile s - the kernel's per-sub-tile bank
    windows key on that. Also returns (n_blocks, n_sub) global sub-tile
    indices over the ceil(roi/tile_px) grid (compose targets).
    """
    roi = plan.roi
    per = 16 // tile_px
    n_sub = per * per
    sx_n = -(-roi.width // tile_px)
    sy_n = -(-roi.height // tile_px)
    tx_n = -(-roi.width // TILE_W)
    ty_n = -(-roi.height // TILE_H)
    tiles = []
    sub_ids = []
    for ty in range(ty_n):
        for tx in range(tx_n):
            ids = []
            sids = []
            for s in range(n_sub):
                sy, sx = s // per, s % per
                ly = ty * TILE_H + sy * tile_px + np.arange(tile_px)
                lx = tx * TILE_W + sx * tile_px + np.arange(tile_px)
                yy, xx = np.meshgrid(ly, lx, indexing="ij")
                ids.append(np.where(
                    (yy < roi.height) & (xx < roi.width),
                    yy * roi.width + xx, -1).reshape(-1))
                gy, gx = ty * per + sy, tx * per + sx
                sids.append(gy * sx_n + gx
                            if gy < sy_n and gx < sx_n else -1)
            tiles.append(np.concatenate(ids))
            sub_ids.append(np.asarray(sids))
    return np.stack(tiles), np.stack(sub_ids)


def _empty_cells(sigma: np.ndarray) -> np.ndarray:
    """FULL-pitch flat bool per grid cell: True iff ALL 8 corner sigmas
    are exactly 0 (trilinear interpolation inside such a cell is
    identically 0, so skipping its samples is exact - the TPU-native
    superset of the reference's only acceleration, early termination,
    int_cpu.cpp:171). Dead full-pitch rows (ix == X-1 etc., never
    produced by the clipped floor) are marked empty."""
    s = np.asarray(sigma) != 0.0
    occ = (s[:-1, :-1, :-1] | s[:-1, :-1, 1:] | s[:-1, 1:, :-1]
           | s[:-1, 1:, 1:] | s[1:, :-1, :-1] | s[1:, :-1, 1:]
           | s[1:, 1:, :-1] | s[1:, 1:, 1:])
    full = np.ones(s.shape, bool)
    full[:-1, :-1, :-1] = ~occ
    return full.reshape(-1)


def _empty_cells_sparse(field) -> np.ndarray:
    """FULL-pitch flat bool per base cell for a SparseGridField: True iff
    the cell's packed stencil row (all 8 sigma corners) is exactly 0.
    Unoccupied bricks map to the shared zero brick (slot 0), so their
    cells are empty by construction; occupied bricks are tested row-wise
    (a kept brick can still contain zero cells near its border)."""
    from dvren_tpu.fields.sparse_grid import BRICK, _SIGMA_CH
    occ = np.asarray(field.occupancy)
    bricks = np.asarray(field.bricks, np.float32)
    nz, ny, nx = (int(v) for v in field.grid_shape)
    zm, ym, xm = nz - 1, ny - 1, nx - 1
    bempty = (bricks[:, :, list(_SIGMA_CH)] == 0).all(axis=2)  # (NB, 512)
    bz, by, bx = occ.shape
    cells = bempty[occ.reshape(-1)].reshape(
        bz, by, bx, BRICK, BRICK, BRICK)
    cells = cells.transpose(0, 3, 1, 4, 2, 5).reshape(
        bz * BRICK, by * BRICK, bx * BRICK)
    full = np.ones((nz, ny, nx), bool)
    full[:zm, :ym, :xm] = cells[:zm, :ym, :xm]
    return full.reshape(-1)


def _sparse_rows_for_cells(cells: np.ndarray, occ: np.ndarray,
                           grid_shape) -> np.ndarray:
    """Resolve full-pitch base-cell ids -> brick-table row ids
    (slot * BRICK^3 + brick-local cell) on the host: the sparse field's
    two-level indirection costs NOTHING at render time - the device-side
    table build gathers brick rows exactly like dense packed rows."""
    from dvren_tpu.fields.sparse_grid import BRICK
    nz, ny, nx = grid_shape
    iz = cells // (ny * nx)
    rem = cells % (ny * nx)
    iy = rem // nx
    ix = rem % nx
    slot = occ[iz // BRICK, iy // BRICK, ix // BRICK].astype(np.int64)
    local = ((iz % BRICK) * BRICK + (iy % BRICK)) * BRICK + (ix % BRICK)
    return slot * (BRICK ** 3) + local


def _tighten_windows_by_occupancy(plan, o, d, k_enter_ray, k_count_ray,
                                  jitter, bbox_min, bbox_max, grid_shape,
                                  cell_empty, block=65536):
    """Shrink each ray's [k_enter, k_enter+k_count) window to its first..last
    lattice step whose (jittered, f32-exact) sample lands in a NON-empty
    cell. Trimmed steps contribute exactly zero (empty cell => sigma == 0),
    so outputs are unchanged - host-side empty-space skipping on top of the
    bbox window."""
    nz, ny, nx = grid_shape
    dt = np.float32(plan.sampling.dt)
    t_near = np.float32(plan.t_near)
    t_far = np.float32(plan.t_far)
    k_max = plan.sampling.max_steps
    n = plan.ray_count
    inv_ext = np.where(
        np.asarray(bbox_max) != np.asarray(bbox_min),
        1.0 / np.maximum(np.asarray(bbox_max) - np.asarray(bbox_min),
                         1e-30), 0.0).astype(np.float32)
    lo = np.asarray(bbox_min, np.float32)
    npts = np.array([nx, ny, nz])

    native_mod = _native_sched()
    if native_mod is not None:
        # forward/backward scan per ray in the native core - skips the
        # window interior entirely (shells make it the common case);
        # bit-identical windows (rays left untouched because their whole
        # block was dead keep ke=0 instead of the original ke, which the
        # schedule never reads for cnt == 0 rays - sched_hash verified)
        nudge = np.nextafter(t_far, t_near, dtype=np.float32)
        return native_mod.tighten_occupancy(
            o, d, k_enter_ray, k_count_ray, jitter,
            float(t_near), float(t_far), float(dt), float(nudge),
            int(k_max), lo, inv_ext, (nx, ny, nz), cell_empty)

    new_ke = k_enter_ray.copy()
    new_cnt = k_count_ray.copy()
    for start in range(0, n, block):
        idx = np.arange(start, min(start + block, n))
        cnt = k_count_ray[idx]
        if not (cnt > 0).any():
            continue
        kw = int(cnt.max())
        k = k_enter_ray[idx, None] + np.arange(kw, dtype=np.int64)[None, :]
        in_win = np.arange(kw)[None, :] < cnt[:, None]
        base_t = t_near + k.astype(np.float32) * dt
        live = (base_t < t_far) & (k < k_max) & in_win
        if jitter is not None:
            jit = jitter[idx[:, None], np.minimum(k, jitter.shape[1] - 1)]
        else:
            jit = np.float32(0.5)
        t = (base_t + jit * dt).astype(np.float32)
        t = np.where(t >= t_far, np.nextafter(t_far, t_near,
                                              dtype=np.float32), t)
        ii = np.zeros(live.shape + (3,), np.int64)
        inside = np.ones(live.shape, bool)
        for ax in range(3):
            p = (o[idx, None, ax] + d[idx, None, ax] * t).astype(np.float32)
            local = ((p - lo[ax]) * inv_ext[ax]).astype(np.float32)
            inside &= (local >= 0.0) & (local <= 1.0)
            f = (local * np.float32(npts[ax] - 1)).astype(np.float32)
            ii[..., ax] = np.clip(np.floor(f), 0, npts[ax] - 2)
        cell = (ii[..., 2] * ny + ii[..., 1]) * nx + ii[..., 0]
        occ_live = live & inside & ~cell_empty[cell]
        any_live = occ_live.any(axis=1)
        first = np.argmax(occ_live, axis=1)
        last = kw - 1 - np.argmax(occ_live[:, ::-1], axis=1)
        ke0 = k_enter_ray[idx]
        new_ke[idx] = np.where(any_live, ke0 + first, 0)
        new_cnt[idx] = np.where(any_live, last - first + 1, 0)
    return new_ke.astype(np.int32), new_cnt.astype(np.int32)


# Kernel-variant quantization series: group shapes (chunk counts, bank
# counts) round UP to the nearest member, so every (nc, nb) pair maps to
# a small shared set of Pallas kernel instantiations. Ratio <= 1.34 bounds
# the padding waste; padded chunks are fully masked samples (exact zeros
# in every sum) and padded banks are never indexed (b1 clamps at nb - 1),
# so quantized schedules render BIT-IDENTICAL images. Multi-view training
# is the motivating case: 8 views at 96^2/4px produced ~100 distinct
# (nc, nb) pairs = ~100 Mosaic kernel compiles inside one train step
# (measured: >17 min of client-side trace+lowering); quantized they share
# <= a dozen.
_QUANT = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16, 20, 26, 32, 42, 52, 64, 84,
          104, 128, 168, 208, 256)


def _quant_up(v: int, cap: int | None = None) -> int:
    for q in _QUANT:
        if q >= v:
            return q if cap is None else min(q, cap)
    return v


def _pack_runs_numpy(flat: np.ndarray, pitch: int, umax: int, pmax: int):
    """Numpy reference for the scheduler's sort/unique/lane phase - the
    byte-identical fallback for the native core
    (native/dvren_native.cpp::dvn_pack_runs; tools/sched_hash.py is the
    identity harness). Per row of sample cell ids: stable sort, assign
    window-relative lanes in sorted-unique order (pitch 1: lane = unique
    rank; pitch 2: lane = 2*pair_rank + (cell & 1); the sentinel sorts
    last and gets no slot), and compact the unique (cell, lane) list for
    the hostmap/gathermap scatter. Returns (lidx, lanes_run, ucell,
    ulane, n_u, upair, n_p); upair's j-th pair has rank j."""
    order = np.argsort(flat, axis=1, kind="stable")
    sc = np.take_along_axis(flat, order, 1)
    new = np.ones(flat.shape, bool)
    new[:, 1:] = sc[:, 1:] != sc[:, :-1]
    rank = np.cumsum(new, axis=1, dtype=np.int32) - 1
    has_sent = sc[:, -1] == _SENTINEL
    if pitch == 2:
        pcs = np.where(sc == _SENTINEL, _SENTINEL, sc >> 1)
        new_p = np.ones(flat.shape, bool)
        new_p[:, 1:] = pcs[:, 1:] != pcs[:, :-1]
        prank = np.cumsum(new_p, axis=1, dtype=np.int32) - 1
        lane_sorted = (2 * prank + (sc & 1)).astype(np.int32)
        lanes_run = (2 * (prank[:, -1] + 1 - has_sent)).astype(np.int32)
    else:
        lane_sorted = rank
        lanes_run = (rank[:, -1] + 1 - has_sent).astype(np.int32)
    lidx = np.empty(flat.shape, np.int32)
    np.put_along_axis(lidx, order, lane_sorted, 1)

    def compact(vals, mask, width, lanes=None):
        # stable valid-first partition along the sorted axis
        ord2 = np.argsort(~mask, axis=1, kind="stable")
        n = np.minimum(mask.sum(1), width).astype(np.int32)
        within = np.arange(width)[None, :] < n[:, None]
        v = np.take_along_axis(vals, ord2[:, :width], 1)
        out = np.where(within, v, -1)
        ln = None
        if lanes is not None:
            ln = np.where(
                within,
                np.take_along_axis(lanes, ord2[:, :width], 1),
                0).astype(np.int32)
        return out, ln, n

    ucell, ulane, n_u = compact(sc, new & (sc != _SENTINEL), umax,
                                lane_sorted)
    if pitch == 2:
        upair, _, n_p = compact(pcs, new_p & (pcs != _SENTINEL), pmax)
    else:
        upair = np.full((flat.shape[0], pmax), -1, np.int64)
        n_p = np.zeros(flat.shape[0], np.int32)
    return lidx, lanes_run, ucell, ulane, n_u, upair, n_p


def _native_sched():
    """The native scheduler core module when built and enabled
    (DVREN_NATIVE_SCHED=0 forces the byte-identical numpy reference;
    no g++ degrades gracefully). Surviving runs hold <= 2*MAX_CELLS
    lanes (larger ones demote to the windowed fallback before
    consumption), so the compact plan widths always cover every row the
    assembly reads."""
    if os.environ.get("DVREN_NATIVE_SCHED", "1") == "0":
        return None
    from dvren_tpu import native
    return native if native.available() else None


def build_tiled_schedule(plan: Plan, field,
                         jitter: np.ndarray | None = None,
                         occupancy: bool = False,
                         tile_px: int = 16,
                         quantize: bool = False,
                         pitch: int = 1,
                         cell_scale: int = 1,
                         uniform_shape: tuple | None = None,
                         all_tiles: bool = False,
                         device: bool = True,
                         build_fallback: bool = True,
                         bank_aligned: bool = False) -> TiledSchedule:
    """Build the tile-table schedule for (plan, field bbox + resolution).

    ``jitter``: the (N, K) host table for stratified plans
    (pipeline.plan_jitter_table); required when the plan is stratified.
    Valid for any field sharing the same bbox AND grid resolution
    (cell ids depend on both); the driver checks.

    ``occupancy=True`` additionally trims each ray's step window to its
    first..last sample in a non-empty cell (all-zero-corner cells
    contribute exactly 0) - bit-exact empty-space skipping for sparse
    media (SDF shells, sparse scenes). The schedule then also depends on
    WHERE the field's zeros are: reuse it only while the zero set is
    unchanged (inference / frozen-topology training).

    ``tile_px``: 16 (default), 8, or 4 - the FINE-GRID modes: each
    kernel block still covers 16x16 pixels but as (16/tile_px)^2
    sub-tiles with independent bank windows, dividing the cells a slot
    table must hold. 8px: 0% slot overflow at 512^2 over 128^3 (58% of
    16px tiles overflow) and at the reference's 800^2/160^3 SDF shell
    with occupancy (91% overflow at 16px). 4px (one block row per
    sub-tile) reaches ~2 px/cell scenes: 256^3 under 512^2. Overflowing
    SUB-tiles (not whole blocks) fall back to the windowed path.

    ``quantize=True`` rounds each group's (chunk count, bank count) up to
    the ``_QUANT`` series so kernel variants are shared across schedules
    - use for multi-view training where every view otherwise instantiates
    its own kernel shapes (bit-identical output; <= ~30% padded work).

    ``pitch=2`` packs runs at cell-PAIR granularity: the lane of a cell
    is 2*pairrank + (cell & 1), so the forward table gather fetches TWO
    consecutive packed rows per start (a 128-element u16 row - row
    gathers are start-paced and width-flat to 128 elements, measured in
    tools/gather_probe.py). Halves the dominant gather-start count for a
    measured ~1.33x lane inflation at 512^2/64^3 (isolated cells waste
    their partner lane; partner lanes are never indexed by samples,
    carry exact-zero cotangents, and stay -1 in ``hostmap`` so the
    backward's gather plan excludes them). Output is bit-identical to
    pitch 1 - only lane placement changes. Sparse fields with an ODD x
    dimension demote to pitch 1 (their brick tables cannot satisfy the
    consecutive-row pair premise); ``schedule.pitch`` records the
    effective value.
    """
    check(tile_px in (4, 8, 16), "tile_px must be 4, 8 or 16")
    check(pitch in (1, 2), "pitch must be 1 or 2")
    check(cell_scale in (1, 2), "cell_scale must be 1 or 2")
    check(not all_tiles or quantize == "uniform"
          or uniform_shape is not None,
          "all_tiles requires uniform quantization (one shape class)")
    # device=False keeps every schedule leaf as NUMPY: multi-view fits
    # build per-view schedules only to merge them - uploading each view
    # first made the merge concatenate DEVICE arrays, each jnp.concat a
    # remote-compiled tunnel dispatch (measured 81 s for the 8-view fit
    # flagship vs ~0 host-side). Numpy leaves merge at memcpy speed and
    # the merged schedule uploads ONCE (merge_view_schedules).
    # device=True ALSO builds numpy throughout and uploads in one
    # batched tree-level put at the end: per-leaf device_put pays the
    # relay's ~36 ms dispatch per array - ~130 leaves cost ~4.7 s of
    # pure roundtrips at 512^2 (tools/upload_probe.py; the host build
    # itself is ~1.7 s).
    put = lambda x: x  # noqa: E731 - leaves stay numpy until the end
    if cell_scale == 2:
        check(not hasattr(field, "bricks"),
              "cell_scale=2 (supercell tables) supports dense grids only")
        check(getattr(field, "packed_dtype", "float32") == "float32",
              "cell_scale=2 requires float32 tables")
        # pair-pitch packs consecutive PACKED rows; supercell rows are
        # not pairwise-fetchable the same way - structurally pitch 1
        pitch = 1
    if pitch == 2 and hasattr(field, "bricks"):
        gs = tuple(int(v) for v in field.grid_shape)
        if gs[2] % 2:
            # The sparse pair premise needs flat-id pairs (2j, 2j+1) to
            # be x-adjacent within one brick row-pair; with odd nx the
            # pair parity drifts per y row and pairs wrap x, so cell
            # 2j+1 is NOT at brick row(2j)+1 and the paired fetch would
            # load the wrong row. Structurally unsatisfiable -> pitch 1.
            pitch = 1
    n_sub = (16 // tile_px) ** 2
    check(getattr(field, "oob", OobPolicy.ZERO) == OobPolicy.ZERO,
          "tiled rendering requires an OOB_ZERO field")
    from dvren_tpu.core.plan import InterpMode
    check(getattr(field, "interp", InterpMode.LINEAR)
          == InterpMode.LINEAR,
          "tiled rendering precomputes trilinear fractions; NEAREST fields "
          "must use the windowed/full paths")
    bbox_min = tuple(float(v) for v in field.bbox_min)
    bbox_max = tuple(float(v) for v in field.bbox_max)
    sparse = hasattr(field, "bricks")    # SparseGridField protocol
    if sparse:
        nz, ny, nx = (int(v) for v in field.grid_shape)
        occ_host = np.asarray(field.occupancy)
    elif hasattr(field, "schedule_grid_shape"):
        # virtual cell grid (hash-grid fast path: the finest level's
        # point lattice, ops/hash_grid.py::grid_shape)
        nz, ny, nx = (int(v) for v in field.schedule_grid_shape)
    else:
        nz, ny, nx = (int(v) for v in np.asarray(field.sigma.shape[:3]))
    check(min(nx, ny, nz) >= 2, "tiled rendering requires grid dims >= 2")

    n = plan.ray_count
    dt = np.float32(plan.sampling.dt)
    t_near = np.float32(plan.t_near)
    t_far = np.float32(plan.t_far)
    k_max = plan.sampling.max_steps

    o, d = windowed_mod._host_rays(plan)
    k_enter_ray, k_count_ray = windowed_mod._windows(plan, bbox_min, bbox_max)

    from dvren_tpu.core.plan import SamplingMode as _SM
    if jitter is None and plan.sampling.mode == _SM.STRATIFIED:
        from dvren_tpu.render.pipeline import plan_jitter_table
        jitter = plan_jitter_table(plan)
    if jitter is not None:
        jitter = np.asarray(jitter, np.float32)

    if occupancy:
        cell_empty = (_empty_cells_sparse(field) if sparse
                      else _empty_cells(field.sigma))
        k_enter_ray, k_count_ray = _tighten_windows_by_occupancy(
            plan, o, d, k_enter_ray.astype(np.int64),
            k_count_ray.astype(np.int64), jitter, bbox_min, bbox_max,
            (nz, ny, nx), cell_empty)

    tiles, sub_tile_ids = _tile_rays(plan, tile_px)   # (n_blocks, 256)
    n_tiles_all = tiles.shape[0]
    safe_ids = np.maximum(tiles, 0)
    ray_live = (tiles >= 0) & (k_count_ray[safe_ids] > 0)

    ke = np.where(ray_live, k_enter_ray[safe_ids], np.iinfo(np.int32).max)
    kx = np.where(ray_live, k_enter_ray[safe_ids] + k_count_ray[safe_ids], 0)
    tile_live = ray_live.any(axis=1)
    tile_ke = np.where(tile_live, ke.min(axis=1), 0).astype(np.int64)
    tile_kx = kx.max(axis=1)
    budget = np.maximum(tile_kx - tile_ke, 0)
    budget = np.minimum(-(-budget // CHUNK) * CHUNK, -(-k_max // CHUNK) * CHUNK)
    n_chunks_tile = (budget // CHUNK).astype(np.int64)
    if quantize == "uniform" or uniform_shape is not None:
        # ONE (nc, nb) class for every tile: pads each tile's window to
        # the longest (extra chunks are fully masked - exact zeros) and
        # every tile's bank space to the widest, so the whole schedule
        # (and, with equal maxima, a whole multi-view merge) compiles
        # ONE Mosaic kernel variant pair. Bit-identical renders; the
        # padding waste is bounded by the (nc, nb) spread (~30% at the
        # fit flagship vs ~19 variants unpadded, whose client-side
        # trace/lowering dominated the fit's cold wall-clock).
        # ``uniform_shape=(nc, nb)`` pins the class EXPLICITLY (>= this
        # schedule's own maxima - a multi-view fit pins every view to
        # the global maxima so the merge is one group).
        live_nc = n_chunks_tile[tile_live & (n_chunks_tile > 0)]
        if live_nc.size or all_tiles:
            nc_u = int(live_nc.max()) if live_nc.size else 1
            if uniform_shape is not None:
                check(uniform_shape[0] >= nc_u,
                      "uniform_shape nc below this schedule's maximum")
                nc_u = int(uniform_shape[0])
            n_chunks_tile = np.where(
                tile_live & (n_chunks_tile > 0), nc_u, n_chunks_tile)
            if all_tiles:
                # Camera-stable mode: EVERY image tile joins the single
                # uniform group (dead tiles carry fully-masked chunks -
                # their samples contribute exact zeros and their raw
                # heads equal the zero tiles the composer would have
                # used), so the schedule's pytree structure is a pure
                # function of (plan geometry, uniform_shape, tile_px,
                # pitch) and one jitted render replays every camera.
                tile_live = np.ones_like(tile_live)
                n_chunks_tile = np.full_like(n_chunks_tile, nc_u)
    elif quantize:
        nc_cap = -(-k_max // CHUNK)
        lut = np.array([_quant_up(v, nc_cap)
                        for v in range(int(n_chunks_tile.max()) + 1)]
                       if n_chunks_tile.size else [0], np.int64)
        n_chunks_tile = lut[n_chunks_tile]

    roi = plan.roi
    full_samples = n * k_max
    groups = []
    host_rows: list[np.ndarray] = []
    gmap_rows: list[np.ndarray] = []
    fallback_rays: list[np.ndarray] = []
    tiled_samples = 0
    pad_pid_base = plan.width * plan.height

    inv_ext = [np.float32(1.0 / (bbox_max[i] - bbox_min[i]))
               if bbox_max[i] != bbox_min[i] else np.float32(0.0)
               for i in range(3)]

    for nc in sorted(set(n_chunks_tile[tile_live & (n_chunks_tile > 0)])):
        sel = np.nonzero(tile_live & (n_chunks_tile == nc))[0]
        nc = int(nc)
        t_cnt = sel.size
        k_steps = nc * CHUNK

        ids = tiles[sel]                              # (T, 256)
        live_r = ray_live[sel]
        safe = np.maximum(ids, 0)
        ot = o[safe].astype(np.float32)               # (T, 256, 3)
        dtn = d[safe].astype(np.float32)
        ke_t = tile_ke[sel].astype(np.int64)          # (T,)

        nudge = np.nextafter(t_far, t_near, dtype=np.float32)
        sub_cols = (16 // n_sub) * 128
        umax = min(sub_cols, 2 * MAX_CELLS + 1)
        pmax = min(sub_cols, MAX_CELLS + 1)
        native_mod = _native_sched()
        if native_mod is not None:
            # Fused native lattice + run-pack: the whole per-(tile,
            # chunk) hot loop in ONE pass (march t, jitter, cell index +
            # mask with numpy-exact f32 arithmetic, kernel lane layout,
            # run-pack scan) - no full-array temporaries. Byte-identical
            # to the numpy block below (tools/sched_hash.py). With
            # cell_scale=2 the packed ids are SUPERCELL ids and lidx
            # carries the sample's cell-within-supercell bits at <<16.
            (st_l, m_l, lidx, lanes_run, ucell, ulane, n_u, upair,
             n_p) = native_mod.build_runs(
                ot, dtn, safe, live_r, ke_t, nc, n_sub,
                float(t_near), float(t_far), float(dt), float(nudge),
                int(k_max), jitter, int(n),
                np.asarray(bbox_min, np.float32),
                np.asarray(inv_ext, np.float32), (nx, ny, nz),
                pitch, int(_SENTINEL), umax, pmax,
                cell_scale=cell_scale)
        else:
            k = (ke_t[:, None, None]
                 + np.arange(k_steps,
                             dtype=np.int64)[None, None, :])  # (T,1,K)
            k = np.broadcast_to(k, (t_cnt, RAYS_PER_TILE, k_steps))
            base_t = t_near + k.astype(np.float32) * dt
            live = (base_t < t_far) & (k < k_max) & live_r[:, :, None]

            if jitter is not None:
                rows = np.minimum(safe, n - 1)
                cols = np.minimum(k, jitter.shape[1] - 1)
                jit = jitter[rows[:, :, None], cols]
            else:
                jit = np.float32(0.5)
            sample_t = np.asarray(base_t + jit * dt, np.float32)
            sample_t = np.where(sample_t >= t_far, nudge, sample_t)

            px = ot[:, :, 0:1] + dtn[:, :, 0:1] * sample_t
            py = ot[:, :, 1:2] + dtn[:, :, 1:2] * sample_t
            pz = ot[:, :, 2:3] + dtn[:, :, 2:3] * sample_t

            def _axis(p, lo, inv, npts):
                # All-f32 pipeline, no copies (the old version ran an
                # astype copy per op and computed the trilinear fraction
                # - dead since the slim schedule: the kernel recomputes
                # fractions in-kernel and the builder only needs the
                # mask + cell index).
                local = (p - np.float32(lo)) * inv
                inside = (local >= 0.0) & (local <= 1.0)
                f = local * np.float32(npts - 1)
                return inside, np.clip(
                    np.floor(f), 0, npts - 2).astype(np.int64)

            in_x, ix = _axis(px, bbox_min[0], inv_ext[0], nx)
            in_y, iy = _axis(py, bbox_min[1], inv_ext[1], ny)
            in_z, iz = _axis(pz, bbox_min[2], inv_ext[2], nz)
            m = (in_x & in_y & in_z & live)
            if cell_scale == 2:
                # SUPERCELL packed row + the sample's cell-within-
                # supercell bits (lb = lx + 2*ly + 4*lz)
                snx_, sny_ = nx // 2, ny // 2
                cell = ((iz >> 1) * sny_ + (iy >> 1)) * snx_ + (ix >> 1)
                lb = np.where(m, (ix & 1) + 2 * (iy & 1) + 4 * (iz & 1),
                              0).astype(np.int32)
            else:
                cell = (iz * ny + iy) * nx + ix  # FULL-pitch packed row

            # -> (tile, chunk, block row, lane) sample layout
            def to_lanes(a):
                # (T, 256, K) -> (T, nc, 16, 128): ray r = row*16+rl
                a = a.reshape(t_cnt, 16, 16, nc, CHUNK)  # (T,row,rl,c,j)
                a = a.transpose(0, 3, 1, 2, 4)           # (T,c,row,rl,j)
                return a.reshape(t_cnt, nc, 16, 128)

            cell_l = to_lanes(np.where(m, cell, _SENTINEL))
            m_l = to_lanes(m.astype(np.float32))
            st_l = to_lanes(np.broadcast_to(
                sample_t, (t_cnt, RAYS_PER_TILE, k_steps)))
            flat = cell_l.reshape(t_cnt * nc * n_sub, sub_cols)
            (lidx, lanes_run, ucell, ulane, n_u, upair,
             n_p) = _pack_runs_numpy(flat, pitch, umax, pmax)
            if cell_scale == 2:
                lidx = lidx | (to_lanes(lb).reshape(
                    t_cnt * nc * n_sub, sub_cols).astype(np.int32) << 16)

        if cell_scale == 2:
            # split the packed lidx: low 16 bits = lane, bits 16.. = the
            # sample's cell-within-supercell (lx | ly<<1 | lz<<2)
            lb_l = (lidx >> 16).astype(np.int32)
            lidx = (lidx & 0xFFFF).astype(np.int32)

        # Compact ray planes: (T, 12, 128), row = ax*2 + half for axes
        # (ox, oy, oz, dx, dy, dz), lane = ray % 128 (the kernel expands
        # to sample layout with two lane shuffles per axis).
        rayt_all = np.stack(
            [ot[:, :, i].reshape(t_cnt, 2, 128) for i in range(3)]
            + [dtn[:, :, i].reshape(t_cnt, 2, 128) for i in range(3)],
            axis=1).astype(np.float32).reshape(t_cnt, 12, 128)


        # Dense bank packing: each (chunk, sub-tile) run of nuniq cells
        # lands at the next free lane offset; runs of <= 128 cells span
        # at most two consecutive banks from any offset, larger runs
        # (<= 256) align to a bank boundary. SUB-tiles with a chunk
        # beyond 256 cells fall back to the windowed path (their block
        # rows are masked dead); blocks whose sub-tiles ALL overflow are
        # dropped entirely.
        lanes3 = lanes_run.reshape(t_cnt, nc, n_sub)
        sub_bad = (lanes3 > 2 * MAX_CELLS).any(axis=1)  # (T, n_sub)
        overflow = sub_bad.all(axis=1)
        if sub_bad.any():
            live_rs = live_r.reshape(t_cnt, n_sub, -1)
            ids_rs = ids.reshape(t_cnt, n_sub, -1)
            fb = ids_rs[sub_bad][live_rs[sub_bad]]
            if fb.size:
                fallback_rays.append(fb)
            # dead sub-tiles: no runs, no live samples, and NO hostmap
            # writes - without zeroing their unique counts their cells
            # would still fill hostmap lanes at their zeroed offset,
            # clobbering the live runs anchored at lane 0.
            lanes3 = np.where(sub_bad[:, None, :], 0, lanes3)
            m_l = (m_l.reshape(t_cnt, nc, n_sub, sub_cols)
                   * ~sub_bad[:, None, :, None]).reshape(
                t_cnt, nc, 16, 128)
            row_bad = np.broadcast_to(
                sub_bad[:, None, :], (t_cnt, nc, n_sub)).reshape(-1)
            n_u = np.where(row_bad, 0, n_u)
            n_p = np.where(row_bad, 0, n_p)

        # Lane-offset recurrence, vectorized across TILES: the bank
        # round-up before >128-lane runs makes ``cur`` a data-dependent
        # scan, so iterate the (small, <= nc*n_sub) RUN axis in Python
        # and keep every tile in numpy vectors (the per-(tile,run) scalar
        # loop was ~260k interpreted iterations at 512^2/4px).
        # ``bank_aligned=True`` additionally rounds ANY run that would
        # straddle a bank boundary up to the next bank, so every run
        # <= 128 cells lives in one bank (the backward's scatter then
        # contracts a 128-slot one-hot instead of the 256-slot two-bank
        # window - the ALIGNED bit below; measured 1.18x lane inflation
        # at 512^2/64^3 for ~6 ms off the 40 ms train step).
        lanes_f = lanes3.reshape(t_cnt, nc * n_sub).astype(np.int64)
        offs_f = np.zeros((t_cnt, nc * n_sub), np.int64)
        cur = np.zeros(t_cnt, np.int64)
        for r in range(nc * n_sub):
            n_c = lanes_f[:, r]
            if bank_aligned:
                align = (n_c > 0) & (cur % MAX_CELLS + n_c > MAX_CELLS)
            else:
                align = n_c > MAX_CELLS
            cur = np.where(align, -(-cur // MAX_CELLS) * MAX_CELLS, cur)
            # Empty runs anchor at lane 0: their samples are all masked
            # (weight 0) but must still index a VALID lane - ``cur`` can
            # equal the block's total lane count here, one past the bank
            # space (OOB bank read in the kernel, NaN fill in the jnp
            # consumer).
            offs_f[:, r] = np.where(n_c > 0, cur, 0)
            cur += n_c
        off = np.where(overflow[:, None, None], 0,
                       offs_f.reshape(t_cnt, nc, n_sub))
        nb_tile = np.where(overflow, 0,
                           np.maximum(-(-cur // MAX_CELLS), 1))
        if cell_scale == 2:
            # the supercell packed word has 12 lane bits -> <= 31 banks;
            # wider tiles demote to the windowed fallback whole
            too_wide = (~overflow) & (nb_tile > 31)
            if too_wide.any():
                fb2 = ids[too_wide][live_r[too_wide]]
                if fb2.size:
                    fallback_rays.append(fb2)
                overflow = overflow | too_wide
                nb_tile = np.where(too_wide, 0, nb_tile)
        if quantize == "uniform" or uniform_shape is not None:
            if (~overflow).any():
                nb_u = int(nb_tile[~overflow].max())
                if uniform_shape is not None:
                    check(uniform_shape[1] >= nb_u,
                          "uniform_shape nb below this schedule's "
                          "maximum")
                    nb_u = int(uniform_shape[1])
                nb_tile = np.where(~overflow, nb_u, 0)
        elif quantize:
            nb_cap = 31 if cell_scale == 2 else None
            qmap = {int(v): _quant_up(int(v), nb_cap)
                    for v in np.unique(nb_tile[~overflow])}
            nb_tile = np.where(
                overflow, 0,
                np.vectorize(lambda v: qmap.get(int(v), 0),
                             otypes=[np.int64])(nb_tile))

        for nb in sorted(set(nb_tile[~overflow].tolist())):
            keep = (~overflow) & (nb_tile == nb)
            if not keep.any():
                continue
            nb = int(nb)
            lanes = nb * MAX_CELLS
            t_kept = int(keep.sum())
            rowsel = np.repeat(keep, nc * n_sub)
            off_k = off[keep].reshape(-1)        # (t_kept*nc*n_sub,)

            # Dead lanes (bank-space rounding, pad tiles, empty-run
            # anchors) carry -1: the device gathers clamp them to row 0
            # (take mode="clip", same bytes as before), but the backward's
            # gather plan EXCLUDES them - at the 512^2/64^3 headline they
            # were 19% of all slot rows, all funneled into one
            # pathological 123k-row count class for cell 0.
            hostmap = np.full((t_kept, lanes), -1, np.int64)
            n_u_k = n_u[rowsel]
            ucell_k, ulane_k = ucell[rowsel], ulane[rowsel]
            rws, cls = np.nonzero(
                np.arange(ucell.shape[1])[None, :] < n_u_k[:, None])
            hostmap[rws // (nc * n_sub),
                    off_k[rws] + ulane_k[rws, cls]] = ucell_k[rws, cls]
            if pitch == 2:
                # Forward gather map: one packed-row PAIR per slot pair.
                # Untouched partner lanes stay -1 in ``hostmap`` (the
                # backward's gather plan excludes them) but the pair slot
                # still names the pair - the gather fetches both rows in
                # one start. The j-th compact pair's rank IS j.
                gmap = np.full((t_kept, lanes // 2), -1, np.int64)
                n_p_k = n_p[rowsel]
                upair_k = upair[rowsel]
                prs, pcl = np.nonzero(
                    np.arange(upair.shape[1])[None, :] < n_p_k[:, None])
                gmap[prs // (nc * n_sub),
                     off_k[prs] // 2 + pcl] = upair_k[prs, pcl]
            else:
                gmap = None                       # aliases hostmap below

            # Block-local lane ids; masked samples point at their run's
            # window start (any in-window lane works: their weight is 0).
            rank_s = lidx.reshape(t_cnt, nc, n_sub, sub_cols)[keep].astype(
                np.int64)
            m_k4 = m_l.reshape(t_cnt, nc, n_sub, sub_cols)[keep] > 0
            off_bc = off[keep][:, :, :, None]
            nuq_bc = lanes3[keep][:, :, :, None]
            lidx_local = np.where(m_k4, off_bc + np.minimum(
                rank_s, np.maximum(nuq_bc - 1, 0)),
                off_bc).astype(np.int32).reshape(t_kept, nc, 16, 128)
            m_k = m_k4.reshape(t_kept, nc, 16, 128)

            # Slim schedule, 6 bytes/sample in ONE u16 array: planes
            # [sample_t hi16, sample_t lo16, lane | mask << 15]. The
            # kernel reassembles sample_t's exact f32 bits ((hi << 16) |
            # lo, bitcast) and recomputes fractions from it + the
            # per-lane cell bases + the compact ray planes (fused_tiles
            # is bandwidth-bound; f32 planes cost 8 B/sample, shipped
            # fractions 2.5x more). Only bit ops and DMA may touch this
            # array - it is integer data, not numbers. Supercell
            # schedules additionally pack the sample's cell-within-
            # supercell bits at 12..14 (lane then has 12 bits -> <= 31
            # banks per tile).
            if cell_scale == 2:
                check(nb <= 31,
                      "supercell bank space exceeds the 12-bit lane id")
                lb_k = lb_l.reshape(t_cnt, nc, n_sub, sub_cols)[
                    keep].reshape(t_kept, nc, 16, 128)
                packed_bits = (lidx_local | (lb_k << 12)
                               | (m_k.astype(np.int32) << 15))
            else:
                check(nb <= 255, "bank space exceeds the 15-bit lane id")
                packed_bits = (lidx_local
                               | (m_k.astype(np.int32) << 15))
            st_bits = np.ascontiguousarray(st_l[keep]).view(np.uint32)
            samp = np.stack(
                [(st_bits >> 16).astype(np.uint16),
                 (st_bits & np.uint32(0xFFFF)).astype(np.uint16),
                 packed_bits.astype(np.uint16)],
                axis=2)                     # (T, nc, 3, 16, 128) u16

            # Per-lane cell base coordinates (the host's clipped floor
            # indices, exactly - recovered from the lane's cell id; dead
            # -1 lanes clamp to cell 0 like the device gather does).
            # Supercell lanes store the VERTEX ORIGIN (2*s per axis);
            # the kernel adds the sample's l bits to recover its cell
            # base exactly.
            hm_c = np.maximum(hostmap, 0)
            if cell_scale == 2:
                snx_, sny_ = nx // 2, ny // 2
                iz_u = hm_c // (sny_ * snx_)
                rem_u = hm_c % (sny_ * snx_)
                base = np.stack(
                    [2 * (rem_u % snx_), 2 * (rem_u // snx_), 2 * iz_u],
                    axis=1).astype(np.float32)        # (T, 3, lanes)
            else:
                iz_u = hm_c // (ny * nx)
                rem_u = hm_c % (ny * nx)
                base = np.stack(
                    [(rem_u % nx), (rem_u // nx), iz_u],
                    axis=1).astype(np.float32)        # (T, 3, lanes)
            base = base.reshape(t_kept, 3, nb, MAX_CELLS).transpose(
                0, 2, 1, 3)                           # (T, nb, 3, 128)
            rayt = rayt_all[keep]
            # bank0 scalars carry the window start bank PLUS an ALIGNED
            # bit (30): set when the run provably fits bank b0 alone
            # (off%128 + n <= 128) - the backward kernel then takes the
            # single-bank scatter path (ops/fused_tiles.py::_Windows).
            # Opportunistic: set whenever a run happens not to straddle,
            # even without bank_aligned packing.
            n_keep = lanes3[keep]
            fits = (n_keep > 0) & (off[keep] % MAX_CELLS + n_keep
                                   <= MAX_CELLS)
            bank0 = ((off[keep] // MAX_CELLS)
                     | (fits.astype(np.int64) << 30)).astype(np.int32)
            #        (T, nc, n_sub) -> the kernel's flat (t*nc + c)*subs + s

            ids_k = ids[keep]
            ray_ids_k = np.maximum(ids_k, 0).astype(np.int32)
            live_k = live_r[keep]
            lx = np.where(ids_k >= 0, ids_k % roi.width, 0)
            ly = np.where(ids_k >= 0, ids_k // roi.width, 0)
            pids = (roi.y + ly) * plan.width + (roi.x + lx)
            n_bad = int((~live_k).sum())
            pids = np.where(
                live_k,
                pids,
                pad_pid_base + np.cumsum(~live_k.reshape(-1)).reshape(
                    live_k.shape) - 1)
            pad_pid_base += n_bad

            # Pad the group to a multiple of 8 tiles so the kernel can
            # block several tiles per grid step. Pad tiles are fully dead:
            # m == 0 everywhere, lane 0, packed row 0, throwaway pixels.
            t_pad = -(-t_kept // 8) * 8
            if sparse:
                # two-level indirection resolved HERE: lanes name brick
                # rows; the cell-coordinate ``base`` above already baked
                # the geometric cell ids.
                uniq_r = np.where(
                    hostmap >= 0,
                    _sparse_rows_for_cells(hm_c, occ_host,
                                           (nz, ny, nx)).astype(np.int64),
                    np.int64(-1)).astype(np.int32)
            else:
                uniq_r = hostmap.astype(np.int32)     # (T, lanes), -1 dead
            if gmap is not None and sparse:
                # pair id in BRICK-row space: rows are x-minor within a
                # brick (BRICK even), so the even geometric cell of a pair
                # maps to an even brick row and its partner to row+1.
                # Requires even nx (enforced above: odd-nx sparse grids
                # demote to pitch 1 - flat-id pairs then wrap x rows and
                # the partner is NOT at brick row+1); guard the premise.
                even_rows = _sparse_rows_for_cells(
                    np.maximum(gmap, 0) * 2, occ_host,
                    (nz, ny, nx)).astype(np.int64)
                assert (even_rows[gmap >= 0] % 2 == 0).all(), \
                    "sparse pair premise violated (even cell at odd row)"
                gmap = np.where(gmap >= 0, even_rows >> 1, np.int64(-1))
            ke_k = ke_t[keep].astype(np.int32)
            # compose targets: global sub-tile ids; overflowed/ROI-dead
            # sub-tiles -> drop sentinel
            tile_ids_k = np.where(
                sub_bad[keep] | (sub_tile_ids[sel][keep] < 0),
                np.int32(1 << 30),
                sub_tile_ids[sel][keep]).astype(np.int32)  # (T, n_sub)
            pids = pids.reshape(t_kept, RAYS_PER_TILE)
            if t_pad != t_kept:
                extra = t_pad - t_kept
                samp = np.concatenate(
                    [samp, np.zeros((extra,) + samp.shape[1:],
                                    samp.dtype)])
                base = np.concatenate(
                    [base, np.zeros((extra,) + base.shape[1:],
                                    np.float32)])
                rayt = np.concatenate(
                    [rayt, np.zeros((extra,) + rayt.shape[1:],
                                    np.float32)])
                uniq_r = np.concatenate(
                    [uniq_r, np.full((extra, lanes), -1, np.int32)])
                if gmap is not None:
                    gmap = np.concatenate(
                        [gmap, np.full((extra, lanes // 2), -1,
                                       gmap.dtype)])
                bank0 = np.concatenate(
                    [bank0, np.zeros((extra, nc, n_sub), np.int32)])
                ray_ids_k = np.concatenate(
                    [ray_ids_k,
                     np.zeros((extra, RAYS_PER_TILE), np.int32)])
                ke_k = np.concatenate([ke_k, np.zeros(extra, np.int32)])
                tile_ids_k = np.concatenate(
                    [tile_ids_k,
                     np.full((extra, n_sub), 1 << 30, np.int32)])  # dropped
                pad_ids = (pad_pid_base + np.arange(
                    extra * RAYS_PER_TILE)).reshape(extra, RAYS_PER_TILE)
                pad_pid_base += extra * RAYS_PER_TILE
                pids = np.concatenate([pids, pad_ids.astype(pids.dtype)])

            tiled_samples += int(m_l[keep].sum())
            host_rows.append(uniq_r.reshape(-1))
            hm_dev = put(uniq_r.reshape(-1))
            if gmap is None:
                gm_flat, gm_dev = uniq_r.reshape(-1), hm_dev
            else:
                gm_flat = gmap.astype(np.int32).reshape(-1)
                gm_dev = put(gm_flat)
            gmap_rows.append(gm_flat)
            groups.append(TileGroup(
                n_chunks=nc,
                n_tiles=t_pad,
                banks=nb,
                hostmap=hm_dev,
                gathermap=gm_dev,
                samp=put(samp),
                base=put(base),
                rayt=put(rayt),
                bank0=put(bank0),
                ray_ids=put(ray_ids_k),
                k_enter=put(ke_k),
                pixel_ids=put(pids.reshape(-1).astype(np.int32)),
                tile_ids=put(tile_ids_k),
                samples=int(m_l[keep].sum()),
            ))

    fb = None
    fb_count = 0
    if fallback_rays:
        fb_ids = np.concatenate(fallback_rays)
        fb_count = int(fb_ids.size)
        # build_fallback=False: cascade PROBES only need the overflow
        # COUNT to rank configurations - the discarded probes' windowed
        # fallback schedules (with their device uploads) were ~1/3 of
        # the fit flagship's schedule-build time. A schedule built this
        # way with fb_count > 0 must not be rendered (fallback=None
        # would silently drop its overflow rays); the auto cascade
        # rebuilds the chosen config with the fallback when needed.
        if build_fallback:
            fb = windowed_mod.build_schedule(
                plan, bbox_min, bbox_max, jitter=jitter, ray_subset=fb_ids,
                device=False)  # uploaded with the schedule tree below

    hostmap_all = (np.concatenate(host_rows) if host_rows
                   else np.zeros(0, np.int32))
    gathermap_all = (np.concatenate(gmap_rows) if gmap_rows
                     else np.zeros(0, np.int32))
    if sparse:
        from dvren_tpu.fields.sparse_grid import BRICK as _BRICK
        n_rows = int(field.bricks.shape[0]) * _BRICK ** 3
    elif cell_scale == 2:
        n_rows = grid_ops.supercell_rows((nz, ny, nx))
    else:
        n_rows = grid_ops.fullpitch_rows((nz, ny, nx))
    sched = TiledSchedule(
        groups=tuple(groups),
        fallback=fb,
        hostmap_all=put(hostmap_all),
        gathermap_all=put(gathermap_all),
        gather_plan=_build_gather_plan(hostmap_all, n_rows, put=put),
        total_rays=n,
        tiled_samples=tiled_samples,
        full_lattice_samples=full_samples,
        fallback_rays=fb_count,
        grid_shape=(nz, ny, nx),
        bbox=(bbox_min, bbox_max),
        tile_px=tile_px,
        table_kind="sparse" if sparse else "dense",
        pitch=pitch,
        cell_scale=cell_scale,
    )
    return device_put_tree(sched) if device else sched


def _build_gather_plan(hostmap_all: np.ndarray, n_cells: int,
                       put=jax.device_put) -> tuple:
    """Transpose-gather plan for the backward's d(table) accumulation,
    with NO scatter anywhere (XLA:TPU scatters run at ~20-45M rows/s on
    this chip - even a unique-row set-scatter of the active cells costs
    ~11 ms; gathers run ~10x faster).

    The S slot rows are sorted by target packed row (cell) and bucketed
    into exact-count classes; ``all_idx`` concatenates every class's
    (n_k, c_k) index block so the backward issues ONE cotangent gather,
    reduces each cell's rows, and assembles the FULL (n_cells, 32) table
    gradient by an inverse-permutation gather (``inv_map``; inactive
    cells point at a trailing zero row).

    Returns a :class:`GatherPlan` or None when the schedule is empty."""
    s_total = int(hostmap_all.size)
    if s_total == 0:
        return None
    # Dead lanes are marked -1 (pad tiles, bank-space rounding, empty-run
    # anchors): their cotangents are exact zeros, so they are EXCLUDED
    # from the transpose (19% of all slot rows at the headline config,
    # previously one pathological 123k-row class on cell 0).
    valid = np.nonzero(hostmap_all >= 0)[0].astype(np.int64)
    if valid.size == 0:
        return None
    order = valid[np.argsort(hostmap_all[valid], kind="stable")]
    sorted_cells = hostmap_all[order]
    cells, first, counts = np.unique(
        sorted_cells, return_index=True, return_counts=True)
    idx_parts, meta, cell_order = [], [], []
    off = 0
    for v in np.unique(counts):  # exact count classes: zero padding waste
        member = counts == v
        n_k, c_k = int(member.sum()), int(v)
        col = np.arange(c_k, dtype=np.int64)[None, :]
        idx_parts.append(
            order[first[member][:, None] + col].astype(np.int32).reshape(-1))
        cell_order.append(cells[member])
        meta.append((off, n_k, c_k))
        off += n_k * c_k
    cell_order = np.concatenate(cell_order)
    inv_map = np.full(n_cells, cell_order.size, np.int32)  # dummy zero row
    inv_map[cell_order] = np.arange(cell_order.size, dtype=np.int32)
    return GatherPlan(
        all_idx=put(np.concatenate(idx_parts)),
        inv_map=put(inv_map),
        meta=tuple(meta))


# ----------------------------------------------------------------- consume

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_bank_tables(table, gathermap_all, plan, static):
    """Bit-exact u16 row gather of ALL groups' bank lanes straight into
    the kernel's bank-block layout, split per group ((T, NB, 32, 128)
    tuple), with a gather-transpose backward (:func:`_build_gather_plan`).

    ``static`` = (pitch, group_shapes). At pitch 2 ``gathermap_all`` has
    one entry per slot PAIR naming a packed-row pair: each start fetches
    a 128-element u16 row covering two consecutive cells (row gathers
    are start-paced and width-flat to 128 elements - half the starts of
    the per-lane gather). The backward is identical for both pitches: it
    rides the per-LANE gather plan, and untouched partner lanes carry
    exact-zero cotangents and are excluded from it.

    Three deliberate layout choices (all measured on the tunnel chip):
    - the lane->column transpose happens in the u16 DOMAIN and the hi|lo
      recombine after it, so every large intermediate is 128-lane dense -
      recombining first materializes padded (S, 32)-minor f32 arrays
      (XLA pads minors < 128 to full lane tiles, 4x the bytes);
    - the per-group SPLIT lives inside this custom_vjp: under plain AD
      each group's slice cotangent becomes a full-size pad-and-add (one
      per group - ~1 GB/step of adds at the headline config); here the
      backward just concatenates the per-group cotangents;
    - the backward re-gathers cotangents per target cell and assembles
      the full table by an inverse-permutation gather: the direct
      ``zeros.at[hostmap].add(ct)`` runs at XLA scatter-ADD speed (~30M
      rows/s), ~10x slower than this gather-transpose.

    ``group_shapes``: static tuple of (n_tiles, banks) per group."""
    t16 = grid_ops._split_u16(table)                  # (rows, 64) u16
    return _t16_to_banks(t16, gathermap_all, static)


def _t16_to_banks(t16, gathermap_all, static):
    """(rows, 64) u16 split table -> per-group bank blocks
    ((T, NB, 32, 128) f32 tuple): the gather+assembly shared by
    :func:`_gather_bank_tables` (f32 table in) and
    :func:`bank_tables_from_params` (u16 table straight from the fused
    build - the lane-padded f32 table never exists)."""
    pitch, group_shapes = static
    if pitch == 2:
        # (rows//2, 128): row j = cells 2j | 2j+1, each [hi(32) lo(32)].
        # Table row counts are even by construction (fullpitch_rows is a
        # multiple of 2048; brick tables are n_bricks * 512).
        r16 = jnp.take(t16.reshape(-1, 2 * 64), gathermap_all, axis=0,
                       mode="clip")                   # (S/2, 128) u16
        # bank assembly: gathered row p covers lanes 2p (cols 0:64) and
        # 2p+1 (cols 64:128) -> (B, ch, pairpos, e) -> (B, 64, 128).
        # NOTE: this transpose has a minor dim of 2 (sub-128-lane
        # relayout); if TPU profiling shows it eating the halved gather
        # starts, switch the pair lane assignment to
        # lane = pairrank + 64*(cell&1) (host pack + here), which makes
        # the interleave a 64-lane-minor transpose instead.
        g4 = r16.reshape(-1, MAX_CELLS // 2, 2, 64)
        g3 = g4.transpose(0, 3, 1, 2).reshape(-1, 64, MAX_CELLS)
    else:
        r16 = jnp.take(t16, gathermap_all, axis=0,
                       mode="clip")                   # (S, 64) u16
        g3 = jnp.swapaxes(r16.reshape(-1, MAX_CELLS, 64), 1, 2)
    hi = g3[:, :32].astype(jnp.uint32) << 16          # (B, 32, 128)
    lo = g3[:, 32:].astype(jnp.uint32)
    banks_all = jax.lax.bitcast_convert_type(hi | lo, jnp.float32)
    out, off = [], 0
    for t_cnt, nb in group_shapes:
        out.append(banks_all[off:off + t_cnt * nb].reshape(
            t_cnt, nb, 32, MAX_CELLS))
        off += t_cnt * nb
    return tuple(out)


def _gather_bank_tables_fwd(table, gathermap_all, plan, static):
    return (_gather_bank_tables(table, gathermap_all, plan, static),
            (plan, table.shape))


def _gather_bank_tables_bwd(static, res, cts):
    plan, tshape = res
    ct16 = _cts_to_ct16(cts)
    return (ct16_rows_to_table(ct16, plan.all_idx, plan.meta,
                               plan.inv_map, tshape[1]),
            None, None)


def ct16_rows_to_table(ct16, all_idx, meta, inv_map, w):
    """Per-slot u16 cotangent rows -> full (n_cells, w) f32 table
    gradient via the planned gather-transpose: ONE cotangent gather,
    per-class f32 reductions, inverse-permutation assembly (zero row for
    inactive cells). Shared by the single-chip backward above and the
    mesh-sharded backward (parallel/shard.py::_gather_rows_planned_bwd).

    ``all_idx`` MAY contain pad entries equal to ct16.shape[0]: a zero
    row is appended so pads contribute exact zeros (the sharded plans'
    union-padded classes use this; single-chip plans have no pads and
    the appended row is never referenced)."""
    return grid_ops._u16_rows_to_f32(
        ct16_rows_to_table16(ct16, all_idx, meta, inv_map, w), w)


_gather_bank_tables.defvjp(_gather_bank_tables_fwd,
                           _gather_bank_tables_bwd)


def _cts_to_ct16(cts):
    """Per-group bank cotangents -> (S, 64) u16 slot rows (the
    BWD_SPLIT-selected relayout shared by both table backwards)."""
    blocks = [c.reshape(-1, 32, MAX_CELLS) for c in cts]
    if (BWD_SPLIT == "pallas"
            and all(b.shape[0] % 8 == 0 for b in blocks)):
        from dvren_tpu.ops import packed_transpose
        return jnp.concatenate(
            [packed_transpose.banks_to_u16_rows(b) for b in blocks])
    ct = jnp.concatenate(blocks)                      # (B, 32, 128)
    bits = jax.lax.bitcast_convert_type(ct, jnp.uint32)
    ct16 = jnp.concatenate(
        [(bits >> 16).astype(jnp.uint16),
         (bits & jnp.uint32(0xFFFF)).astype(jnp.uint16)], axis=1)
    return jnp.swapaxes(ct16, 1, 2).reshape(-1, 64)   # (S, 64) u16


def ct16_rows_to_table16(ct16, all_idx, meta, inv_map, w):
    """:func:`ct16_rows_to_table` stopping at the u16 split rows: the
    planned gather-transpose's class reductions and inverse-permutation
    assembly, WITHOUT the final hi|lo recombine - returns the full table
    gradient as (n_cells, 2w) u16 rows, bit-exactly _split_u16 of the
    f32 result. Consumers that can read the split form directly (the
    params->banks backward's u16_rows_to_stack kernel) skip the
    lane-padded (n_cells, w) f32 materialization (4x bytes)."""
    ct16 = jnp.concatenate(
        [ct16, jnp.zeros((1, ct16.shape[1]), jnp.uint16)])
    g16 = jnp.take(ct16, all_idx, axis=0, mode="clip")
    parts16 = []
    for off, n_k, c_k in meta:
        if c_k == 1:
            # Singleton classes need no reduction: the slot row IS the
            # cell gradient, and _split_u16(_u16_rows_to_f32(x)) == x
            # exactly, so the f32 roundtrip (and its 4x-lane-padded
            # HBM pass) is skipped - ~31% of scheduled cells at the
            # headline config sit in this class.
            parts16.append(g16[off:off + n_k])
            continue
        vals = grid_ops._u16_rows_to_f32(
            g16[off:off + n_k * c_k], w).reshape(n_k, c_k, w).sum(axis=1)
        parts16.append(grid_ops._split_u16(vals))
    parts16.append(jnp.zeros((1, ct16.shape[1]), jnp.uint16))
    v16 = jnp.concatenate(parts16)
    return jnp.take(v16, inv_map, axis=0, mode="clip")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_banks_f32(table, gathermap_all, plan, static):
    """Planned bank-table gather for ARBITRARY row width (the supercell
    route: (R_s, 108) tables; the 32-col cell route keeps the u16-domain
    :func:`_gather_bank_tables`). Forward gathers through the bit-exact
    u16 split (2-byte row gathers, ops/grid.py::take_rows_exact
    rationale) and transposes in f32 - at w = 108 the lane padding is
    only 128/108, so the u16-domain transpose buys little. Backward is
    the same planned gather-transpose class reduction, in f32.

    ``static`` = (w, group_shapes)."""
    w, group_shapes = static
    rows = grid_ops.take_rows_exact(table, gathermap_all)  # (S, w)
    banks_all = jnp.swapaxes(rows.reshape(-1, MAX_CELLS, w), 1, 2)
    out, off = [], 0
    for t_cnt, nb in group_shapes:
        out.append(banks_all[off:off + t_cnt * nb].reshape(
            t_cnt, nb, w, MAX_CELLS))
        off += t_cnt * nb
    return tuple(out)


def _gather_banks_f32_fwd(table, gathermap_all, plan, static):
    return (_gather_banks_f32(table, gathermap_all, plan, static),
            (plan, table.shape))


def _gather_banks_f32_bwd(static, res, cts):
    plan, tshape = res
    w, _ = static
    ct = jnp.concatenate([c.reshape(-1, w, MAX_CELLS) for c in cts])
    rows = jnp.swapaxes(ct, 1, 2).reshape(-1, w)       # (S, w) f32
    rows = jnp.concatenate([rows, jnp.zeros((1, w), rows.dtype)])
    g = jnp.take(rows, plan.all_idx, axis=0, mode="clip")
    parts = []
    for off, n_k, c_k in plan.meta:
        if c_k == 1:
            parts.append(g[off:off + n_k])
        else:
            parts.append(g[off:off + n_k * c_k].reshape(
                n_k, c_k, w).sum(axis=1))
    parts.append(jnp.zeros((1, w), rows.dtype))
    v = jnp.concatenate(parts)
    return (jnp.take(v, plan.inv_map, axis=0, mode="clip"),
            None, None)


_gather_banks_f32.defvjp(_gather_banks_f32_fwd, _gather_banks_f32_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bank_tables_from_params(sigma, color, gathermap_all, plan, static):
    """Dense-grid params -> per-group kernel bank tables in ONE
    differentiable op, with every intermediate held in u16 split-row
    form (minor dim 64, 2x lane padding) instead of the (R, 32) f32
    table (minor dim 32, 4x padding):

    forward: fused shift-stack -> u16-rows Pallas build
    (ops/grid.py::build_packed_table16) then the planned bank gather
    (:func:`_t16_to_banks`) - the f32 table of the two-op chain
    (build_packed_stencil_fullpitch + _gather_bank_tables) never touches
    HBM. backward: bank cotangents -> u16 slot-row relayout -> planned
    class reductions -> u16 table-gradient assembly
    (:func:`ct16_rows_to_table16`) -> fused recombine+transpose kernel
    (ops/packed_transpose.py::u16_rows_to_stack) -> the 32 shifted
    plane adds (ops/grid.py::stack_plane_grads). Both directions are
    bit-identical to the two-op chain (pure integer plumbing over the
    same f32 values; tests/test_tiled.py).

    u16 hops never cross an AD boundary (uint cotangents are float0),
    which is why this must be one custom_vjp and not a composition."""
    t16 = grid_ops.build_packed_table16(sigma, color)
    return _t16_to_banks(t16, gathermap_all, static)


def _bank_tables_from_params_fwd(sigma, color, gathermap_all, plan,
                                 static):
    return (bank_tables_from_params(sigma, color, gathermap_all, plan,
                                    static),
            (plan, sigma.shape))


def _bank_tables_from_params_bwd(static, res, cts):
    from dvren_tpu.ops import packed_transpose

    plan, sigma_shape = res
    ct16 = _cts_to_ct16(cts)
    d16 = ct16_rows_to_table16(ct16, plan.all_idx, plan.meta,
                               plan.inv_map, 32)
    t = packed_transpose.u16_rows_to_stack(d16)       # (32, R) f32
    d_sigma, d_color = grid_ops.stack_plane_grads(t, sigma_shape)
    return d_sigma, d_color, None, None


bank_tables_from_params.defvjp(_bank_tables_from_params_fwd,
                               _bank_tables_from_params_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _groupset_from_params(static, sigma, color, gathermap_all, gplan,
                          samps, bases, kes, bank0s, rayts):
    """Dense-grid params -> ALL tile groups' raw kernel outputs in ONE
    custom VJP (the merged route: build + bank gather + every group's
    fused kernel).

    Why one op: spanning from (sigma, color) frees the backward from
    matching the bank blocks' f32 aval, so the backward kernel emits its
    table cotangent DIRECTLY as u16 slot rows (ops/fused_tiles.py,
    emit="rows16" - the banks_to_u16_rows transform applied to the VMEM
    accumulator before the HBM write). The separate bank->row relayout
    pass of the two-op chain - an extra 168 MB/step HBM round trip,
    the single largest backward phase at the 512^2/64^3 headline config
    (tools/bwdsplit_probe.py) - disappears. Forward and backward values
    are bit-identical to the two-op chain (pure integer plumbing over
    the same f32 gradients; tests/test_tiled.py).

    ``static`` = (pitch, group_shapes, kparams, cam) with ``kparams``
    the per-group :func:`~dvren_tpu.ops.fused_tiles.tile_op_params`
    tuples. Differentiable in (sigma, color) and - when ``cam`` - in
    each group's ``rayts`` (the camera-gradient chain)."""
    from dvren_tpu.ops import fused_tiles

    pitch, group_shapes, kparams, cam = static
    t16 = grid_ops.build_packed_table16(sigma, color)
    tabs = _t16_to_banks(t16, gathermap_all, (pitch, group_shapes))
    return tuple(
        fused_tiles._tile_op(*kp).fwd_call(
            tabs[gi], samps[gi], bases[gi], rayts[gi], kes[gi],
            bank0s[gi])
        for gi, kp in enumerate(kparams))


def _groupset_from_params_fwd(static, sigma, color, gathermap_all, gplan,
                              samps, bases, kes, bank0s, rayts):
    from dvren_tpu.ops import fused_tiles

    pitch, group_shapes, kparams, cam = static
    t16 = grid_ops.build_packed_table16(sigma, color)
    tabs = _t16_to_banks(t16, gathermap_all, (pitch, group_shapes))
    raws = tuple(
        fused_tiles._tile_op(*kp).fwd_call(
            tabs[gi], samps[gi], bases[gi], rayts[gi], kes[gi],
            bank0s[gi])
        for gi, kp in enumerate(kparams))
    return raws, (tabs, samps, bases, kes, bank0s, rayts, gplan,
                  sigma.shape)


def _groupset_from_params_bwd(static, res, cts):
    from dvren_tpu.ops import fused_tiles, packed_transpose

    pitch, group_shapes, kparams, cam = static
    tabs, samps, bases, kes, bank0s, rayts, gplan, sigma_shape = res
    ct16_parts, d_rayts = [], []
    for gi, kp in enumerate(kparams):
        out = fused_tiles._tile_op(*kp).bwd_call(
            tabs[gi], samps[gi], bases[gi], rayts[gi], kes[gi],
            bank0s[gi], cts[gi], emit="rows16")
        if cam:
            rows16, dcam = out
            t_cnt = dcam.shape[0]
            d_rayts.append(dcam.reshape(t_cnt, 6, 2, 128).reshape(
                t_cnt, 12, 128))
        else:
            rows16 = out
            d_rayts.append(None)
        ct16_parts.append(rows16.reshape(-1, 64))
    ct16 = jnp.concatenate(ct16_parts)
    d16 = ct16_rows_to_table16(ct16, gplan.all_idx, gplan.meta,
                               gplan.inv_map, 32)
    t = packed_transpose.u16_rows_to_stack(d16)       # (32, R) f32
    d_sigma, d_color = grid_ops.stack_plane_grads(t, sigma_shape)
    return (d_sigma, d_color, None, None, None, None, None, None,
            tuple(d_rayts) if cam else None)


_groupset_from_params.defvjp(_groupset_from_params_fwd,
                             _groupset_from_params_bwd)


def _dense_f32_route(field, sched) -> bool:
    """True when the schedule's planned bank gather can run the fused
    params->banks route (dense f32 grid; sparse bricks, bf16/f16 tables
    and supercell schedules keep the flat-table chain)."""
    return (sched.table_kind == "dense"
            and sched.cell_scale == 1
            and getattr(field, "packed_dtype", "float32") == "float32"
            and sched.gather_plan is not None
            and bool(sched.hostmap_all.size))


def _planned_bank_tables(field, sched, packed_flat):
    """The all-group planned bank-table gather: the fused params route
    for dense f32 fields, the flat-table gather otherwise, or None when
    the schedule has no gather plan (callers fall back to per-group
    row gathers)."""
    static = (sched.pitch,
              tuple((g.n_tiles, g.banks) for g in sched.groups))
    if _dense_f32_route(field, sched):
        check(tuple(int(v) for v in np.asarray(field.sigma.shape[:3]))
              == tuple(sched.grid_shape),
              "schedule was built for a different grid resolution")
        return bank_tables_from_params(
            field.sigma, field.color, sched.gathermap_all,
            sched.gather_plan, static)
    if (packed_flat is not None and packed_flat.dtype == jnp.float32
            and sched.gather_plan is not None and sched.hostmap_all.size):
        if sched.cell_scale == 2:
            return _gather_banks_f32(
                packed_flat, sched.gathermap_all, sched.gather_plan,
                (int(packed_flat.shape[1]), static[1]))
        return _gather_bank_tables(packed_flat, sched.gathermap_all,
                                   sched.gather_plan, static)
    return None


def _schedule_table(field, schedule: "TiledSchedule") -> jnp.ndarray:
    """The flat (rows, 32) table the schedule's hostmap lanes index:
    the full-pitch packed-stencil build for dense grids, or the brick
    table reshaped flat for sparse fields (no build at all - the
    schedule already resolved cell ids to brick rows)."""
    if schedule.table_kind == "sparse":
        check(hasattr(field, "bricks"),
              "schedule was built for a sparse brick field")
        check(tuple(int(v) for v in field.grid_shape)
              == tuple(schedule.grid_shape),
              "schedule was built for a different grid resolution")
        return field.bricks.reshape(-1, 32)
    check(tuple(int(v) for v in np.asarray(field.sigma.shape[:3]))
          == tuple(schedule.grid_shape),
          "schedule was built for a different grid resolution")
    if schedule.cell_scale == 2:
        # (R_s, 108) supercell vertex table - differentiable jnp build
        # (zero pad + strided slices), so the whole params -> banks ->
        # kernel chain autodiffs without a fused u16 route
        return grid_ops.build_supercell_stencil(field.sigma, field.color)
    return grid_ops.build_packed_stencil_fullpitch(
        field.sigma, field.color,
        dtype=grid_ops.table_dtype(
            getattr(field, "packed_dtype", "float32")))


def _group_tables(packed_flat: jnp.ndarray, group: TileGroup) -> jnp.ndarray:
    """Gather + transpose the group's bank tables: (T, banks, w, 128)
    with w the table row width (32 cell stencil / 108 supercell).

    One row-gather per bank LANE (each a distinct cell of the tile's
    dense bank packing - no per-sample or per-chunk duplication) through
    the bit-exact u16 path."""
    w = int(packed_flat.shape[1])
    if packed_flat.dtype == jnp.float32:
        rows = grid_ops.take_rows_exact(packed_flat, group.hostmap)
    else:
        rows = jnp.take(packed_flat, group.hostmap,
                        axis=0).astype(jnp.float32)
    tabs = rows.reshape(group.n_tiles, group.banks, MAX_CELLS, w)
    return jnp.swapaxes(tabs, 2, 3)


def _group_reference_planes(plan: Plan, tabs, group: TileGroup, geom,
                            cell_scale: int = 1):
    """Pure-jnp consumer of a tile group (the kernel's reference oracle and
    the non-TPU fallback): per-sample sigma/color planes in (N, K) layout
    plus dt/mask, ready for ops.integrate. Mirrors the kernel's in-graph
    fraction recompute (ops/fused_tiles.py::_sample_geometry /
    _sample_geometry_super)."""
    bbox_min, bbox_max, (gnz, gny, gnx) = geom
    t_cnt, nc = group.n_tiles, group.n_chunks
    packed = group.samp[:, :, 2].astype(jnp.int32)
    m = ((packed >> 15) & 1).astype(jnp.float32)
    if cell_scale == 2:
        lidx = packed & 0xFFF                     # tile-local bank lane
        lb = ((packed >> 12) & 1, (packed >> 13) & 1, (packed >> 14) & 1)
    else:
        lidx = packed & 0x7FFF                    # tile-local bank lane
        lb = None
    st = jax.lax.bitcast_convert_type(
        (group.samp[:, :, 0].astype(jnp.uint32) << 16)
        | group.samp[:, :, 1].astype(jnp.uint32), jnp.float32)

    # Expand the compact (12, 128) ray planes to per-sample layout:
    # sample (row r, lane l) belongs to ray r*16 + l//8.
    ray_idx = (np.arange(16)[:, None] * 16
               + np.arange(128)[None, :] // 8).reshape(-1)
    rayt6 = jnp.take(group.rayt.reshape(t_cnt, 6, 256),
                     jnp.asarray(ray_idx), axis=2).reshape(
        t_cnt, 6, 16, 128)

    lanes = group.banks * MAX_CELLS
    base_f = group.base.transpose(0, 2, 1, 3).reshape(t_cnt, 3, lanes)

    def base_gather(ax):
        b = jnp.take_along_axis(
            base_f[:, None, ax],
            lidx.reshape(t_cnt, nc, 16 * 128), axis=-1)
        return b.reshape(t_cnt, nc, 16, 128)

    def frac(o_i, d_i, ax, npts):
        p = rayt6[:, None, o_i] + rayt6[:, None, d_i] * st
        lo_v = jnp.float32(float(bbox_min[ax]))
        ext = float(bbox_max[ax]) - float(bbox_min[ax])
        inv_v = jnp.float32(1.0 / ext if ext != 0.0 else 0.0)
        f = ((p - lo_v) * inv_v) * jnp.float32(npts - 1)
        basec = base_gather(ax)
        if lb is not None:
            basec = basec + lb[ax].astype(jnp.float32)
        return f - basec

    tx = frac(0, 3, 0, gnx)
    ty = frac(1, 4, 1, gny)
    tz = frac(2, 5, 2, gnz)

    # cube[t, c, cc, r, l] = tabs_f[t, cc, lidx[t, c, r, l]] over the
    # tile's flattened bank lanes
    w_t = int(tabs.shape[2])                      # 32 cell / 108 super
    tabs_f = tabs.transpose(0, 2, 1, 3).reshape(t_cnt, w_t, lanes)
    cube = jnp.take_along_axis(
        tabs_f[:, None, :, :],
        lidx.reshape(t_cnt, nc, 1, 16 * 128), axis=-1).reshape(
        t_cnt, nc, w_t, 16, 128)

    wx = [1.0 - tx, tx]
    wy = [1.0 - ty, ty]
    wz = [m * (1.0 - tz), m * tz]
    planes = []
    if cell_scale == 2:
        # hat-basis selection over the 27-vertex supercell block: the
        # nonzero products are exactly the cell-path corner weights
        lbx, lby, lbz = (v.astype(jnp.int32) for v in lb)

        def hats(w, lb_pl):
            return [jnp.where(lb_pl == a, w[0],
                              jnp.where(lb_pl == a - 1, w[1], 0.0))
                    for a in range(3)]

        hx, hy, hz = hats(wx, lbx), hats(wy, lby), hats(wz, lbz)
        for ch in range(4):
            acc = jnp.zeros_like(tx)
            for vz in range(3):
                for vy in range(3):
                    for vx in range(3):
                        acc = acc + ((hz[vz] * hy[vy]) * hx[vx]
                                     * cube[:, :, ch * 27
                                            + vz * 9 + vy * 3 + vx])
            planes.append(acc)
        return tuple(planes)
    for ch in range(4):
        acc = jnp.zeros_like(tx)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    corner = dz * 4 + dy * 2 + dx
                    acc = acc + (wz[dz] * wy[dy] * wx[dx]
                                 * cube[:, :, ch * 8 + corner])
                    # channel-major packed layout: col = ch * 8 + corner
        planes.append(acc)
    return tuple(planes)  # sigma, r, g, b as (T, nc, 16, 128)


def _lanes_to_rays(a):
    """(T, nc, 16, 128) sample layout -> (T*256 rays, nc*8 steps)."""
    t_cnt, nc = a.shape[0], a.shape[1]
    a = a.reshape(t_cnt, nc, 16, 16, CHUNK)       # (T,c,row,rl,j)
    a = a.transpose(0, 2, 3, 1, 4)                # (T,row,rl,c,j)
    return a.reshape(t_cnt * RAYS_PER_TILE, nc * CHUNK)


def _group_outputs_reference(plan: Plan, packed_flat, group: TileGroup,
                             geom, cell_scale: int = 1):
    """Per-ray integration outputs for one group (pure jnp)."""
    tabs = _group_tables(packed_flat, group)
    sig, cr, cg, cb = (_lanes_to_rays(p) for p in
                       _group_reference_planes(plan, tabs, group, geom,
                                               cell_scale=cell_scale))

    nc = group.n_chunks
    k_steps = nc * CHUNK
    dt = jnp.float32(plan.sampling.dt)
    k = (group.k_enter.astype(jnp.int32)[:, None]
         + jnp.arange(k_steps, dtype=jnp.int32)[None, :])  # (T, K)
    k = jnp.repeat(k, RAYS_PER_TILE, axis=0)
    base_t = jnp.float32(plan.t_near) + k.astype(jnp.float32) * dt
    live = (base_t < plan.t_far) & (k < plan.sampling.max_steps)
    dt_act = jnp.where(
        live, jnp.minimum(base_t + dt, plan.t_far) - base_t, 0.0)

    t_origin = (jnp.float32(plan.t_near)
                + jnp.repeat(group.k_enter.astype(jnp.float32),
                             RAYS_PER_TILE) * dt)
    intl = integrate(sig, (cr, cg, cb), dt_act, live, plan.t_near,
                     plan.t_far, with_aux=False, t_cursor_origin=t_origin)
    return (group.pixel_ids, intl.radiance, intl.transmittance,
            intl.opacity, intl.depth)


def render_tiled(plan: Plan, field, schedule: TiledSchedule,
                 use_kernel: bool = True, gather: str = "dg",
                 reduce: str = DEFAULT_REDUCE, k=None, c2w=None) -> ImagePlanes:
    """Tile-table forward render (traceable; jit/grad over the field).

    ``use_kernel=False`` runs the pure-jnp reference consumer (any
    backend); True runs the fused Pallas kernel (TPU). ``gather``/
    ``reduce`` select the kernel's slot-expansion and group-reduction
    strategies (ops/fused_tiles.py; defaults are the measured-fastest).

    ``k`` (3,3) / ``c2w`` (3,4) may be traced camera arrays for pose /
    intrinsics gradients AT the schedule's camera: the ray planes are
    then rebuilt as traced functions of the camera (instead of the
    schedule's host-baked planes) and the kernel's backward emits their
    adjoint (pass 2 recomputes fractions from them - the cell/slot/mask
    assignment stays host-authoritative, exact a.e. because clipped
    steps and mask flips contribute zero in an open neighborhood). Like
    the windowed path, evaluating at a materially different camera would
    use a stale schedule - rebuild instead. Kernel path only.
    """
    check(tuple(float(v) for v in field.bbox_min) == tuple(schedule.bbox[0])
          and tuple(float(v) for v in field.bbox_max)
          == tuple(schedule.bbox[1]),
          "schedule was built for a different field bbox (cell ids and "
          "fraction constants depend on it)")
    check(getattr(field, "oob", OobPolicy.ZERO) == OobPolicy.ZERO,
          "tiled rendering requires an OOB_ZERO field")
    check(schedule.fallback is not None or schedule.fallback_rays == 0,
          "schedule was built with build_fallback=False (a cascade "
          "probe) but has overflow rays - rebuild with the fallback")

    # Dense f32 fields route params -> bank tables through the fused u16
    # custom VJP (no (R, 32) f32 table in HBM); every other combination
    # (sparse bricks, bf16/f16 tables, empty plans) builds the flat
    # table. The fused route is bit-identical to the two-op chain.
    dense_f32 = use_kernel and _dense_f32_route(field, schedule)
    packed_flat = None if dense_f32 else _schedule_table(field, schedule)

    geom = (schedule.bbox[0], schedule.bbox[1], schedule.grid_shape)
    stencil = "super" if schedule.cell_scale == 2 else "cell"
    with_cam = k is not None or c2w is not None
    check(not with_cam or use_kernel,
          "camera gradients ride the kernel path (use_kernel=True)")

    fallback_parts = []
    if schedule.fallback is not None:
        for (budget, ids_dev, ke_dev, jit_rows) in schedule.fallback.groups:
            fallback_parts.append(windowed_mod._group_outputs(
                plan, budget, field, ids_dev, ke_dev, jit_rows,
                k=k, c2w=c2w))

    if use_kernel:
        from dvren_tpu.ops import fused_tiles

        traced_rays = None
        if with_cam:
            from dvren_tpu.ops.raygen import generate_rays
            all_ids = jnp.concatenate(
                [g.ray_ids.reshape(-1) for g in schedule.groups]) \
                if schedule.groups else None
            if all_ids is not None:
                traced_rays = generate_rays(plan, k=k, c2w=c2w,
                                            ids=all_ids)

        subs = (16 // schedule.tile_px) ** 2
        rayts, ids = [], []
        roff = 0
        for group in schedule.groups:
            rayt = group.rayt
            if traced_rays is not None:
                nt = group.n_tiles
                n_r = nt * RAYS_PER_TILE
                o = traced_rays.origins[roff:roff + n_r]
                d = traced_rays.directions[roff:roff + n_r]
                roff += n_r
                rayt = jnp.stack(
                    [o[:, i].reshape(nt, 2, 128) for i in range(3)]
                    + [d[:, i].reshape(nt, 2, 128) for i in range(3)],
                    axis=1).reshape(nt, 12, 128)
            rayts.append(rayt)
            ids.append(group.tile_ids)

        if dense_f32:
            # Merged params->output VJP: build + bank gather + every
            # group's kernel in ONE custom_vjp, whose backward kernel
            # emits u16 slot rows directly (no bank->row relayout pass).
            # Same resolution guard _planned_bank_tables enforces: the
            # bbox check above does not imply a matching grid shape.
            check(tuple(int(v) for v in np.asarray(field.sigma.shape[:3]))
                  == tuple(schedule.grid_shape),
                  "schedule was built for a different grid resolution")
            static = (
                schedule.pitch,
                tuple((g.n_tiles, g.banks) for g in schedule.groups),
                tuple(fused_tiles.tile_op_params(
                    plan, geom, g.banks, g.n_chunks, subs, g.n_tiles,
                    gather=gather, reduce=reduce, cam_grads=with_cam)
                    for g in schedule.groups),
                with_cam)
            raws = list(_groupset_from_params(
                static, field.sigma, field.color, schedule.gathermap_all,
                schedule.gather_plan,
                tuple(g.samp for g in schedule.groups),
                tuple(g.base for g in schedule.groups),
                tuple(g.k_enter.reshape(-1).astype(jnp.int32)
                      for g in schedule.groups),
                tuple(g.bank0.reshape(-1).astype(jnp.int32)
                      for g in schedule.groups),
                tuple(rayts)))
            return _compose_tiles(plan, raws, ids, fallback_parts,
                                  tile_px=schedule.tile_px)

        # One planned gather for all groups, emitted directly in the
        # kernel's bank-block layout (the plan's gather-transpose backward
        # replaces the slow scatter-add).
        group_tabs = _planned_bank_tables(field, schedule, packed_flat)

        raws = []
        for gi, group in enumerate(schedule.groups):
            if group_tabs is not None:
                tabs = group_tabs[gi]
            else:
                tabs = _group_tables(packed_flat, group)
            raws.append(fused_tiles.render_tile_group_raw(
                plan, geom, tabs, group.samp, group.base, rayts[gi],
                group.k_enter, group.bank0, group.n_chunks,
                subs=subs, gather=gather,
                reduce=reduce, cam_grads=with_cam, stencil=stencil))
        return _compose_tiles(plan, raws, ids, fallback_parts,
                              tile_px=schedule.tile_px)

    parts = [_group_outputs_reference(plan, packed_flat, group, geom,
                                      cell_scale=schedule.cell_scale)
             for group in schedule.groups] + fallback_parts
    if not parts:
        return windowed_mod._compose_planes(
            plan, *windowed_mod._empty_parts())
    return windowed_mod._compose_planes(
        plan, *(jnp.concatenate([p[i] for p in parts]) for i in range(5)))


@pytree_dataclass(meta_fields=("view_slices", "n_views", "view_cams"))
@dataclass(frozen=True)
class MergedViewSchedule:
    """All views' tile groups merged by (chunk count, bank count) class.

    Multi-view training renders V views per optimizer step; per-view
    schedules issue ~V x groups kernel calls and (before shape
    quantization) instantiate per-view kernel variants. Tiles are
    independent, so tiles from DIFFERENT views sharing a (nc, nb) class
    merge into one group: one kernel call and ONE planned table gather
    cover every view. Measured at the fit flagship (8 views @ 96^2, 4px):
    ~50 kernel calls -> ~6, with the quantized variant set shared.

    ``view_slices``: static, per merged group, tuple of
    (view, t_start, t_count) tile-axis runs (view-major order).
    """

    sched: TiledSchedule         # merged groups; fallback=None
    view_fallbacks: tuple        # per view: windowed schedule | None
    view_slices: tuple
    n_views: int
    view_cams: tuple | None = None  # per view (k, c2w, ortho_scale)
    #                          tuples, or None when every view shares the
    #                          stack plan's camera. The merged groups bake
    #                          each view's rays host-side, but FALLBACK
    #                          rays are regenerated at render time and
    #                          need the view's own camera.


def merge_view_schedules(scheds, plans=None) -> MergedViewSchedule:
    """Merge per-view TiledSchedules (same plan geometry, same field,
    same tile_px) into a :class:`MergedViewSchedule`.

    ``plans``: the per-view Plans the schedules were built from. Required
    whenever any view carries a windowed FALLBACK (slot-overflowed
    tiles): fallback rays are regenerated at render time, so the stack
    renderer must know each view's camera - the merged kernel groups
    themselves bake per-view rays host-side and don't need it."""
    base = scheds[0]
    for s in scheds:
        check(s.fallback is not None or s.fallback_rays == 0,
              "merge_view_schedules: a view schedule was built with "
              "build_fallback=False but has overflow rays")
    for s in scheds[1:]:
        check(s.tile_px == base.tile_px
              and s.grid_shape == base.grid_shape
              and s.bbox == base.bbox
              and s.table_kind == base.table_kind
              and s.pitch == base.pitch
              and s.cell_scale == base.cell_scale,
              "merge_view_schedules: schedules must share tile_px, pitch, "
              "cell_scale, grid and bbox (build all views at one tile_px)")
    keys = sorted({(g.n_chunks, g.banks)
                   for s in scheds for g in s.groups})
    merged, slices_all, host_parts, gmap_parts = [], [], [], []
    t_samples = 0
    for key in keys:
        parts, slices, t_off = [], [], 0
        for v, s in enumerate(scheds):
            for g in s.groups:
                if (g.n_chunks, g.banks) == key:
                    parts.append(g)
                    slices.append((v, t_off, g.n_tiles))
                    t_off += g.n_tiles
        t_samples += sum(p.samples for p in parts)

        def cat(name):
            # Host-built (numpy-leaf) schedules merge at memcpy speed
            # and upload ONCE (the batched tree-level put below);
            # device-leaf schedules keep the jnp path (each concat is a
            # remote dispatch on the tunnel - build per-view schedules
            # with device=False when merging).
            vals = [getattr(p, name) for p in parts]
            if all(isinstance(v, np.ndarray) for v in vals):
                return vals[0] if len(vals) == 1 else np.concatenate(vals)
            if len(vals) == 1:
                return vals[0]
            return jnp.concatenate(vals)

        host_parts.extend(np.asarray(p.hostmap) for p in parts)
        gmap_parts.extend(np.asarray(p.gathermap) for p in parts)
        merged.append(TileGroup(
            n_chunks=key[0], n_tiles=t_off, banks=key[1],
            hostmap=cat("hostmap"), gathermap=cat("gathermap"),
            samp=cat("samp"), base=cat("base"),
            rayt=cat("rayt"), bank0=cat("bank0"), ray_ids=cat("ray_ids"),
            k_enter=cat("k_enter"), pixel_ids=cat("pixel_ids"),
            tile_ids=cat("tile_ids"),
            samples=sum(p.samples for p in parts)))
        slices_all.append(tuple(slices))

    hostmap_all = (np.concatenate(host_parts) if host_parts
                   else np.zeros(0, np.int32))
    gathermap_all = (np.concatenate(gmap_parts) if gmap_parts
                     else np.zeros(0, np.int32))
    n_rows = (int(base.gather_plan.inv_map.shape[0])
              if base.gather_plan is not None
              else next((int(s.gather_plan.inv_map.shape[0])
                         for s in scheds
                         if s.gather_plan is not None), 1))
    sched = TiledSchedule(
        groups=tuple(merged), fallback=None,
        hostmap_all=hostmap_all,
        gathermap_all=gathermap_all,
        gather_plan=_build_gather_plan(hostmap_all, n_rows,
                                       put=lambda x: x),
        total_rays=sum(s.total_rays for s in scheds),
        tiled_samples=t_samples,
        full_lattice_samples=sum(s.full_lattice_samples for s in scheds),
        fallback_rays=sum(s.fallback_rays for s in scheds),
        grid_shape=base.grid_shape, bbox=base.bbox,
        tile_px=base.tile_px, table_kind=base.table_kind,
        pitch=base.pitch, cell_scale=base.cell_scale)
    view_cams = None
    if plans is not None:
        check(len(plans) == len(scheds),
              "merge_view_schedules: one plan per schedule")
        view_cams = tuple(
            (tuple(float(v) for v in p.camera.k),
             tuple(float(v) for v in p.camera.c2w),
             float(p.camera.ortho_scale)) for p in plans)
    check(plans is not None
          or all(s.fallback is None for s in scheds),
          "merge_view_schedules: a view has fallback (slot-overflow) "
          "rays, whose rays are regenerated at render time - pass "
          "plans= so the stack renderer uses each view's own camera")
    # ONE batched upload for the merged groups, gather plan AND the
    # per-view fallbacks (per-leaf device_put pays ~36 ms relay
    # dispatch each - utils/pytree.py::device_put_tree)
    return device_put_tree(MergedViewSchedule(
        sched=sched,
        view_fallbacks=tuple(s.fallback for s in scheds),
        view_slices=tuple(slices_all),
        n_views=len(scheds),
        view_cams=view_cams))


def render_tiled_stack(plan: Plan, field, merged: MergedViewSchedule,
                       use_kernel: bool = True, gather: str = "dg",
                       reduce: str = DEFAULT_REDUCE) -> jnp.ndarray:
    """Render every merged view in one pass -> (V, H, W, 3) image stack.

    One packed-table build + ONE planned bank-table gather + one kernel
    call per merged (nc, nb) group serve all views; per-view composition
    slices each group's output rows by ``view_slices``. Traceable in the
    field (the multi-view train-step hot path)."""
    sched = merged.sched
    check(tuple(float(v) for v in field.bbox_min) == tuple(sched.bbox[0])
          and tuple(float(v) for v in field.bbox_max)
          == tuple(sched.bbox[1]),
          "merged schedule was built for a different field bbox")
    dense_f32 = use_kernel and _dense_f32_route(field, sched)
    packed_flat = None if dense_f32 else _schedule_table(field, sched)
    geom = (sched.bbox[0], sched.bbox[1], sched.grid_shape)
    subs = (16 // sched.tile_px) ** 2
    stencil = "super" if sched.cell_scale == 2 else "cell"

    if use_kernel:
        from dvren_tpu.ops import fused_tiles

        group_tabs = _planned_bank_tables(field, sched, packed_flat)
        raws = []
        for gi, group in enumerate(sched.groups):
            tabs = (group_tabs[gi] if group_tabs is not None
                    else _group_tables(packed_flat, group))
            raws.append(fused_tiles.render_tile_group_raw(
                plan, geom, tabs, group.samp, group.base, group.rayt,
                group.k_enter, group.bank0, group.n_chunks,
                subs=subs, gather=gather, reduce=reduce,
                stencil=stencil))
    else:
        parts = [_group_outputs_reference(plan, packed_flat, group, geom,
                                          cell_scale=sched.cell_scale)
                 for group in sched.groups]

    images = []
    for v in range(merged.n_views):
        fallback_parts = []
        fb = merged.view_fallbacks[v]
        if fb is not None:
            # fallback rays are regenerated here, so they must use THIS
            # view's camera, not the stack plan's (the merged kernel
            # groups bake per-view rays host-side and are unaffected)
            check(merged.view_cams is not None,
                  "merged schedule has fallback rays but no per-view "
                  "cameras; rebuild with merge_view_schedules(plans=...)")
            cam_k, cam_c2w, cam_os = merged.view_cams[v]
            k_v = jnp.asarray(cam_k, jnp.float32).reshape(3, 3)
            c2w_v = jnp.asarray(cam_c2w, jnp.float32).reshape(3, 4)
            for (budget, ids_dev, ke_dev, jit_rows) in fb.groups:
                fallback_parts.append(windowed_mod._group_outputs(
                    plan, budget, field, ids_dev, ke_dev, jit_rows,
                    k=k_v, c2w=c2w_v,
                    ortho_scale=jnp.float32(cam_os)))
        if use_kernel:
            raws_v, ids_v = [], []
            for gi, group in enumerate(sched.groups):
                for (vv, t0, cnt) in merged.view_slices[gi]:
                    if vv != v:
                        continue
                    raws_v.append(raws[gi][t0:t0 + cnt])
                    ids_v.append(group.tile_ids[t0:t0 + cnt])
            planes = _compose_tiles(plan, raws_v, ids_v, fallback_parts,
                                    tile_px=sched.tile_px)
        else:
            parts_v = []
            for gi, group in enumerate(sched.groups):
                pix = parts[gi][0].reshape(group.n_tiles, RAYS_PER_TILE)
                heads = [p.reshape((group.n_tiles, RAYS_PER_TILE)
                                   + p.shape[1:])
                         for p in parts[gi][1:]]
                for (vv, t0, cnt) in merged.view_slices[gi]:
                    if vv != v:
                        continue
                    parts_v.append(
                        (pix[t0:t0 + cnt].reshape(-1),)
                        + tuple(h[t0:t0 + cnt].reshape((-1,) + h.shape[2:])
                                for h in heads))
            parts_v = parts_v + fallback_parts
            if not parts_v:
                planes = windowed_mod._compose_planes(
                    plan, *windowed_mod._empty_parts())
            else:
                planes = windowed_mod._compose_planes(
                    plan, *(jnp.concatenate([p[i] for p in parts_v])
                            for i in range(5)))
        images.append(planes.image)
    return jnp.stack(images)


def render_tiled_phases(plan: Plan, schedule: TiledSchedule,
                        gather: str = "dg", reduce: str = DEFAULT_REDUCE):
    """Three jittable phase functions whose chained application equals
    :func:`render_tiled` with ``use_kernel=True`` - the Renderer's
    per-stage stats probe (reference parity: ``Renderer::Forward`` times
    ray/sample/integrate/compose on its real path,
    ``src/render/renderer.cpp:258-385``; the fused path is ONE dispatch,
    so stages are measured by a decomposed replay once per schedule).

    Returns (tables_fn(field) -> tabs tuple, kernel_fn(tabs) -> raws
    tuple, compose_fn(field, raws) -> ImagePlanes). tables = packed-
    stencil build + bank gather (the "sampling + field eval" analogue),
    kernel = the fused march (the "integrate" analogue), compose = tile
    composition + windowed fallback.
    """
    geom = (schedule.bbox[0], schedule.bbox[1], schedule.grid_shape)

    def tables_fn(field):
        if _dense_f32_route(field, schedule):
            tabs = _planned_bank_tables(field, schedule, None)
        else:
            packed_flat = _schedule_table(field, schedule)
            tabs = _planned_bank_tables(field, schedule, packed_flat)
            if tabs is None:
                tabs = tuple(_group_tables(packed_flat, g)
                             for g in schedule.groups)
        return tabs

    def kernel_fn(tabs):
        from dvren_tpu.ops import fused_tiles
        return tuple(
            fused_tiles.render_tile_group_raw(
                plan, geom, tb, g.samp, g.base, g.rayt, g.k_enter,
                g.bank0, g.n_chunks,
                subs=(16 // schedule.tile_px) ** 2,
                gather=gather, reduce=reduce,
                stencil=("super" if schedule.cell_scale == 2
                         else "cell"))
            for g, tb in zip(schedule.groups, tabs))

    def compose_fn(field, raws):
        fallback_parts = []
        if schedule.fallback is not None:
            for (budget, ids_dev, ke_dev, jit_rows) in \
                    schedule.fallback.groups:
                fallback_parts.append(windowed_mod._group_outputs(
                    plan, budget, field, ids_dev, ke_dev, jit_rows))
        return _compose_tiles(plan, list(raws),
                              [g.tile_ids for g in schedule.groups],
                              fallback_parts,
                              tile_px=schedule.tile_px)

    return tables_fn, kernel_fn, compose_fn


def raw_to_subtiles(raw, tile_px: int):
    """Kernel raw heads (T, 5, 16, 16) -> per-SUB-tile blocks
    (T*n_sub, 5, px, px): a 16x16 block's contiguous (16/px)^2 ray spans
    are its sub-tiles (one relayout shared by the single-chip and
    sharded composers)."""
    n_sub = (16 // tile_px) ** 2
    raw = raw.reshape(-1, 5, n_sub, tile_px * tile_px)
    return raw.transpose(0, 2, 1, 3).reshape(-1, 5, tile_px, tile_px)


def tiles5_to_planes(plan: Plan, tiles5, tile_px: int):
    """Scattered per-tile head array (n_tiles, 5, px, px) -> ROI-placed
    (image (H, W, 3), transmittance, opacity, depth) planes - the
    post-scatter half of :func:`_compose_tiles`, shared with the
    mesh-sharded composer (parallel/shard.py)."""
    from dvren_tpu.ops import fused_tiles

    roi = plan.roi
    sx_n = -(-roi.width // tile_px)
    sy_n = -(-roi.height // tile_px)
    a = tiles5.reshape(sy_n, sx_n, 5, tile_px, tile_px)
    a = a.transpose(2, 0, 3, 1, 4).reshape(
        5, sy_n * tile_px, sx_n * tile_px)
    a = a[:, :roi.height, :roi.width]
    (r, g, b), t_final, opacity, depth = fused_tiles.finalize_heads(
        plan, a, axis=0)

    H, W = plan.height, plan.width

    def place(x, fill):
        if (roi.x, roi.y, roi.width, roi.height) == (0, 0, W, H):
            return x
        full = jnp.full((H, W), jnp.float32(fill))
        return jax.lax.dynamic_update_slice(full, x, (roi.y, roi.x))

    image = jnp.stack(
        [place(r, 0.0), place(g, 0.0), place(b, 0.0)], axis=-1)
    return (image, place(t_final, 1.0), place(opacity, 0.0),
            place(depth, float(plan.t_far)))


def _compose_tiles(plan: Plan, raws, tile_ids, fallback_parts,
                   tile_px: int = 16):
    """Compose the kernel's per-tile raw heads into image planes by TILE:
    each (16, 16) output block IS its image region (row = pixel y, lane =
    pixel x; in 8px sub-tiled mode the block's four contiguous 64-ray
    spans are its 8x8 sub-tiles), so composition is a ~n_tiles-start row
    scatter plus one relayout - instead of a per-ray pixel scatter (1.3M
    scatter starts ~4 ms/frame at 512^2). Dead rays/tiles carry the exact
    background (odp = 0 -> T = 1, wd = 0 -> depth = t_far)."""
    from dvren_tpu.ops import fused_tiles
    from dvren_tpu.ops.compose import ImagePlanes

    roi = plan.roi
    n_sub = (16 // tile_px) ** 2
    sx_n = -(-roi.width // tile_px)
    sy_n = -(-roi.height // tile_px)
    n_tiles = sx_n * sy_n

    tiles5 = jnp.zeros((n_tiles, 5, tile_px, tile_px), jnp.float32)
    if raws:
        raw = jnp.concatenate(raws)               # (T, 5, 16, 16)
        ids = jnp.concatenate(tile_ids).reshape(-1)
        tiles5 = tiles5.at[ids].set(raw_to_subtiles(raw, tile_px),
                                    mode="drop")
    image, trans, opac, dep = tiles5_to_planes(plan, tiles5, tile_px)
    H, W = plan.height, plan.width

    if fallback_parts:
        # Overflow tiles render through the windowed path; overwrite their
        # live rays' pixels (few rays; pad ids >= H*W drop).
        pids = jnp.concatenate([p[0] for p in fallback_parts])
        rad = jnp.concatenate([p[1] for p in fallback_parts])
        tr = jnp.concatenate([p[2] for p in fallback_parts])
        op = jnp.concatenate([p[3] for p in fallback_parts])
        de = jnp.concatenate([p[4] for p in fallback_parts])
        image = image.reshape(H * W, 3).at[pids].set(
            rad, mode="drop").reshape(H, W, 3)
        trans = trans.reshape(H * W).at[pids].set(
            tr, mode="drop").reshape(H, W)
        opac = opac.reshape(H * W).at[pids].set(
            op, mode="drop").reshape(H, W)
        dep = dep.reshape(H * W).at[pids].set(
            de, mode="drop").reshape(H, W)

    return ImagePlanes(
        image=image, transmittance=trans, opacity=opac, depth=dep,
        hitmask=windowed_mod.roi_hitmask(plan))
