"""Hash-MLP tiled rendering: the slot-free fused fast path.

Unlike the dense path's capture-specialized cell tables
(render/tiled.py), the hash-MLP kernel (ops/hash_tiles.py) resolves its
table lookups IN-KERNEL (tiny per-level tables live in VMEM lanes), so
the schedule here is only the tile/block layout of the frame: compact
ray planes + exact sample_t planes per (tile, chunk). It depends on
(plan, camera) but costs a few ms to build and carries ~6 bytes/sample
of upload - camera motion is cheap on this field.

The composition reuses the dense path's tile composer (the kernel's
(16, 16) output blocks ARE image tiles).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from dvren_tpu.core.plan import Plan, SamplingMode
from dvren_tpu.core.status import check
from dvren_tpu.ops.compose import ImagePlanes
from dvren_tpu.ops.hash_tiles import (fast_path_ok,
                                      render_hash_tile_group_raw)
from dvren_tpu.render import tiled as tiled_mod
from dvren_tpu.render import windowed as windowed_mod
from dvren_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass(meta_fields=("n_chunks", "n_tiles"))
@dataclass(frozen=True)
class HashTiledSchedule:
    """One group of 16x16-pixel tiles over the FULL lattice (hash fields
    have no bbox to clip against): sample_t planes + compact ray planes
    + compose targets. Pad rays (ROI edges) carry sample_t past t_far,
    so their dt_actual is 0 and they contribute exact background."""

    n_chunks: int
    n_tiles: int
    samp: jnp.ndarray       # (T, nc, 2, 16, 128) u16: sample_t hi | lo
    rayt: jnp.ndarray       # (T, 12, 128) f32 compact ray planes
    tile_ids: jnp.ndarray   # (T,) int32 image-tile ids (row-major)


def build_hash_schedule(plan: Plan,
                        jitter: np.ndarray | None = None,
                        device: bool = True) -> HashTiledSchedule:
    """Tile/block layout for the hash fast path (host-side, a few ms).

    ``jitter``: the (N, K) host table for stratified plans
    (pipeline.plan_jitter_table); FIXED plans bake jitter 0.5.
    ``device=False`` keeps numpy leaves (for stack merging - upload
    once after the concat, the lesson of the dense-path view merge).
    """
    if jitter is None and plan.sampling.mode == SamplingMode.STRATIFIED:
        from dvren_tpu.render.pipeline import plan_jitter_table
        jitter = plan_jitter_table(plan)

    n = plan.ray_count
    k_max = int(plan.sampling.max_steps)
    nc = -(-k_max // 8)
    k_steps = nc * 8
    dt = np.float32(plan.sampling.dt)
    t_near = np.float32(plan.t_near)
    t_far = np.float32(plan.t_far)

    o, d = windowed_mod._host_rays(plan)
    tiles, sub_ids = tiled_mod._tile_rays(plan, 16)   # (T, 256), (T, 1)
    t_cnt = tiles.shape[0]
    safe = np.maximum(tiles, 0)
    live_r = tiles >= 0

    k = np.arange(k_steps, dtype=np.int64)
    base_t = t_near + k.astype(np.float32) * dt       # (K,)
    if jitter is not None:
        jit = np.asarray(jitter, np.float32)[
            np.minimum(safe, n - 1)[:, :, None],
            np.minimum(k, np.asarray(jitter).shape[1] - 1)]
    else:
        jit = np.float32(0.5)
    st = np.asarray(base_t[None, None, :] + jit * dt, np.float32)
    st = np.broadcast_to(st, (t_cnt, 256, k_steps))
    # dead pad rays march anyway; their lattice mask (k < k_max,
    # base_t < t_far) matches live rays, so force their sample_t past
    # t_far: dt_actual == 0 -> exact-zero contribution everywhere
    st = np.where(live_r[:, :, None], st, np.float32(t_far + 1.0))

    def to_lanes(a):
        a = a.reshape(t_cnt, 16, 16, nc, 8)
        a = a.transpose(0, 3, 1, 2, 4)
        return a.reshape(t_cnt, nc, 16, 128)

    st_l = to_lanes(st)
    st_bits = np.ascontiguousarray(st_l).view(np.uint32)
    samp = np.stack([(st_bits >> 16).astype(np.uint16),
                     (st_bits & np.uint32(0xFFFF)).astype(np.uint16)],
                    axis=2)                   # (T, nc, 2, 16, 128)

    ot = o[safe].astype(np.float32, copy=False)
    dtn = d[safe].astype(np.float32, copy=False)
    rayt = np.stack(
        [ot[:, :, i].reshape(t_cnt, 2, 128) for i in range(3)]
        + [dtn[:, :, i].reshape(t_cnt, 2, 128) for i in range(3)],
        axis=1).reshape(t_cnt, 12, 128)

    # pad the group to a multiple of 8 tiles (kernel DMA blocks)
    t_pad = -(-t_cnt // 8) * 8
    tile_ids = sub_ids.reshape(-1).astype(np.int32)
    tile_ids = np.where(tile_ids < 0, np.int32(1 << 30), tile_ids)
    if t_pad != t_cnt:
        # pad tiles march zero rays at the origin and are DROPPED by the
        # compose scatter (id 1 << 30) - their work is finite garbage,
        # never observed, and their cotangents are exact zeros
        extra = t_pad - t_cnt
        samp = np.concatenate(
            [samp, np.zeros((extra,) + samp.shape[1:], samp.dtype)])
        rayt = np.concatenate(
            [rayt, np.zeros((extra, 12, 128), np.float32)])
        tile_ids = np.concatenate(
            [tile_ids, np.full(extra, 1 << 30, np.int32)])
    if not device:
        return HashTiledSchedule(n_chunks=nc, n_tiles=t_pad, samp=samp,
                                 rayt=rayt, tile_ids=tile_ids)
    return HashTiledSchedule(
        n_chunks=nc, n_tiles=t_pad,
        samp=jax.device_put(samp),
        rayt=jax.device_put(rayt),
        tile_ids=jax.device_put(tile_ids))


@pytree_dataclass(meta_fields=("n_chunks", "n_tiles", "n_views"))
@dataclass(frozen=True)
class HashStackSchedule:
    """V per-view hash schedules concatenated on the tile axis: ONE
    kernel call (one Mosaic variant) marches every view's tiles, then a
    per-view tile compose slices its ``n_tiles``-tile span. All views
    share the plan's frame geometry (the multi-view fit contract)."""

    n_chunks: int
    n_tiles: int                # tiles PER VIEW (padded)
    n_views: int
    samp: jnp.ndarray           # (V*T, nc, 2, 16, 128) u16
    rayt: jnp.ndarray           # (V*T, 12, 128) f32
    tile_ids: jnp.ndarray       # (V*T,) int32, per-view frame-local ids


def build_hash_schedule_stack(plans,
                              jitter: np.ndarray | None = None
                              ) -> HashStackSchedule:
    """Concatenate per-view hash schedules (same frame geometry) for
    :func:`render_hash_tiled_stack`. Host-side numpy until the single
    upload."""
    check(len(plans) >= 1, "need at least one view")
    per = [build_hash_schedule(p, jitter=jitter, device=False)
           for p in plans]
    nc = per[0].n_chunks
    nt = per[0].n_tiles
    check(all(s.n_chunks == nc and s.n_tiles == nt for s in per),
          "hash stack views must share the plan's frame geometry")
    return HashStackSchedule(
        n_chunks=nc, n_tiles=nt, n_views=len(per),
        samp=jax.device_put(np.concatenate([s.samp for s in per])),
        rayt=jax.device_put(np.concatenate([s.rayt for s in per])),
        tile_ids=jax.device_put(
            np.concatenate([s.tile_ids for s in per])))


def render_hash_tiled_stack(plan: Plan, field,
                            stack: HashStackSchedule) -> jnp.ndarray:
    """Render every view in one fused kernel call -> (V, H, W, 3)
    image stack (the hash multi-view train-step hot path; traceable in
    ``field.params``)."""
    check(fast_path_ok(field.spec),
          "hash fast path unavailable for this spec (power-of-two "
          "table_size <= 128, hidden_dim <= 8)")
    raw = render_hash_tile_group_raw(
        plan, field.spec, stack.samp, stack.rayt, field.params,
        stack.n_chunks)
    images = []
    for v in range(stack.n_views):
        sl = slice(v * stack.n_tiles, (v + 1) * stack.n_tiles)
        planes = tiled_mod._compose_tiles(
            plan, [raw[sl]], [stack.tile_ids[sl]], [], tile_px=16)
        images.append(planes.image)
    return jnp.stack(images)


def render_hash_tiled(plan: Plan, field,
                      schedule: HashTiledSchedule) -> ImagePlanes:
    """Fused hash-MLP forward render (traceable; jit/grad over
    ``field.params``)."""
    check(fast_path_ok(field.spec),
          "hash fast path unavailable for this spec (power-of-two "
          "table_size <= 128, hidden_dim <= 8)")
    raw = render_hash_tile_group_raw(
        plan, field.spec, schedule.samp, schedule.rayt, field.params,
        schedule.n_chunks)
    return tiled_mod._compose_tiles(
        plan, [raw], [schedule.tile_ids], [], tile_px=16)


# -------------------------------------------------- NGP-scale grid path

@dataclass(frozen=True)
class _HashSchedProxy:
    """Scheduler-facing view of a hash-MLP field for the NGP-scale grid
    path (ops/hash_grid.py): the unit bbox (the reference hardcodes
    field bounds to [0,1]^3, hp_internal.hpp:29-30) and the finest
    level's point lattice as the cell grid. OOB-ZERO: the grid path
    defines the field as zero outside the unit cube (the toy in-kernel
    path evaluates hash noise everywhere; trained content lives inside)."""

    schedule_grid_shape: tuple
    bbox_min: tuple = (0.0, 0.0, 0.0)
    bbox_max: tuple = (1.0, 1.0, 1.0)


def build_hash_grid_schedule(plan: Plan, field,
                             jitter: np.ndarray | None = None,
                             tile_px: int | None = None,
                             quantize=False,
                             uniform_shape=None,
                             device: bool = True):
    """Tile-table schedule for the hash grid path: the DENSE scheduler
    over the spec's finest-level lattice (one slot per finest cell; all
    level lookups resolve from that cell's packed row).

    ``tile_px=None`` auto-cascades 16 -> 8 -> 4 px sub-tiles to the
    coarsest configuration with zero slot overflow (the grid path has
    no windowed fallback - the streamed referee's OOB semantics differ
    outside the unit cube)."""
    from dvren_tpu.ops import hash_grid

    check(hash_grid.grid_path_ok(field.spec),
          "hash grid path unavailable for this spec (see "
          "ops/hash_grid.py::grid_path_ok)")
    proxy = _HashSchedProxy(
        schedule_grid_shape=hash_grid.grid_shape(field.spec))
    build = functools.partial(
        tiled_mod.build_tiled_schedule, plan, proxy, jitter=jitter,
        quantize=quantize, uniform_shape=uniform_shape,
        build_fallback=False)
    if tile_px is not None:
        return build(tile_px=tile_px, device=device)
    sched = None
    for px in (16, 8, 4):
        sched = build(tile_px=px, device=False)
        if sched.fallback_rays == 0:
            break
    check(sched.fallback_rays == 0,
          "hash grid schedule overflows even 4px sub-tiles")
    if device:
        from dvren_tpu.utils.pytree import device_put_tree
        sched = device_put_tree(sched)
    return sched


def render_hash_grid_tiled(plan: Plan, field, schedule) -> ImagePlanes:
    """NGP-scale fused hash render: packed multi-level table build +
    planned bank gather + the hash-grid kernel + tile composition.
    Traceable and differentiable in ``field.params`` (hash table via
    the bank cotangent's planned gather-transpose + the table build's
    adjoint; MLP heads via the kernel's scalar-vector grads)."""
    from dvren_tpu.ops import hash_grid
    from dvren_tpu.ops.hash_tiles import pack_mlp_scalars

    check(schedule.fallback_rays == 0 and schedule.fallback is None,
          "hash grid path requires zero overflow rays (rebuild the "
          "schedule with tile_px=8)")
    check(tuple(schedule.grid_shape)
          == hash_grid.grid_shape(field.spec),
          "schedule was built for a different finest resolution")
    packed = hash_grid.build_hash_grid_table(field.params, field.spec)
    static = (int(packed.shape[1]),
              tuple((g.n_tiles, g.banks) for g in schedule.groups))
    tabs = tiled_mod._gather_banks_f32(
        packed, schedule.gathermap_all, schedule.gather_plan, static)
    sc = pack_mlp_scalars(field.params, field.spec)
    subs = (16 // schedule.tile_px) ** 2
    raws = [
        hash_grid.render_hash_grid_group_raw(
            plan, field.spec, tabs[i], g.samp, g.base, g.rayt,
            g.k_enter, g.bank0, g.n_chunks, sc, subs=subs)
        for i, g in enumerate(schedule.groups)]
    return tiled_mod._compose_tiles(
        plan, raws, [g.tile_ids for g in schedule.groups], [],
        tile_px=schedule.tile_px)
