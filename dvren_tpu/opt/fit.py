"""Differentiable grid fitting: Adam on voxel grids from multi-view renders.

The training-loop capability the reference only exercises one step of in its
tests (SURVEY.md section 3.2: "training loop = Forward -> loss grad ->
Backward -> user-side optimizer update -> recreate field"). Here the whole
step is one jit-compiled function: render -> MSE -> jax.grad into the field
pytree -> optax update. This is the BASELINE.json "64^3 grid fit to PSNR 35"
workload.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field as dc_field
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dvren_tpu.core.plan import CameraConfig, Plan
from dvren_tpu.render.pipeline import render


@dataclass
class FitConfig:
    learning_rate: float = 5e-2
    steps: int = 500
    target_psnr: float | None = 35.0
    log_every: int = 50
    sigma_min: float = 0.0       # project sigma to >= 0 after each step
    sync_every: int = 1          # steps per device round trip: > 1 runs
    #                              lax.scan blocks of K optimizer steps
    #                              inside ONE dispatch (the tunnel costs
    #                              ~36 ms/dispatch + a loss fetch per
    #                              sync; the per-step loss history is
    #                              still complete). Target-PSNR stop is
    #                              checked per block.


@dataclass
class FitResult:
    field: object
    psnr_history: list[float] = dc_field(default_factory=list)
    loss_history: list[float] = dc_field(default_factory=list)
    steps_run: int = 0
    wall_clock_s: float = 0.0    # INCLUDES the schedule build (round 4:
    #                              the build was previously outside the
    #                              clock, hiding its cost)
    schedule_build_s: float = 0.0  # host schedule build + merge + upload
    first_step_s: float = 0.0    # includes jit compile / cache load
    steady_step_ms: float = 0.0  # mean of the remaining steps
    reached_target: bool = False
    mode: str = ""               # schedule mode actually used (auto may
    #                              demote tiled -> windowed on table
    #                              economy; see fit_dense_grid)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(loss: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(loss, 1e-12))


def render_views(plan: Plan, field, cameras: Sequence[CameraConfig]):
    """Render (V, H, W, 3) images for a list of camera poses (vmapped over
    the stacked c2w matrices; one compile for all views)."""
    c2ws = jnp.stack([jnp.asarray(c.c2w, jnp.float32).reshape(3, 4)
                      for c in cameras])

    def one(c2w):
        return render(plan, field, c2w=c2w).planes.image

    return jax.vmap(one)(c2ws)


def view_plans(plan: Plan, cameras: Sequence[CameraConfig]):
    """Per-view plans: the plan's camera with each view's pose."""
    from dataclasses import replace as _replace
    return [plan.with_camera(_replace(plan.camera, c2w=tuple(c.c2w)))
            for c in cameras]


def _project(params, sigma_min: float):
    """Keep density physical (sigma >= sigma_min); color in [0, 1].
    Runs INSIDE the jitted step: as separate host-side dispatches it cost
    2 extra ~36 ms tunnel round trips per training step."""
    return (jnp.maximum(params[0], sigma_min), jnp.clip(params[1], 0.0, 1.0))


def _scheduled_views(plan: Plan, cameras: Sequence[CameraConfig], field,
                     mode: str):
    """Per-view plans + host-built schedules + a traced stack renderer
    (``render_stack(f, scheds) -> (V, H, W, 3)``).

    Tiled schedules use the fine-grid auto cascade (16 -> 8 -> 4 px
    sub-tiles, render/tiled.py::build_tiled_schedule_auto): training
    views are often coarser than the grid (e.g. 96^2 views of a 64^3
    grid are ~1.5 px/cell), where fixed 16px tables overflow and every
    step would pay the slow fallback path. All views build at ONE
    tile_px with quantized group shapes and merge into a single
    :class:`MergedViewSchedule` - one kernel call per (nc, nb) class
    serves every view, and the Mosaic variant set is shared (unmerged,
    8 views at 96^2/4px meant ~50 kernel calls over ~100 variants and
    >17 min of client trace+lowering per process)."""
    from dvren_tpu.render.pipeline import plan_jitter_table

    plans = view_plans(plan, cameras)
    jitter = plan_jitter_table(plan)
    if mode == "tiled":
        from dvren_tpu.render.tiled import (build_tiled_schedule,
                                            build_tiled_schedule_auto,
                                            merge_view_schedules,
                                            render_tiled_stack)
        from concurrent.futures import ThreadPoolExecutor

        # device=False: per-view schedules exist only to be MERGED -
        # keep them host-side (numpy leaves) so the merge concatenates
        # at memcpy speed and uploads once (a device-array merge cost
        # 81 s of per-concat tunnel dispatches at the fit flagship).
        # Views build in parallel threads (the native run packer and
        # numpy release the GIL; builds are pure host work here).
        s0, _ = build_tiled_schedule_auto(plans[0], field, jitter=jitter,
                                          quantize="uniform",
                                          device=False)

        def build_view(p, shape=None):
            return build_tiled_schedule(
                p, field, jitter=jitter, tile_px=s0.tile_px,
                quantize="uniform", cell_scale=s0.cell_scale,
                uniform_shape=shape, device=False)

        with ThreadPoolExecutor(min(8, max(len(plans) - 1, 1))) as ex:
            per_view = [s0] + list(ex.map(build_view, plans[1:]))
        # Pin every view to the GLOBAL (nc, nb) maxima so the merged
        # schedule is ONE group = one Mosaic kernel variant pair for
        # the whole multi-view step (per-view uniform shapes may differ;
        # the client-side Pallas trace/lowering of tens of variants
        # dominated the fit's cold wall-clock before quantization).
        shapes = {(g.n_chunks, g.banks) for s in per_view for g in s.groups}
        if len(shapes) > 1:
            nc_g = max(sh[0] for sh in shapes)
            nb_g = max(sh[1] for sh in shapes)
            todo = [i for i, s in enumerate(per_view)
                    if {(g.n_chunks, g.banks) for g in s.groups}
                    != {(nc_g, nb_g)}]
            with ThreadPoolExecutor(min(8, max(len(todo), 1))) as ex:
                rebuilt = list(ex.map(
                    lambda i: build_view(plans[i], (nc_g, nb_g)), todo))
            for i, s in zip(todo, rebuilt):
                per_view[i] = s
        # plans= so views with FALLBACK rays (slot overflow) regenerate
        # them under their own camera, not the base plan's
        scheds = merge_view_schedules(per_view, plans=plans)

        def render_stack(f, scheds):
            return render_tiled_stack(plan, f, scheds)
    elif mode == "windowed":
        from dvren_tpu.render.windowed import (build_stack_schedule,
                                               render_windowed_stack)
        # ONE merged schedule across views (bit-exact vs per-view
        # renders): a per-view loop instantiates V copies of every
        # pipeline op; the fit flagship's 8 views merge into one
        # 73728-ray group set with one compose.
        scheds = build_stack_schedule(plans, field.bbox_min,
                                      field.bbox_max, jitter=jitter)

        def render_stack(f, scheds):
            return render_windowed_stack(plan, f, scheds)
    else:
        raise ValueError(f"unknown scheduled mode: {mode}")
    return plans, scheds, render_stack


def make_train_step_scheduled(plan: Plan, cameras: Sequence[CameraConfig],
                              field, optimizer, mode: str = "tiled",
                              sigma_min: float = 0.0, views=None):
    """Fast-path training step: per-view host-built schedules (built once,
    replayed every step - the capture-specialization model), one compiled
    executable for the whole multi-view step.

    ``mode``: "tiled" (fused Pallas tile path, ops/fused_tiles.py) or
    "windowed" (bbox window replay). Both require a dense OOB_ZERO grid;
    tiled additionally requires trilinear interpolation. Schedules depend
    on the field's bbox + resolution only, so they stay valid across
    parameter updates.
    """
    plans, scheds, render_stack = views or _scheduled_views(
        plan, cameras, field, mode)

    def loss_fn(params, field, targets, scheds):
        f = field.with_params(*params) if isinstance(params, tuple) \
            else field.with_params(params)
        return mse(render_stack(f, scheds), targets)

    # schedules cross the jit boundary as pytree ARGUMENTS (embedding them
    # as closure constants bloats the HLO past remote-compile limits)
    @jax.jit
    def raw_step(params, field, opt_state, targets, scheds):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, field, targets, scheds)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = _project(optax.apply_updates(params, updates), sigma_min)
        return params, opt_state, loss

    def step(params, field, opt_state, targets):
        return raw_step(params, field, opt_state, targets, scheds)

    return step


def make_train_block_scheduled(plan: Plan, cameras: Sequence[CameraConfig],
                               field, optimizer, k: int,
                               mode: str = "tiled",
                               sigma_min: float = 0.0, views=None):
    """K optimizer steps per dispatch: ``lax.scan`` over the scheduled
    step (one executable, one device round trip, K per-step losses).
    Amortizes the tunnel's ~36 ms/dispatch + per-sync loss fetch across
    K steps - the fit analogue of bench.py's K-frames-per-jit rule.

    ``views``: a prebuilt ``_scheduled_views`` result, so several block
    lengths (e.g. the remainder block when ``steps % sync_every != 0``)
    share one host schedule build."""
    plans, scheds, render_stack = views or _scheduled_views(
        plan, cameras, field, mode)

    def loss_fn(params, field, targets, scheds):
        f = field.with_params(*params) if isinstance(params, tuple) \
            else field.with_params(params)
        return mse(render_stack(f, scheds), targets)

    @jax.jit
    def raw_block(params, field, opt_state, targets, scheds):
        def body(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                p, field, targets, scheds)
            updates, o = optimizer.update(grads, o, p)
            p = _project(optax.apply_updates(p, updates), sigma_min)
            return (p, o), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=k)
        return params, opt_state, losses

    def block(params, field, opt_state, targets):
        return raw_block(params, field, opt_state, targets, scheds)

    return block


def scheduled_mode_for(field) -> str | None:
    """Pick the fastest applicable schedule mode for a field (None when
    only the plain dense-lattice path applies)."""
    from dvren_tpu.core.plan import InterpMode, OobPolicy
    if not (hasattr(field, "bbox_min") and hasattr(field, "bbox_max")
            and hasattr(field, "with_params") and hasattr(field, "sigma")):
        return None
    if getattr(field, "oob", None) != OobPolicy.ZERO:
        return None
    try:
        shape = tuple(int(v) for v in np.asarray(field.sigma.shape[:3]))
    except Exception:
        return None
    if getattr(field.sigma, "ndim", 0) != 3 or min(shape) < 2:
        return None
    if getattr(field, "interp", None) == InterpMode.LINEAR:
        return "tiled"
    return "windowed"


def make_train_step(plan: Plan, cameras: Sequence[CameraConfig],
                    optimizer, param_labels=("sigma", "color"),
                    sigma_min: float | None = 0.0):
    """Build a jitted (field, opt_state, targets) -> (field, opt_state, loss)
    step. ``field`` must expose ``with_params`` over the trained leaves
    (DenseGridField) or be a params pytree (HashMLPField.params).
    ``sigma_min=None`` skips the in-step (sigma, color) projection (for
    non-grid param pytrees).
    """
    c2ws = jnp.stack([jnp.asarray(c.c2w, jnp.float32).reshape(3, 4)
                      for c in cameras])

    def loss_fn(params, field, targets):
        field = field.with_params(*params) if isinstance(params, tuple) \
            else field.with_params(params)

        def one(c2w):
            return render(plan, field, c2w=c2w).planes.image

        pred = jax.vmap(one)(c2ws)
        return mse(pred, targets)

    @jax.jit
    def step(params, field, opt_state, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, field, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if sigma_min is not None and isinstance(params, tuple):
            params = _project(params, sigma_min)
        return params, opt_state, loss

    return step


def fit_hash_mlp(plan: Plan, field, cameras: Sequence[CameraConfig],
                 targets: np.ndarray, config: FitConfig | None = None,
                 checkpoint_cb: Callable | None = None) -> FitResult:
    """Fit a HashMLPField (hash table + both MLP heads) to target views
    with Adam through the fused hash tile kernel (ops/hash_tiles.py) -
    the reference's hash-MLP is forward-only (hash_mlp_cpu.cpp; its CUDA
    kernels are dead code), so a hash-MLP *fit* is beyond-reference
    capability on a production fast path.

    The schedule is pure frame layout (no field capture), so
    ``schedule_build_s`` is milliseconds, and camera changes between
    fits cost nothing but a rebuild of that layout.
    """
    from dvren_tpu.render.hash_tiled import (build_hash_schedule_stack,
                                             render_hash_tiled_stack)

    config = config or FitConfig()
    optimizer = optax.adam(config.learning_rate)
    params = field.params
    opt_state = optimizer.init(params)
    t_build0 = time.perf_counter()
    stack = build_hash_schedule_stack(view_plans(plan, cameras))
    targets = jnp.asarray(targets, jnp.float32)

    def loss_fn(params, stack, targets):
        pred = render_hash_tiled_stack(plan, field.with_params(params),
                                       stack)
        return mse(pred, targets)

    @functools.partial(jax.jit, static_argnums=(4,))
    def raw_block(params, opt_state, targets, stack, k):
        def body(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, stack, targets)
            updates, o = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=k)
        return params, opt_state, losses

    result = FitResult(field=field, mode="hash_tiled")
    result.schedule_build_s = time.perf_counter() - t_build0
    k = max(int(config.sync_every), 1)
    t0 = time.perf_counter()
    n_full, rem = divmod(config.steps, k)
    blocks = [k] * n_full + ([rem] if rem else [])
    ckpts_fired = 0
    for i, blk in enumerate(blocks):
        params, opt_state, loss = raw_block(
            params, opt_state, targets, stack, blk)
        if i == 0:
            jax.block_until_ready(loss)
            result.first_step_s = time.perf_counter() - t0
        losses = np.asarray(loss, np.float64).reshape(-1)
        ps = [float(psnr(jnp.float32(lf))) for lf in losses]
        result.loss_history.extend(float(lf) for lf in losses)
        result.psnr_history.extend(ps)
        result.steps_run += blk
        if checkpoint_cb is not None:
            due = result.steps_run // max(config.log_every, 1)
            if due > ckpts_fired:
                ckpts_fired = due
                checkpoint_cb(field.with_params(params),
                              result.steps_run, ps[-1])
        if config.target_psnr is not None and ps[-1] >= config.target_psnr:
            result.reached_target = True
            break
    steps_s = time.perf_counter() - t0
    result.wall_clock_s = result.schedule_build_s + steps_s
    if result.steps_run > blocks[0]:
        result.steady_step_ms = ((steps_s - result.first_step_s)
                                 / (result.steps_run - blocks[0]) * 1e3)
    result.field = field.with_params(params)
    return result


def fit_dense_grid(plan: Plan, field, cameras: Sequence[CameraConfig],
                   targets: np.ndarray, config: FitConfig | None = None,
                   checkpoint_cb: Callable | None = None,
                   mode: str | None = None) -> FitResult:
    """Fit a DenseGridField's sigma+color to target views with Adam.

    targets: (V, H, W, 3) float32 ground-truth images.
    ``mode``: None (auto: fastest applicable schedule path - tiled for
    trilinear OOB_ZERO grids, windowed otherwise, plain dense lattice as
    the fallback), or an explicit "tiled" / "windowed" / "plain".
    """
    config = config or FitConfig()
    optimizer = optax.adam(config.learning_rate)
    params = (field.sigma, field.color)
    opt_state = optimizer.init(params)
    auto = mode is None
    if auto:
        mode = scheduled_mode_for(field) or "plain"
    t_build0 = time.perf_counter()
    views = None
    if mode in ("tiled", "windowed"):
        views = _scheduled_views(plan, cameras, field, mode)
    if auto and mode == "tiled":
        # Table-economy check: training views are often COARSE relative
        # to the grid (e.g. 96^2 views of 64^3 = ~1.5 px/cell), where the
        # auto cascade lands on 4px sub-tiles and the table economy
        # collapses (the fit flagship schedules 2.65M table slots for
        # 74k rays - 36 slots/ray vs 2.5 at the 512^2/64^3 headline).
        # Each slot costs ~5 x 128B of HBM traffic per train step
        # (gather write, fwd read, bwd read, d(tabs) write, relayout
        # read) vs one gathered row + recompute per lattice sample on
        # the windowed path, AND the merged tiled step's ~15 kernel
        # variants cost ~2 min of client trace/lowering per process
        # (not covered by the XLA compile cache). Measured at the fit
        # flagship: tiled 123 s to PSNR 35 vs windowed 43 s with steady
        # steps at parity (155 vs 168 ms). Prefer windowed when slot
        # traffic rivals the full lattice; explicit mode= overrides.
        # Slot traffic in CELL-STENCIL-equivalents: a supercell slot
        # (cell_scale=2) carries 108 table values where a cell slot
        # carries 32, so weight by width - the HBM cost per slot per
        # train step scales with the row bytes. Demote to the windowed
        # replay only when weighted slot traffic RIVALS the full
        # lattice: measured at the fit flagship (64^3, 8 views @ 96^2,
        # tools/supercell_probe.py), the supercell tiled step runs
        # 47 ms on-chip (817k slots, weighted 2.8M) vs the windowed
        # replay's ~150 ms over a 7.1M-sample lattice - the round-3
        # "3x slots > lattice" rule predated supercell tables and
        # wrongly demoted exactly this workload.
        wgt = 108 / 32 if views[1].sched.cell_scale == 2 else 1.0
        slots = sum(g.n_tiles * g.banks * 128
                    for g in views[1].sched.groups) * wgt
        lattice = sum(int(p.ray_count) * int(p.sampling.max_steps)
                      for p in views[0])
        if slots > lattice:
            mode = "windowed"
            views = _scheduled_views(plan, cameras, field, mode)
    k = max(int(config.sync_every), 1)
    if mode == "plain":
        k = 1
        step = make_train_step(plan, cameras, optimizer,
                               sigma_min=config.sigma_min)
    elif k > 1:
        step = make_train_block_scheduled(plan, cameras, field, optimizer,
                                          k, mode=mode,
                                          sigma_min=config.sigma_min,
                                          views=views)
    else:
        step = make_train_step_scheduled(plan, cameras, field, optimizer,
                                         mode=mode,
                                         sigma_min=config.sigma_min,
                                         views=views)
    targets = jnp.asarray(targets, jnp.float32)

    result = FitResult(field=field, mode=mode)
    result.schedule_build_s = time.perf_counter() - t_build0
    t0 = time.perf_counter()
    # Run EXACTLY config.steps optimizer steps: full k-step blocks plus
    # one remainder block (its own compiled executable - scan length is
    # static) when k does not divide steps.
    n_full, rem = divmod(config.steps, k)
    step_rem = None
    if rem and k > 1:
        step_rem = make_train_block_scheduled(
            plan, cameras, field, optimizer, rem, mode=mode,
            sigma_min=config.sigma_min, views=views)
    ckpts_fired = 0
    for i in range(n_full + (1 if rem else 0)):
        last = i == n_full  # the remainder block, if any
        blk = rem if (last and step_rem is not None) else k
        fn = step_rem if (last and step_rem is not None) else step
        # The (sigma >= 0, color in [0,1]) projection runs inside the
        # jitted step (host-side it cost 2 extra dispatches per step).
        params, opt_state, loss = fn(params, field, opt_state, targets)
        if i == 0:
            jax.block_until_ready(loss)
            result.first_step_s = time.perf_counter() - t0
        losses = (np.asarray(loss, np.float64).reshape(-1) if k > 1
                  else np.asarray([float(loss)]))
        ps = [float(psnr(jnp.float32(lf))) for lf in losses]
        result.loss_history.extend(float(lf) for lf in losses)
        result.psnr_history.extend(ps)
        result.steps_run += blk
        if checkpoint_cb is not None:
            # cadence in STEPS (blocks may be > 1 step each)
            due = result.steps_run // max(config.log_every, 1)
            if due > ckpts_fired:
                ckpts_fired = due
                checkpoint_cb(field.with_params(*params),
                              result.steps_run, ps[-1])
        if config.target_psnr is not None and ps[-1] >= config.target_psnr:
            result.reached_target = True
            break
    steps_s = time.perf_counter() - t0
    # wall_clock INCLUDES the schedule build (capture specialization is
    # part of the cost of a fit, exactly as CUDA-Graph capture would be)
    result.wall_clock_s = result.schedule_build_s + steps_s
    if result.steps_run > k:
        result.steady_step_ms = (
            (steps_s - result.first_step_s)
            / (result.steps_run - k) * 1e3)
    result.field = field.with_params(*params)
    return result
