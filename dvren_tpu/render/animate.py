"""Moving-camera rendering at fixed per-frame cost on the fused tile path.

The tile schedule is capture-specialized: its group shapes, slot counts
and static metadata all depend on the camera, so the naive per-frame
flow (rebuild + render) retraces and recompiles the render program for
EVERY pose - measured 10.8 s/frame at 512^2/64^3 in round 4
(ANIM_r04.json) against a 36 ms dispatch. The reference's normal mode
is per-frame re-capture (``tests/render/test_smoke_animation.cpp:211`` -
its CUDA-Graph is re-captured per scene change), so pose sweeps must be
cheap.

:class:`MovingCameraRenderer` makes every camera's schedule STRUCTURALLY
IDENTICAL so one jitted executable replays all poses:

- ``build_tiled_schedule(quantize="uniform", uniform_shape=(nc, nb),
  all_tiles=True)`` pins the single group's (chunk count, bank count)
  and includes every image tile (dead tiles are fully masked - bit-exact
  backgrounds), making every array leaf's shape a pure function of the
  plan geometry;
- :func:`canonical_stats` zeroes the camera-dependent STATISTICS in the
  static pytree metadata (per-group ``samples``, ``tiled_samples``) and
  strips the backward gather plan (whose count-class structure is
  content-dependent), so the jit cache key is also camera-independent.

Per-frame cost = host schedule build + one batched upload + one
dispatch. Forward-only: training under camera motion rebuilds the full
schedule (the backward's gather-transpose plan is content-addressed).
"""

from __future__ import annotations

import dataclasses

import jax

from dvren_tpu.core.plan import Plan
from dvren_tpu.core.status import check
from dvren_tpu.render.pipeline import plan_jitter_table
from dvren_tpu.render.tiled import build_tiled_schedule, render_tiled


def canonical_stats(sched):
    """A copy of ``sched`` whose camera-dependent aux STATISTICS are
    zeroed and whose backward gather plan is stripped.

    The stats (``tiled_samples``, per-group ``samples``) are static
    pytree metadata, so two cameras' schedules - identical in every
    array shape - would still miss the jit cache on them; they carry no
    compute. The gather plan only feeds the backward's gather-transpose
    (render/tiled.py::ct16_rows_to_table16); without it the forward
    takes the flat-table chain (bit-identical images)."""
    groups = tuple(dataclasses.replace(g, samples=0)
                   for g in sched.groups)
    return dataclasses.replace(sched, groups=groups, tiled_samples=0,
                               gather_plan=None)


def _plan_geometry(plan: Plan) -> tuple:
    roi = plan.roi
    return (plan.width, plan.height, float(plan.t_near),
            float(plan.t_far), float(plan.sampling.dt),
            int(plan.sampling.max_steps), int(plan.sampling.mode),
            int(plan.seed), (roi.x, roi.y, roi.width, roi.height))


class MovingCameraRenderer:
    """One compiled render, any camera (see module docstring).

    ``uniform_shape=(nc, nb)``: the pinned (chunk count, bank count)
    class; defaults to the base plan's own maxima plus one bank of
    headroom (a pose whose maxima exceed the pin raises - re-create with
    a larger pin, paying one recompile). ``headroom=(dc, db)`` widens
    the auto-probed pin.

    >>> r = MovingCameraRenderer(plan0, field)
    >>> planes = r.render(plan_for(pose), field)     # no retrace
    """

    def __init__(self, base_plan: Plan, field, uniform_shape=None,
                 pitch: int = 1, headroom=(1, 1)):
        self._geom = _plan_geometry(base_plan)
        self._jitter = plan_jitter_table(base_plan)
        if uniform_shape is None:
            probe = build_tiled_schedule(
                base_plan, field, jitter=self._jitter,
                quantize="uniform", pitch=pitch, device=False,
                build_fallback=False)
            check(probe.fallback_rays == 0,
                  "camera-stable schedules need zero overflow rays at "
                  "the base pose (finer tile_px or occupancy may help)")
            g = probe.groups[0]
            uniform_shape = (min(g.n_chunks + int(headroom[0]),
                                 -(-base_plan.sampling.max_steps // 8)),
                             g.banks + int(headroom[1]))
        self.uniform_shape = (int(uniform_shape[0]),
                              int(uniform_shape[1]))
        self._pitch = pitch
        self._render = jax.jit(
            lambda f, s, _p=base_plan: render_tiled(_p, f, s))
        self._treedef = None

    def schedule_for(self, plan: Plan, field):
        """The camera-stable schedule for ``plan`` (device-resident,
        stats-canonicalized). Raises if the pose needs more chunks or
        banks than the pinned ``uniform_shape``."""
        check(_plan_geometry(plan) == self._geom,
              "MovingCameraRenderer: plan differs from the base plan "
              "beyond the camera (rebuild the renderer)")
        sched = build_tiled_schedule(
            plan, field, jitter=self._jitter,
            quantize="uniform", uniform_shape=self.uniform_shape,
            all_tiles=True, pitch=self._pitch)
        check(sched.fallback_rays == 0,
              "camera-stable schedules need zero overflow rays")
        sched = canonical_stats(sched)
        treedef = jax.tree_util.tree_structure(sched)
        if self._treedef is None:
            self._treedef = treedef
        else:
            check(treedef == self._treedef,
                  "schedule structure changed across cameras (a tile "
                  "class shifted) - should be impossible under "
                  "all_tiles + a pinned uniform_shape")
        return sched

    def render(self, plan: Plan, field):
        """ImagePlanes for ``plan``'s camera: host build + one upload +
        one dispatch through the shared executable."""
        return self._render(field, self.schedule_for(plan, field))

    def cache_size(self) -> int:
        """Number of compiled variants behind :meth:`render` (1 after
        the first frame if the camera-stability contract holds)."""
        return self._render._cache_size()
