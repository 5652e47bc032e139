"""Hash every array of built tile schedules across a config matrix -
byte-identity harness for host schedule-build refactors.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/sched_hash.py
Prints one line per config: a SHA256 over all schedule arrays + statics.
"""
from __future__ import annotations

import hashlib
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def _hash_schedule(s) -> str:
    import jax
    import numpy as np

    h = hashlib.sha256()
    leaves, treedef = jax.tree.flatten(s)
    h.update(str(treedef).encode())
    for leaf in leaves:
        a = np.asarray(leaf)
        h.update(str((a.shape, a.dtype)).encode())
        h.update(a.tobytes())
    return h.hexdigest()[:16]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from bench import _scene
    from dvren_tpu.render.pipeline import plan_jitter_table
    from dvren_tpu.render.tiled import build_tiled_schedule
    from dvren_tpu.fields.sparse_grid import SparseGridField

    configs = [
        # (width, grid, steps, tile_px, pitch, occupancy, quantize, sparse)
        (96, 16, 64, 16, 1, False, False, False),
        (96, 16, 64, 16, 2, False, False, False),
        (96, 32, 64, 8, 1, False, False, False),
        (96, 32, 64, 8, 2, True, False, False),
        (96, 32, 64, 4, 1, False, True, False),
        (64, 20, 48, 8, 2, False, False, True),
        (64, 21, 48, 8, 1, False, False, True),
    ]
    for (w, g, st, px, pitch, occ, q, sp) in configs:
        plan, field = _scene(w, w, g, st)
        if sp:
            field = SparseGridField.from_dense(field, threshold=0.0)
        sched = build_tiled_schedule(
            plan, field, jitter=plan_jitter_table(plan), tile_px=px,
            occupancy=occ, quantize=q, pitch=pitch)
        print(f"{w=} {g=} {st=} {px=} {pitch=} {occ=} {q=} {sp=} "
              f"-> {_hash_schedule(sched)}", flush=True)


if __name__ == "__main__":
    main()
