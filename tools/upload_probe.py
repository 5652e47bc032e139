"""Does a pytree-level jax.device_put batch into one relay roundtrip?

ANIM_r04 showed the 512^2 tiled schedule "build" is ~1.7 s host-side
(cProfile) but 6.7 s measured on the tunnel: the ~130 per-leaf
device_put calls each pay the ~36 ms relay dispatch. This probe times
(a) leaf-by-leaf puts, (b) ONE device_put over the whole list, and (c)
one put of a single concatenated buffer of the same total bytes, for a
synthetic 130-leaf schedule-shaped tree.

Usage: python tools/upload_probe.py
"""
from __future__ import annotations

import os as _os, sys as _sys, time
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    def log(m): print(f"[upload] {m}", file=_sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    # schedule-shaped leaves: a few MB each, mixed dtypes
    leaves = []
    for i in range(130):
        n = int(rng.integers(64, 1 << 18))
        dt = [np.float32, np.int32, np.uint16][i % 3]
        leaves.append(rng.integers(0, 1000, size=n).astype(dt))
    total_mb = sum(a.nbytes for a in leaves) / 1e6
    log(f"device={jax.devices()[0]} leaves={len(leaves)} "
        f"total={total_mb:.1f} MB")

    def fetch(xs):
        for x in xs:
            np.asarray(x)

    # (a) leaf by leaf
    t0 = time.perf_counter()
    dev = [jax.device_put(a) for a in leaves]
    fetch(dev[-1:])
    t_leaf = time.perf_counter() - t0
    log(f"leaf-by-leaf: {t_leaf:.2f} s "
        f"({t_leaf / len(leaves) * 1e3:.1f} ms/leaf)")
    del dev

    # (b) one tree-level put (vary data so the relay can't hit its
    # value cache)
    leaves_b = [a + 1 for a in leaves]
    t0 = time.perf_counter()
    dev = jax.device_put(leaves_b)
    fetch(dev[-1:])
    t_tree = time.perf_counter() - t0
    log(f"tree-level: {t_tree:.2f} s")
    del dev

    # (c) one concatenated buffer of the same bytes
    cat = np.concatenate([(a + 2).view(np.uint8).reshape(-1)
                          for a in leaves])
    t0 = time.perf_counter()
    dev = jax.device_put(cat)
    fetch([dev])
    t_cat = time.perf_counter() - t0
    log(f"concat single buffer: {t_cat:.2f} s ({cat.nbytes / 1e6:.1f} MB)")

    import json
    print(json.dumps({"leaves": len(leaves), "total_MB": round(total_mb, 1),
                      "leaf_by_leaf_s": round(t_leaf, 2),
                      "tree_level_s": round(t_tree, 2),
                      "concat_s": round(t_cat, 2)}))


if __name__ == "__main__":
    main()
