"""Relay-safe timing helpers (CLAUDE.md environment hazard #3).

The axon relay acks ``block_until_ready`` before the chip executes and
serves value-identical calls from a cache, so on this tunnel you must
force completion by FETCHING output bytes per call and cycle DISTINCT
argument variants. One implementation, shared by bench.py and the
Renderer's per-stage stats probe (reference parity:
``src/render/renderer.cpp:258-385`` times stages wall-clock).
"""

from __future__ import annotations

import time


def fetch_probe(out) -> float:
    """Materialize one element of the first output leaf on the host -
    forces the execution to actually complete."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    probe = leaf.reshape(-1)[:1]
    return float(probe[0])


def time_compiled(fn, args_variants, iters, warmup=2):
    """Average seconds/call with per-call host fetch of one element and
    cycling argument variants (defeats async-ack and value caching)."""
    for i in range(warmup):
        fetch_probe(fn(*args_variants[i % len(args_variants)]))
    t0 = time.perf_counter()
    for i in range(iters):
        fetch_probe(fn(*args_variants[i % len(args_variants)]))
    return (time.perf_counter() - t0) / iters
