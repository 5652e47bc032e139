"""ctypes bindings for the native runtime library (libdvren_native.so).

Builds on demand with g++ (cached next to the source); all entry points
degrade gracefully - ``available()`` reports whether the library could be
built/loaded, and callers fall back to the pure-JAX/numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dvren_native.cpp")
_LIB = os.path.join(_DIR, "libdvren_native.so")

_lock = threading.Lock()
_lib = None
_load_error: str | None = None

_f32p = ctypes.POINTER(ctypes.c_float)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_longlong)


def _build() -> None:
    # -ffp-contract=off: the fused scheduler (dvn_build_runs) must match
    # numpy's f32 arithmetic BIT-exactly; a contracted mul+add FMA would
    # change float bits (schedules are verified byte-identical).
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
           "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _configure(lib) -> None:
    lib.dvn_abi_version.restype = ctypes.c_int
    lib.dvn_generate_rays.restype = ctypes.c_int
    lib.dvn_generate_rays.argtypes = [
        ctypes.c_int, _f32p, _f32p, ctypes.c_float,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        _f32p, _f32p, _f32p, _f32p, _u32p]
    lib.dvn_eval_grid.restype = ctypes.c_int
    lib.dvn_eval_grid.argtypes = [
        _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _f32p, _f32p, ctypes.c_int, ctypes.c_int,
        _f32p, ctypes.c_long, _f32p]
    lib.dvn_integrate.restype = ctypes.c_int
    lib.dvn_integrate.argtypes = [
        ctypes.c_long, ctypes.c_int, _f32p, _f32p, _f32p, _u8p,
        ctypes.c_float, ctypes.c_float, _f32p, _f32p, _f32p, _f32p, _f32p]
    lib.dvn_ray_offsets.restype = ctypes.c_long
    lib.dvn_ray_offsets.argtypes = [
        ctypes.c_long, ctypes.c_int, _u8p, _u32p]
    lib.dvn_pack_samples.restype = ctypes.c_long
    lib.dvn_pack_samples.argtypes = [
        ctypes.c_long, ctypes.c_int, ctypes.c_int, _u8p, _f32p, _f32p]
    lib.dvn_unpack_samples.restype = ctypes.c_long
    lib.dvn_unpack_samples.argtypes = [
        ctypes.c_long, ctypes.c_int, ctypes.c_int, _u8p, _f32p, _f32p]
    lib.dvn_write_ppm.restype = ctypes.c_int
    lib.dvn_write_ppm.argtypes = [
        ctypes.c_char_p, _f32p, ctypes.c_int, ctypes.c_int]
    lib.dvn_pack_runs.restype = ctypes.c_int
    lib.dvn_pack_runs.argtypes = [
        _i64p, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_int,
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        _i32p, _i32p, _i64p, _i32p, _i32p, _i64p, _i32p]
    lib.dvn_tighten_occupancy.restype = ctypes.c_int
    lib.dvn_tighten_occupancy.argtypes = [
        _f32p, _f32p, _i64p, _i64p, _f32p, ctypes.c_longlong,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, _f32p, _f32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _u8p, ctypes.c_longlong, _i32p, _i32p]
    lib.dvn_build_runs.restype = ctypes.c_int
    lib.dvn_build_runs.argtypes = [
        _f32p, _f32p, _i64p, _u8p, _i64p,
        ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int,
        _f32p, ctypes.c_longlong, ctypes.c_longlong,
        _f32p, _f32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_longlong, ctypes.c_int,
        _f32p, _f32p, _i32p, _i32p, _i64p, _i32p, _i32p, _i64p, _i32p]


def _get():
    global _lib, _load_error
    with _lock:
        if _lib is not None or _load_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            _configure(lib)
            if lib.dvn_abi_version() != 3:
                raise RuntimeError("native ABI version mismatch")
            _lib = lib
        except Exception as exc:  # pragma: no cover - toolchain-dependent
            _load_error = str(exc)
        return _lib


def available() -> bool:
    return _get() is not None


def load_error() -> str | None:
    _get()
    return _load_error


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctype)


def generate_rays(model: int, k: np.ndarray, c2w: np.ndarray,
                  ortho_scale: float, width: int, height: int,
                  roi, t_near: float, t_far: float):
    lib = _get()
    n = roi[2] * roi[3]
    origins = np.empty((n, 3), np.float32)
    dirs = np.empty((n, 3), np.float32)
    tn = np.empty(n, np.float32)
    tf = np.empty(n, np.float32)
    pids = np.empty(n, np.uint32)
    k = np.ascontiguousarray(k, np.float32).reshape(-1)
    c2w = np.ascontiguousarray(c2w, np.float32).reshape(-1)
    rc = lib.dvn_generate_rays(
        model, _ptr(k, _f32p), _ptr(c2w, _f32p), ortho_scale,
        width, height, roi[0], roi[1], roi[2], roi[3], t_near, t_far,
        _ptr(origins, _f32p), _ptr(dirs, _f32p), _ptr(tn, _f32p),
        _ptr(tf, _f32p), _ptr(pids, _u32p))
    if rc != 0:
        raise RuntimeError(f"dvn_generate_rays failed: {rc}")
    return origins, dirs, tn, tf, pids


def eval_grid(grid: np.ndarray, bbox_min, bbox_max, interp: int, oob: int,
              positions: np.ndarray) -> np.ndarray:
    lib = _get()
    grid = np.ascontiguousarray(grid, np.float32)
    scalar = grid.ndim == 3
    nz, ny, nx = grid.shape[:3]
    channels = 0 if scalar else grid.shape[3]
    positions = np.ascontiguousarray(positions, np.float32).reshape(-1, 3)
    n = positions.shape[0]
    out = np.empty((n, max(channels, 1)), np.float32)
    bmin = np.asarray(bbox_min, np.float32)
    bmax = np.asarray(bbox_max, np.float32)
    rc = lib.dvn_eval_grid(
        _ptr(grid, _f32p), nx, ny, nz, channels,
        _ptr(bmin, _f32p), _ptr(bmax, _f32p), interp, oob,
        _ptr(positions, _f32p), n, _ptr(out, _f32p))
    if rc != 0:
        raise RuntimeError(f"dvn_eval_grid failed: {rc}")
    return out[:, 0] if scalar else out


def integrate(sigma: np.ndarray, color: np.ndarray, dt: np.ndarray,
              mask: np.ndarray, t_near: float, t_far: float,
              want_aux: bool = False):
    lib = _get()
    n, k = sigma.shape
    sigma = np.ascontiguousarray(sigma, np.float32)
    color = np.ascontiguousarray(color, np.float32)
    dt = np.ascontiguousarray(dt, np.float32)
    mask8 = np.ascontiguousarray(mask, np.uint8)
    radiance = np.empty((n, 3), np.float32)
    trans = np.empty(n, np.float32)
    opacity = np.empty(n, np.float32)
    depth = np.empty(n, np.float32)
    aux = np.zeros((n, k, 4), np.float32) if want_aux else None
    rc = lib.dvn_integrate(
        n, k, _ptr(sigma, _f32p), _ptr(color, _f32p), _ptr(dt, _f32p),
        _ptr(mask8, _u8p), t_near, t_far,
        _ptr(radiance, _f32p), _ptr(trans, _f32p), _ptr(opacity, _f32p),
        _ptr(depth, _f32p),
        _ptr(aux, _f32p) if aux is not None else _f32p())
    if rc != 0:
        raise RuntimeError(f"dvn_integrate failed: {rc}")
    out = dict(radiance=radiance, transmittance=trans, opacity=opacity,
               depth=depth)
    if want_aux:
        out["aux"] = aux
    return out


def ray_offsets(mask: np.ndarray) -> np.ndarray:
    lib = _get()
    n, k = mask.shape
    mask8 = np.ascontiguousarray(mask, np.uint8)
    offsets = np.empty(n + 1, np.uint32)
    lib.dvn_ray_offsets(n, k, _ptr(mask8, _u8p), _ptr(offsets, _u32p))
    return offsets


def pack_samples(mask: np.ndarray, dense: np.ndarray) -> np.ndarray:
    """dense: (N, K) or (N, K, C) -> packed (M,) or (M, C)."""
    lib = _get()
    n, k = mask.shape
    scalar = dense.ndim == 2
    channels = 1 if scalar else dense.shape[2]
    mask8 = np.ascontiguousarray(mask, np.uint8)
    dense = np.ascontiguousarray(dense, np.float32)
    total = int(mask8.sum())
    packed = np.empty((total, channels), np.float32)
    got = lib.dvn_pack_samples(n, k, channels, _ptr(mask8, _u8p),
                               _ptr(dense, _f32p), _ptr(packed, _f32p))
    assert got == total
    return packed[:, 0] if scalar else packed


def unpack_samples(mask: np.ndarray, packed: np.ndarray) -> np.ndarray:
    lib = _get()
    n, k = mask.shape
    scalar = packed.ndim == 1
    channels = 1 if scalar else packed.shape[1]
    mask8 = np.ascontiguousarray(mask, np.uint8)
    packed = np.ascontiguousarray(packed, np.float32)
    dense = np.empty((n, k, channels), np.float32)
    lib.dvn_unpack_samples(n, k, channels, _ptr(mask8, _u8p),
                           _ptr(packed, _f32p), _ptr(dense, _f32p))
    return dense[..., 0] if scalar else dense


def write_ppm(path: str, image: np.ndarray) -> None:
    lib = _get()
    image = np.ascontiguousarray(image, np.float32)
    h, w, _ = image.shape
    rc = lib.dvn_write_ppm(path.encode(), _ptr(image, _f32p), w, h)
    if rc != 0:
        raise RuntimeError(f"dvn_write_ppm failed: {rc}")


def pack_runs(flat: np.ndarray, pitch: int, sentinel: int,
              umax: int, pmax: int):
    """Native tile-run packing (the scheduler's hot sort/unique/lane
    phase); see dvn_pack_runs in dvren_native.cpp and the byte-identical
    numpy reference render/tiled.py::_pack_runs_numpy."""
    lib = _get()
    flat = np.ascontiguousarray(flat, np.int64)
    rows, cols = flat.shape
    lidx = np.empty((rows, cols), np.int32)
    lanes_run = np.empty(rows, np.int32)
    ucell = np.empty((rows, umax), np.int64)
    ulane = np.empty((rows, umax), np.int32)
    n_u = np.empty(rows, np.int32)
    upair = np.empty((rows, pmax), np.int64)
    n_p = np.empty(rows, np.int32)
    rc = lib.dvn_pack_runs(
        _ptr(flat, _i64p), rows, cols, pitch, sentinel, umax, pmax,
        _ptr(lidx, _i32p), _ptr(lanes_run, _i32p), _ptr(ucell, _i64p),
        _ptr(ulane, _i32p), _ptr(n_u, _i32p), _ptr(upair, _i64p),
        _ptr(n_p, _i32p))
    if rc != 0:
        raise RuntimeError(f"dvn_pack_runs failed: {rc}")
    return lidx, lanes_run, ucell, ulane, n_u, upair, n_p


def build_runs(ot, dtn, safe_ids, live_r, ke, nc, n_sub, t_near, t_far,
               dt, nudge, k_max, jitter, jn, bbox_lo, inv_ext, grid_nxyz,
               pitch, sentinel, umax, pmax, cell_scale=1):
    """Fused native lattice + run-pack (the whole per-(tile, chunk)
    scheduler hot loop; dvn_build_runs). Returns (st_l, m_l, lidx,
    lanes_run, ucell, ulane, n_u, upair, n_p). ``cell_scale=2`` packs
    SUPERCELL ids and ORs each sample's cell-within-supercell bits into
    lidx at bit 16."""
    lib = _get()
    t_cnt = ot.shape[0]
    ot = np.ascontiguousarray(ot, np.float32)
    dtn = np.ascontiguousarray(dtn, np.float32)
    safe_ids = np.ascontiguousarray(safe_ids, np.int64)
    live_u8 = np.ascontiguousarray(live_r, np.uint8)
    ke = np.ascontiguousarray(ke, np.int64)
    nx, ny, nz = grid_nxyz
    rows = t_cnt * nc * n_sub
    sub_cols = (16 // n_sub) * 128
    st_l = np.empty((t_cnt, nc, 16, 128), np.float32)
    m_l = np.empty((t_cnt, nc, 16, 128), np.float32)
    lidx = np.empty((rows, sub_cols), np.int32)
    lanes_run = np.empty(rows, np.int32)
    ucell = np.empty((rows, umax), np.int64)
    ulane = np.empty((rows, umax), np.int32)
    n_u = np.empty(rows, np.int32)
    upair = np.empty((rows, pmax), np.int64)
    n_p = np.empty(rows, np.int32)
    if jitter is not None:
        jit = np.ascontiguousarray(jitter, np.float32)
        jptr, jk = _ptr(jit, _f32p), jit.shape[1]
    else:
        jptr, jk, jn = None, 0, 0
    lo = np.ascontiguousarray(bbox_lo, np.float32)
    inv = np.ascontiguousarray(inv_ext, np.float32)
    rc = lib.dvn_build_runs(
        _ptr(ot, _f32p), _ptr(dtn, _f32p), _ptr(safe_ids, _i64p),
        _ptr(live_u8, _u8p), _ptr(ke, _i64p),
        t_cnt, nc, n_sub, t_near, t_far, dt, nudge, k_max,
        jptr, jn, jk, _ptr(lo, _f32p), _ptr(inv, _f32p),
        nx, ny, nz, pitch, sentinel, umax, pmax, int(cell_scale),
        _ptr(st_l, _f32p), _ptr(m_l, _f32p), _ptr(lidx, _i32p),
        _ptr(lanes_run, _i32p), _ptr(ucell, _i64p), _ptr(ulane, _i32p),
        _ptr(n_u, _i32p), _ptr(upair, _i64p), _ptr(n_p, _i32p))
    if rc != 0:
        raise RuntimeError(f"dvn_build_runs failed: {rc}")
    return st_l, m_l, lidx, lanes_run, ucell, ulane, n_u, upair, n_p


def tighten_occupancy(o, d, ke, cnt, jitter, t_near, t_far, dt, nudge,
                      k_max, lo, inv_ext, grid_nxyz, cell_empty):
    """Native occupancy window tightening (dvn_tighten_occupancy):
    forward/backward scan to the first/last non-empty-cell step,
    skipping the interior."""
    lib = _get()
    n = o.shape[0]
    o = np.ascontiguousarray(o, np.float32)
    d = np.ascontiguousarray(d, np.float32)
    ke = np.ascontiguousarray(ke, np.int64)
    cnt = np.ascontiguousarray(cnt, np.int64)
    if jitter is not None:
        jit = np.ascontiguousarray(jitter, np.float32)
        jptr, jk = _ptr(jit, _f32p), jit.shape[1]
    else:
        jptr, jk = None, 0
    lo = np.ascontiguousarray(lo, np.float32)
    inv = np.ascontiguousarray(inv_ext, np.float32)
    empty_u8 = np.ascontiguousarray(cell_empty, np.uint8)
    nx, ny, nz = grid_nxyz
    ke_out = np.empty(n, np.int32)
    cnt_out = np.empty(n, np.int32)
    rc = lib.dvn_tighten_occupancy(
        _ptr(o, _f32p), _ptr(d, _f32p), _ptr(ke, _i64p),
        _ptr(cnt, _i64p), jptr, jk, t_near, t_far, dt, nudge, k_max,
        _ptr(lo, _f32p), _ptr(inv, _f32p), nx, ny, nz,
        _ptr(empty_u8, _u8p), n, _ptr(ke_out, _i32p),
        _ptr(cnt_out, _i32p))
    if rc != 0:
        raise RuntimeError(f"dvn_tighten_occupancy failed: {rc}")
    return ke_out, cnt_out
