"""Independent per-pixel reference integrator (pure numpy + python loops).

Plays the role of the reference's independent oracle
(``tests/render/smoke_test_utils.hpp``: VolumeSampler + IntegratePixel): a
completely separate implementation of the same mathematical contract
(DESIGN_SPECIFICATION.md:87-94), written scalar-sequentially so it shares no
code with the vectorized JAX pipeline it validates.
"""

from __future__ import annotations

import math

import numpy as np


def trilinear(grid: np.ndarray, p, bbox_min, bbox_max, interp="linear",
              oob="zero"):
    """grid: (Z, Y, X) or (Z, Y, X, C); p: world xyz."""
    scalar = grid.ndim == 3
    nz, ny, nx = grid.shape[:3]
    local = []
    outside = False
    for i in range(3):
        ext = bbox_max[i] - bbox_min[i]
        c = (p[i] - bbox_min[i]) / ext if ext != 0.0 else 0.0
        if c < 0.0 or c > 1.0:
            outside = True
        local.append(c)
    if oob == "clamp":
        local = [min(max(c, 0.0), 1.0) for c in local]
        outside = False
    if outside:
        return 0.0 if scalar else np.zeros(grid.shape[3])
    fx = local[0] * (nx - 1)
    fy = local[1] * (ny - 1)
    fz = local[2] * (nz - 1)
    if interp == "nearest":
        ix = min(max(int(math.floor(fx + 0.5)), 0), nx - 1)
        iy = min(max(int(math.floor(fy + 0.5)), 0), ny - 1)
        iz = min(max(int(math.floor(fz + 0.5)), 0), nz - 1)
        return grid[iz, iy, ix]
    ix0, iy0, iz0 = int(math.floor(fx)), int(math.floor(fy)), int(math.floor(fz))
    ix1, iy1, iz1 = min(ix0 + 1, nx - 1), min(iy0 + 1, ny - 1), min(iz0 + 1, nz - 1)
    tx, ty, tz = fx - ix0, fy - iy0, fz - iz0

    def at(ix, iy, iz):
        return grid[iz, iy, ix]

    c00 = at(ix0, iy0, iz0) * (1 - tx) + at(ix1, iy0, iz0) * tx
    c10 = at(ix0, iy1, iz0) * (1 - tx) + at(ix1, iy1, iz0) * tx
    c01 = at(ix0, iy0, iz1) * (1 - tx) + at(ix1, iy0, iz1) * tx
    c11 = at(ix0, iy1, iz1) * (1 - tx) + at(ix1, iy1, iz1) * tx
    c0 = c00 * (1 - ty) + c10 * ty
    c1 = c01 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz


def pinhole_ray(px, py, K, c2w):
    u, v = px + 0.5, py + 0.5
    d = np.array([(u - K[0][2]) / K[0][0], (v - K[1][2]) / K[1][1], 1.0])
    R = np.array(c2w).reshape(3, 4)[:, :3]
    t = np.array(c2w).reshape(3, 4)[:, 3]
    dw = R @ d
    dw = dw / max(np.linalg.norm(dw), 1e-30)
    return t, dw


def integrate_pixel(origin, direction, t_near, t_far, dt, max_steps,
                    sigma_grid, color_grid, bbox_min, bbox_max,
                    jitter_fn=None, interp="linear", oob="zero",
                    plan_t_near=None):
    """Sequential march of one ray; returns dict of outputs.

    ``jitter_fn(step) -> [0,1]`` defaults to 0.5 (fixed mode).
    """
    if plan_t_near is None:
        plan_t_near = t_near
    T = 1.0
    color_acc = np.zeros(3)
    depth_weighted = 0.0
    t_cursor = plan_t_near
    n_samples = 0
    for step in range(max_steps):
        base_t = t_near + step * dt
        if base_t >= t_far:
            break
        jit = 0.5 if jitter_fn is None else min(max(jitter_fn(step), 0.0), 1.0)
        sample_t = base_t + jit * dt
        if sample_t >= t_far:
            sample_t = np.nextafter(t_far, t_near)
        dt_actual = min(base_t + dt, t_far) - base_t
        if not dt_actual > 0.0:
            continue
        n_samples += 1
        p = origin + direction * sample_t
        sig = float(trilinear(sigma_grid, p, bbox_min, bbox_max, interp, oob))
        col = np.asarray(
            trilinear(color_grid, p, bbox_min, bbox_max, interp, oob))

        od = sig * dt_actual
        if od <= 0.0:
            alpha = 0.0
        elif od < 1e-4:
            alpha = od * (1.0 - 0.5 * od)
        else:
            alpha = min(max(-math.expm1(-od), 0.0), 1.0)

        weight = T * alpha
        color_acc += weight * col
        depth_weighted += weight * (t_cursor + 0.5 * dt_actual)
        T *= max(1.0 - alpha, 0.0)
        t_cursor += dt_actual
        if T <= 1e-4:
            break
    opacity = 1.0 - T
    depth = depth_weighted / opacity if opacity > 1e-6 else t_far
    return dict(radiance=color_acc, transmittance=T, opacity=opacity,
                depth=depth, samples=n_samples)


def render_forward(width, height, K, c2w, t_near, t_far, dt, max_steps,
                   sigma_grid, color_grid, bbox_min=(0, 0, 0),
                   bbox_max=(1, 1, 1), interp="linear", oob="zero",
                   jitter_fn=None):
    """Full-frame pinhole forward; returns (H,W,...) planes."""
    image = np.zeros((height, width, 3))
    trans = np.ones((height, width))
    opac = np.zeros((height, width))
    depth = np.full((height, width), t_far)
    hit = np.zeros((height, width), np.uint32)
    for py in range(height):
        for px in range(width):
            o, d = pinhole_ray(px, py, K, c2w)
            jf = None
            if jitter_fn is not None:
                ray_idx = py * width + px
                jf = lambda step, r=ray_idx: jitter_fn(r, step)
            out = integrate_pixel(o, d, t_near, t_far, dt, max_steps,
                                  sigma_grid, color_grid, bbox_min, bbox_max,
                                  jitter_fn=jf, interp=interp, oob=oob)
            image[py, px] = out["radiance"]
            trans[py, px] = out["transmittance"]
            opac[py, px] = out["opacity"]
            depth[py, px] = out["depth"]
            hit[py, px] = 1
    return dict(image=image, transmittance=trans, opacity=opac,
                depth=depth, hitmask=hit)
