"""Dense grid field evaluation (samp_cpu_oob_zero / samp_cpu_oob_clamp
analogues; grid_dense_cpu.cpp:56-245)."""

import numpy as np
import jax
import jax.numpy as jnp

from dvren_tpu.core.plan import InterpMode, OobPolicy
from dvren_tpu.ops.grid import eval_grid, scatter_grid_grads
from tests import oracle


def rand_grid(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, shape).astype(np.float32))


def test_corner_values_exact():
    grid = rand_grid((3, 4, 5))  # (Z, Y, X)
    nz, ny, nx = grid.shape
    g = np.asarray(grid)
    pts, expect = [], []
    for iz in range(nz):
        for iy in range(ny):
            for ix in range(nx):
                pts.append([ix / (nx - 1), iy / (ny - 1), iz / (nz - 1)])
                expect.append(g[iz, iy, ix])
    got = eval_grid(grid, jnp.asarray(pts, jnp.float32), (0, 0, 0), (1, 1, 1))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-6)


def test_matches_scalar_oracle_random_points():
    grid = rand_grid((4, 5, 6), seed=2)
    pts = np.random.default_rng(3).uniform(-0.2, 1.2, (64, 3)).astype(np.float32)
    for interp, imode in ((InterpMode.LINEAR, "linear"),
                          (InterpMode.NEAREST, "nearest")):
        for oob, omode in ((OobPolicy.ZERO, "zero"),
                           (OobPolicy.CLAMP, "clamp")):
            got = np.asarray(eval_grid(
                grid, jnp.asarray(pts), (0, 0, 0), (1, 1, 1), interp, oob))
            expect = [oracle.trilinear(np.asarray(grid), p, (0, 0, 0),
                                       (1, 1, 1), imode, omode) for p in pts]
            np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6,
                                       err_msg=f"{interp} {oob}")


def test_vector_field_channels():
    grid = rand_grid((3, 3, 3, 3), seed=5)
    pts = np.random.default_rng(6).uniform(0, 1, (16, 3)).astype(np.float32)
    got = np.asarray(eval_grid(grid, jnp.asarray(pts), (0, 0, 0), (1, 1, 1)))
    assert got.shape == (16, 3)
    for c in range(3):
        expect = [oracle.trilinear(np.asarray(grid)[..., c], p,
                                   (0, 0, 0), (1, 1, 1)) for p in pts]
        np.testing.assert_allclose(got[:, c], expect, rtol=1e-5, atol=1e-6)


def test_custom_bbox():
    grid = rand_grid((4, 4, 4), seed=7)
    bbox_min, bbox_max = (-1.0, 0.0, 2.0), (1.0, 2.0, 4.0)
    pts = np.random.default_rng(8).uniform(
        [-1, 0, 2], [1, 2, 4], (32, 3)).astype(np.float32)
    got = np.asarray(eval_grid(grid, jnp.asarray(pts), bbox_min, bbox_max))
    expect = [oracle.trilinear(np.asarray(grid), p, bbox_min, bbox_max)
              for p in pts]
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_oob_zero_outside_is_zero():
    grid = jnp.ones((2, 2, 2), jnp.float32)
    pts = jnp.asarray([[1.5, 0.5, 0.5], [-0.1, 0.5, 0.5], [0.5, 0.5, 0.5]])
    got = np.asarray(eval_grid(grid, pts, (0, 0, 0), (1, 1, 1),
                               InterpMode.LINEAR, OobPolicy.ZERO))
    np.testing.assert_allclose(got, [0.0, 0.0, 1.0])


def test_oob_clamp_outside_is_edge():
    grid = rand_grid((3, 3, 3), seed=9)
    got = np.asarray(eval_grid(
        grid, jnp.asarray([[2.0, 0.5, 0.5]]), (0, 0, 0), (1, 1, 1),
        InterpMode.LINEAR, OobPolicy.CLAMP))
    expect = np.asarray(eval_grid(
        grid, jnp.asarray([[1.0, 0.5, 0.5]]), (0, 0, 0), (1, 1, 1)))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_grad_wrt_grid_is_trilinear_scatter():
    """vjp of eval == 8-corner weight scatter (dense_grid.cpp:248-305)."""
    shape = (3, 3, 3)
    p = np.array([[0.3, 0.6, 0.4]], np.float32)
    g = scatter_grid_grads(shape, jnp.asarray(p), jnp.asarray([2.0]),
                           (0, 0, 0), (1, 1, 1))
    g = np.asarray(g)
    # weights: lattice coords (0.6, 1.2, 0.8) -> base (0,1,0), frac (.6,.2,.8)
    tx, ty, tz = 0.6, 0.2, 0.8
    w = {
        (0, 1, 0): (1 - tx) * (1 - ty) * (1 - tz),
        (1, 1, 0): tx * (1 - ty) * (1 - tz),
        (0, 2, 0): (1 - tx) * ty * (1 - tz),
        (1, 2, 0): tx * ty * (1 - tz),
        (0, 1, 1): (1 - tx) * (1 - ty) * tz,
        (1, 1, 1): tx * (1 - ty) * tz,
        (0, 2, 1): (1 - tx) * ty * tz,
        (1, 2, 1): tx * ty * tz,
    }
    total = np.zeros(shape, np.float32)
    for (ix, iy, iz), wt in w.items():
        total[iz, iy, ix] += 2.0 * wt
    np.testing.assert_allclose(g, total, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(g.sum(), 2.0, rtol=1e-6)


def test_grad_wrt_positions_finite_difference():
    grid = rand_grid((5, 5, 5), seed=11)
    p0 = jnp.asarray([0.31, 0.52, 0.47], jnp.float32)

    def f(p):
        return eval_grid(grid, p, (0, 0, 0), (1, 1, 1))

    g = np.asarray(jax.grad(f)(p0))
    eps = 1e-3
    for axis in range(3):
        d = np.zeros(3, np.float32)
        d[axis] = eps
        fd = (float(f(p0 + d)) - float(f(p0 - d))) / (2 * eps)
        assert abs(g[axis] - fd) < 1e-2, axis
