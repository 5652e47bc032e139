"""Image composition (img_cpu_basic / img_cpu_roi_background analogues;
img_cpu.cpp:110-188)."""

import numpy as np
import jax.numpy as jnp

from dvren_tpu.ops.compose import compose


def test_unique_pixels_scatter():
    w, h = 4, 3
    n = 5
    pids = jnp.asarray([0, 3, 5, 7, 11], jnp.int32)
    rad = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
    trans = jnp.asarray([0.1, 0.2, 0.3, 0.4, 0.5])
    opac = 1.0 - trans
    depth = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
    out = compose(pids, rad, trans, opac, depth, w, h, t_far=9.0)
    img = np.asarray(out.image).reshape(-1, 3)
    np.testing.assert_allclose(img[3], [3, 4, 5])
    np.testing.assert_allclose(img[1], 0.0)  # background
    t = np.asarray(out.transmittance).reshape(-1)
    assert t[1] == 1.0 and abs(t[0] - 0.1) < 1e-7
    o = np.asarray(out.opacity).reshape(-1)
    assert o[1] == 0.0 and abs(o[5] - 0.7) < 1e-6  # single-ray exact
    d = np.asarray(out.depth).reshape(-1)
    assert d[1] == 9.0 and d[7] == 4.0
    hm = np.asarray(out.hitmask).reshape(-1)
    np.testing.assert_array_equal(
        hm, [1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 1])


def test_colliding_rays_accumulate():
    """Multiple rays on one pixel: image sums, T multiplies, depth mins
    (img_cpu.cpp:177-184)."""
    pids = jnp.asarray([2, 2, 2], jnp.int32)
    rad = jnp.asarray([[0.1, 0.0, 0.0], [0.2, 0.0, 0.0], [0.3, 0.0, 0.0]])
    trans = jnp.asarray([0.5, 0.5, 0.8])
    opac = 1.0 - trans
    depth = jnp.asarray([3.0, 2.0, 4.0])
    out = compose(pids, rad, trans, opac, depth, 4, 1, t_far=9.0)
    np.testing.assert_allclose(
        np.asarray(out.image).reshape(-1, 3)[2], [0.6, 0, 0], rtol=1e-6)
    assert abs(float(out.transmittance.reshape(-1)[2]) - 0.2) < 1e-6
    assert abs(float(out.opacity.reshape(-1)[2]) - 0.8) < 1e-6
    assert float(out.depth.reshape(-1)[2]) == 2.0


def test_roi_background_planes():
    """Rays only cover an ROI; everything else keeps the background
    (img_cpu_roi_background analogue)."""
    w, h = 8, 6
    # ROI pixels: (y=2..3, x=1..2)
    pids, vals = [], []
    for y in (2, 3):
        for x in (1, 2):
            pids.append(y * w + x)
    n = len(pids)
    out = compose(
        jnp.asarray(pids, jnp.int32),
        jnp.full((n, 3), 0.25), jnp.full((n,), 0.5), jnp.full((n,), 0.5),
        jnp.full((n,), 1.5), w, h, t_far=7.0)
    hm = np.asarray(out.hitmask)
    assert hm.sum() == 4
    t = np.asarray(out.transmittance)
    assert t[0, 0] == 1.0 and t[2, 1] == 0.5
    d = np.asarray(out.depth)
    assert d[0, 0] == 7.0 and d[3, 2] == 1.5


def test_differentiable_through_compose():
    import jax

    def loss(rad):
        out = compose(jnp.asarray([0, 1], jnp.int32), rad,
                      jnp.asarray([0.5, 0.5]), jnp.asarray([0.5, 0.5]),
                      jnp.asarray([1.0, 1.0]), 2, 1, t_far=2.0)
        return jnp.sum(out.image ** 2)

    g = jax.grad(loss)(jnp.asarray([[0.3, 0.1, 0.2], [0.4, 0.5, 0.6]]))
    np.testing.assert_allclose(
        np.asarray(g), 2 * np.asarray([[0.3, 0.1, 0.2], [0.4, 0.5, 0.6]]),
        rtol=1e-6)
