import numpy as np
import jax.numpy as jnp

from drt_tpu.camera import camera_rays, look_at, pixel_grid
from reference_impl import MirrorCamera, Tape


def test_look_at_reference_basis():
    """The sample app's look_at yields right=(-1,0,0): x-mirrored image
    (reference: camera.hpp:29-37, src/render.cpp:65)."""
    cam = look_at([0, 0, 0], [0, 0, 1], dtype=jnp.float64)
    np.testing.assert_allclose(cam.forward, [0, 0, 1])
    np.testing.assert_allclose(cam.right, [-1, 0, 0], atol=1e-15)
    np.testing.assert_allclose(cam.up, [0, 1, 0], atol=1e-15)


def test_rays_match_mirror():
    w, h = 7, 5
    mc = MirrorCamera(w, h)
    mc.look_at([0.0, 0.0, 0.0], [0.0, 0.0, 1.0])
    n = w * h
    tape = Tape(np.random.default_rng(42), n, 1)
    dirs = np.zeros((n, 3))
    ray = 0
    for y in range(h):
        for x in range(w):
            d, pdf = mc.sample(x, y, tape, ray)
            dirs[ray] = d
            assert pdf == 1.0
            ray += 1

    cam = look_at([0, 0, 0], [0, 0, 1], dtype=jnp.float64)
    xy = pixel_grid(w, h)
    o, d, pdf = camera_rays(cam, w, h, xy, jnp.asarray(tape.cam_u))
    np.testing.assert_allclose(np.asarray(d.to_array()), dirs, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(o.to_array()), 0.0)
    np.testing.assert_allclose(np.asarray(pdf), 1.0)


def test_t_axis_points_down():
    """y=0 must be the TOP row (image t-axis uses -up, camera.hpp:57)."""
    cam = look_at([0, 0, 0], [0, 0, 1], dtype=jnp.float64)
    xy = jnp.asarray([[3, 0], [3, 7]], dtype=jnp.int32)
    u = jnp.full((2, 2), 0.5)
    _, d, _ = camera_rays(cam, 8, 8, xy, u)  # d: V3 of f[N]
    assert d.y[0] > 0  # top row looks up (+y)
    assert d.y[1] < 0
