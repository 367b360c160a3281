import numpy as np
import jax
import jax.numpy as jnp

from drt_tpu.ops.intersect import intersect_scene
from drt_tpu.scene import SceneBuilder
from drt_tpu.models import cbox
from drt_tpu.ops.vecmath import V3
from reference_impl import build_cbox, MirrorTracer


def test_cbox_nearest_hit_matches_mirror():
    scene, params, _ = cbox.build(dtype=jnp.float64)
    mirror = MirrorTracer(build_cbox(), 0.5, 1)
    rng = np.random.default_rng(7)
    n = 256
    o = rng.normal(size=(n, 3)) * 0.5
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit = intersect_scene(scene, V3.from_array(jnp.asarray(o)),
                          V3.from_array(jnp.asarray(d)),
                          emit_sentinel=params.emission.shape[0])
    pts = np.asarray(hit.point.to_array())
    nrm = np.asarray(hit.normal.to_array())
    for i in range(n):
        mh = mirror.raycast(o[i], d[i])
        if mh is None:
            assert not bool(hit.valid[i])
            continue
        point, normal, shape = mh
        assert bool(hit.valid[i])
        np.testing.assert_allclose(pts[i], point, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(nrm[i], normal, rtol=1e-10, atol=1e-12)


def test_sphere_inside_outside():
    b = SceneBuilder()
    m = b.diffuse(b.albedo_param([1, 1, 1]))
    b.sphere([0.0, 0.0, 5.0], 1.0, m)
    scene, params = b.build(jnp.float64)
    o = V3.from_array(jnp.asarray(
        [[0.0, 0.0, 0.0], [0.0, 0.0, 5.0], [0.0, 0.0, 10.0]]))
    d = V3.from_array(jnp.asarray([[0.0, 0.0, 1.0]] * 3))
    hit = intersect_scene(scene, o, d, emit_sentinel=0)
    np.testing.assert_allclose(hit.t, [4.0, 1.0, np.inf])
    assert list(map(bool, hit.valid)) == [True, True, False]


def test_triangle_moller_trumbore():
    b = SceneBuilder()
    m = b.diffuse(b.albedo_param([1, 1, 1]))
    b.triangle([0, 0, 2], [2, 0, 2], [0, 2, 2], m)
    scene, params = b.build(jnp.float64)
    o = V3.from_array(jnp.zeros((4, 3)).at[:, 0:2].set(
        jnp.asarray([[0.5, 0.5], [1.5, 1.5], [-0.1, 0.5], [0.0, 0.0]])))
    d = V3.from_array(jnp.asarray([[0.0, 0.0, 1.0]] * 4))
    hit = intersect_scene(scene, o, d, emit_sentinel=0)
    assert list(map(bool, hit.valid)) == [True, False, False, True]
    np.testing.assert_allclose(hit.t[0], 2.0)
    np.testing.assert_allclose(np.abs(hit.normal.to_array()[0]), [0, 0, 1],
                               atol=1e-15)


def test_keep_first_tie():
    """Two identical spheres: the first in scene order wins the tie
    (reference: pathtracer.hpp:79 `t >= tmin` skips)."""
    b = SceneBuilder()
    m1 = b.diffuse(b.albedo_param([1, 0, 0]))
    m2 = b.diffuse(b.albedo_param([0, 1, 0]))
    b.sphere([0.0, 0.0, 5.0], 1.0, m1)
    b.sphere([0.0, 0.0, 5.0], 1.0, m2)
    scene, params = b.build(jnp.float64)
    hit = intersect_scene(scene, V3.from_array(jnp.zeros((1, 3))),
                          V3.from_array(jnp.asarray([[0.0, 0.0, 1.0]])),
                          emit_sentinel=0)
    assert int(hit.mat[0]) == 0


def test_scan_intersect_matches_unrolled(monkeypatch):
    """The lax.scan-over-shapes sweep (large scenes) must match the
    Python-unrolled chain exactly on the same rays."""
    import drt_tpu.ops.intersect as isect
    from drt_tpu.models import cbox
    from drt_tpu.camera import camera_rays, pixel_grid

    scene, params, cam = cbox.build(dtype=jnp.float32)
    xy = jnp.tile(pixel_grid(16, 12), (2, 1))
    cu = jax.random.uniform(jax.random.key(0), (xy.shape[0], 2),
                            dtype=jnp.float32)
    o, d, _ = camera_rays(cam, 16, 12, xy, cu)

    hit_unrolled = isect.intersect_scene(scene, o, d, emit_sentinel=1)
    monkeypatch.setattr(isect, "UNROLL_MAX_SHAPES", 0)
    hit_scan = isect.intersect_scene(scene, o, d, emit_sentinel=1)
    # XLA contracts mul+add to fma differently in the fused unrolled
    # chain vs the scan body -> f32 results differ by ~1 ulp.
    np.testing.assert_allclose(np.asarray(hit_unrolled.t),
                               np.asarray(hit_scan.t), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit_unrolled.mat),
                                  np.asarray(hit_scan.mat))
    np.testing.assert_array_equal(np.asarray(hit_unrolled.emit),
                                  np.asarray(hit_scan.emit))
    for a, b in zip(hit_unrolled.normal, hit_scan.normal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-6)


def test_large_triangle_scene_renders():
    """A scene past UNROLL_MAX_SHAPES (scan path) renders and
    differentiates — capability beyond the reference's 9-shape demo."""
    import math

    from drt_tpu.config import RenderConfig
    from drt_tpu.parallel.render import make_renderer
    from drt_tpu.scene import SceneBuilder
    from drt_tpu.camera import look_at

    b = SceneBuilder()
    white = b.albedo_param([0.5, 0.5, 0.5])
    diffuse = b.diffuse(white)
    emission = b.emission_param([2.0, 2.0, 2.0])
    # 30-sided triangle fan approximating a disk facing the camera.
    n_tri = 30
    for i in range(n_tri):
        a0 = 2 * math.pi * i / n_tri
        a1 = 2 * math.pi * (i + 1) / n_tri
        b.triangle([0.0, 0.0, 4.0],
                   [2 * math.cos(a1), 2 * math.sin(a1), 4.0],
                   [2 * math.cos(a0), 2 * math.sin(a0), 4.0],
                   diffuse)
    b.plane([0.0, 1.0, 0.0], -3.0, diffuse)
    b.sphere([0.0, 3.0, 2.0], 1.0, None, emission)
    scene, params = b.build(jnp.float32)
    assert scene.num_shapes > 24  # exercises the scan path
    cam = look_at([0.0, 0.0, 0.0], [0.0, 0.0, 1.0], dtype=jnp.float32)

    cfg = RenderConfig(width=16, height=12, spp=4, max_depth=3)
    render = make_renderer(scene, cfg, cam, differentiable=True,
                           backend="xla")
    img = np.asarray(render(params, jax.random.key(0)))
    assert np.isfinite(img).all() and img.mean() > 0
    g = jax.grad(lambda p: render(p, jax.random.key(1)).sum())(params)
    assert np.isfinite(np.asarray(g.albedo)).all()
    assert np.abs(np.asarray(g.albedo)).max() > 0
