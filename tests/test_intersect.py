import numpy as np
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
