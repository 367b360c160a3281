import numpy as np
import jax.numpy as jnp

import reference_impl as ref
from drt_tpu.ops import bxdf as jb
from drt_tpu.scene import DIFFUSE, SPECULAR, MIRROR, NULL_BXDF
from drt_tpu.ops.vecmath import V3


def _rand_normals(n, seed, unnormalized=False):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if unnormalized:
        v *= rng.uniform(0.9, 1.1, size=(n, 1))
    return v


def test_make_frame_matches_mirror():
    normals = _rand_normals(64, 11, unnormalized=True)
    t, b, nn = jb.make_frame(V3.from_array(jnp.asarray(normals)))
    t, b, nn = (np.asarray(v.to_array()) for v in (t, b, nn))
    for i in range(64):
        mt, mb, mn = ref.make_frame(normals[i])
        np.testing.assert_allclose(t[i], mt, rtol=1e-12, atol=1e-15)
        np.testing.assert_allclose(b[i], mb, rtol=1e-12, atol=1e-15)
        np.testing.assert_allclose(nn[i], mn, rtol=1e-12, atol=1e-15)


def test_diffuse_sample_and_eval_match_mirror():
    n = 128
    rng = np.random.default_rng(5)
    normals = _rand_normals(n, 12)
    d_in = _rand_normals(n, 13)
    u1 = rng.random(n)
    u2 = rng.random(n)
    mat = ref.Diffuse([0.5, 0.25, 0.125])

    mt = jnp.full(n, DIFFUSE, jnp.int32)
    mex = jnp.zeros(n)
    dirs, pdf = jb.sample_bxdf(mt, mex, V3.from_array(jnp.asarray(normals)),
                               V3.from_array(jnp.asarray(d_in)),
                               jnp.asarray(u1), jnp.asarray(u2))
    s = jb.eval_scale(mt, mex, V3.from_array(jnp.asarray(normals)),
                      V3.from_array(jnp.asarray(d_in)), dirs)
    dirs_a = np.asarray(dirs.to_array())
    for i in range(n):
        draws = iter([u1[i], u2[i]])
        md, mpdf = mat.sample(normals[i], d_in[i], lambda _: next(draws))
        np.testing.assert_allclose(dirs_a[i], md, rtol=1e-12, atol=1e-15)
        np.testing.assert_allclose(pdf[i], mpdf, rtol=1e-12)
        me = mat.eval(normals[i], d_in[i], md)
        np.testing.assert_allclose(np.asarray(s[i]) * mat.color, me,
                                   rtol=1e-12)


def test_specular_sample_and_eval_match_mirror():
    n = 128
    rng = np.random.default_rng(6)
    normals = _rand_normals(n, 14)
    d_in = _rand_normals(n, 15)
    # dir_in must point away from the surface for a plausible config
    flip = np.sum(normals * d_in, -1) < 0
    d_in[flip] = -d_in[flip]
    u1 = rng.random(n)
    u2 = rng.random(n)
    exp = 30.0
    mat = ref.Specular([0.5, 0.5, 0.5], exp)

    mt = jnp.full(n, SPECULAR, jnp.int32)
    mex = jnp.full(n, exp)
    dirs, pdf = jb.sample_bxdf(mt, mex, V3.from_array(jnp.asarray(normals)),
                               V3.from_array(jnp.asarray(d_in)),
                               jnp.asarray(u1), jnp.asarray(u2))
    s = jb.eval_scale(mt, mex, V3.from_array(jnp.asarray(normals)),
                      V3.from_array(jnp.asarray(d_in)), dirs)
    dirs_a = np.asarray(dirs.to_array())
    for i in range(n):
        draws = iter([u1[i], u2[i]])
        md, mpdf = mat.sample(normals[i], d_in[i], lambda _: next(draws))
        np.testing.assert_allclose(dirs_a[i], md, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(pdf[i], mpdf, rtol=1e-10)
        me = mat.eval(normals[i], d_in[i], md)
        np.testing.assert_allclose(np.asarray(s[i]) * mat.color, me,
                                   rtol=1e-9, atol=1e-12)


def test_mirror_and_null():
    normals = V3.from_array(jnp.asarray([[0.0, 1.0, 0.0]] * 2))
    d_in = V3.from_array(jnp.asarray([[1.0, 1.0, 0.0]] * 2) / np.sqrt(2))
    mt = jnp.asarray([MIRROR, NULL_BXDF], jnp.int32)
    mex = jnp.zeros(2)
    u = jnp.asarray([0.3, 0.7])
    dirs, pdf = jb.sample_bxdf(mt, mex, normals, d_in, u, u)
    dirs_a = np.asarray(dirs.to_array())
    np.testing.assert_allclose(dirs_a[0],
                               [-1 / np.sqrt(2), 1 / np.sqrt(2), 0.0])
    np.testing.assert_allclose(pdf, [1.0, 1.0])
    np.testing.assert_allclose(dirs_a[1], 0.0)  # null fallback
    s = jb.eval_scale(mt, mex, normals, d_in, dirs)
    np.testing.assert_allclose(s[0], np.sqrt(2.0), rtol=1e-12)
    assert s[1] == 0.0


def test_diffuse_pdf_integrates_to_one():
    """Monte-Carlo self-consistency: E[1] = mean(1) since samples are drawn
    from their own pdf; also check cos-weighted estimator of hemisphere
    integral of cos/pi = 1."""
    n = 200_000
    rng = np.random.default_rng(8)
    z = jnp.zeros(n)
    normal = V3(z, z, jnp.ones(n))
    mt = jnp.full(n, DIFFUSE, jnp.int32)
    dirs, pdf = jb.sample_bxdf(mt, jnp.zeros(n), normal, normal,
                               jnp.asarray(rng.random(n)),
                               jnp.asarray(rng.random(n)))
    cos = np.asarray(dirs.z)
    est = np.mean(cos / np.pi / np.asarray(pdf))  # integral of cos/pi dw = 1
    np.testing.assert_allclose(est, 1.0, rtol=1e-2)
