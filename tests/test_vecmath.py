import numpy as np
import jax.numpy as jnp

from drt_tpu.ops import vecmath as vm


def rnd(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape))


def test_dot_norm_normalize():
    a, b = rnd(5, 3, seed=1), rnd(5, 3, seed=2)
    np.testing.assert_allclose(vm.dot(a, b), np.sum(np.asarray(a) * np.asarray(b), -1))
    np.testing.assert_allclose(vm.norm(a), np.linalg.norm(a, axis=-1))
    n = vm.normalize(a)
    np.testing.assert_allclose(vm.norm(n), 1.0, rtol=1e-12)


def test_cross_orthogonal():
    a, b = rnd(4, 3, seed=3), rnd(4, 3, seed=4)
    c = vm.cross(a, b)
    np.testing.assert_allclose(vm.dot(c, a), 0.0, atol=1e-12)
    np.testing.assert_allclose(vm.dot(c, b), 0.0, atol=1e-12)


def test_reflect_reference_convention():
    """reflect(v, n) = -v + 2 dot(n, v) n (reference: vector.hpp:602-606)."""
    v = jnp.asarray([[1.0, 1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = vm.reflect(v, n)
    np.testing.assert_allclose(r, [[-1.0, 1.0, 0.0]])
    # Involution about the normal: reflecting twice restores v.
    np.testing.assert_allclose(vm.reflect(r, n), v)
