"""Generic MC integration operator (drt_tpu/integrate.py — the JAX form
of the reference's reusable `integrate(forward, sampler, n_samples,
unbiased)`, include/drt/integrate.hpp:56-66), validated on a closed-form
integrand: f(theta, x) = theta * x^2 over x ~ U[0,1], importance-sampled
with pdf 2x =>  E = theta/3,  dE/dtheta = 1/3."""

import numpy as np

import jax
import jax.numpy as jnp

from drt_tpu.integrate import integrate


def _forward(theta, x):
    return theta * x * x


def _sampler(key):
    u = jax.random.uniform(key, (), dtype=jnp.float64)
    x = jnp.sqrt(u)          # pdf(x) = 2x on [0, 1]
    return x, 2.0 * x


def _mc(fn, n_keys, seed=0):
    vals = [fn(jax.random.key(seed + i)) for i in range(n_keys)]
    return np.asarray(vals)


def test_biased_estimate_and_gradient_expectation():
    theta = jnp.asarray(1.7, jnp.float64)
    est = jax.jit(lambda k: integrate(_forward, _sampler, theta, k,
                                      n_samples=4))
    vals = _mc(est, 400)
    se = vals.std() / np.sqrt(len(vals))
    assert abs(vals.mean() - 1.7 / 3.0) < 4 * se + 1e-12

    gfn = jax.jit(jax.grad(
        lambda t, k: integrate(_forward, _sampler, t, k, n_samples=4)))
    g = _mc(lambda k: gfn(theta, k), 400)
    gse = g.std() / np.sqrt(len(g))
    assert abs(g.mean() - 1.0 / 3.0) < 4 * gse + 1e-12


def test_biased_backward_replays_forward_samples():
    """Biased mode is plain AD: grad == value/theta exactly for the
    linear-in-theta integrand (same samples in fwd and bwd)."""
    theta = jnp.asarray(2.0, jnp.float64)
    k = jax.random.key(3)
    v = integrate(_forward, _sampler, theta, k, n_samples=2)
    g = jax.grad(lambda t: integrate(_forward, _sampler, t, k,
                                     n_samples=2))(theta)
    np.testing.assert_allclose(float(g), float(v) / 2.0, rtol=1e-12)


def test_unbiased_gradient_is_decorrelated_but_unbiased():
    """Unbiased mode: per-key grad differs from the biased replay (fresh
    backward samples), but its expectation matches dE/dtheta = 1/3."""
    theta = jnp.asarray(1.0, jnp.float64)
    k = jax.random.key(5)
    g_b = jax.grad(lambda t: integrate(_forward, _sampler, t, k))(theta)
    g_u = jax.grad(lambda t: integrate(_forward, _sampler, t, k,
                                       unbiased=True))(theta)
    assert abs(float(g_b) - float(g_u)) > 1e-6  # different sample streams

    gfn = jax.jit(jax.grad(
        lambda t, kk: integrate(_forward, _sampler, t, kk,
                                unbiased=True, n_samples=2)))
    g = _mc(lambda kk: gfn(theta, kk), 500)
    se = g.std() / np.sqrt(len(g))
    assert abs(g.mean() - 1.0 / 3.0) < 4 * se + 1e-12


def test_unbiased_n_samples_cuts_backward_variance():
    theta = jnp.asarray(1.0, jnp.float64)

    def gvar(n):
        gfn = jax.jit(jax.grad(
            lambda t, kk: integrate(_forward, _sampler, t, kk,
                                    unbiased=True, n_samples=n)))
        return _mc(lambda kk: gfn(theta, kk), 300).var()

    v1, v4 = gvar(1), gvar(4)
    assert v4 < 0.5 * v1, (v1, v4)


def test_primal_value_identical_biased_vs_unbiased():
    """The primal estimate is the same estimator either way — only the
    backward differs (integrate.hpp:39-52 detaches the same value)."""
    theta = jnp.asarray(1.3, jnp.float64)
    k = jax.random.key(9)
    v_b = integrate(_forward, _sampler, theta, k, n_samples=3)
    v_u = integrate(_forward, _sampler, theta, k, n_samples=3,
                    unbiased=True)
    np.testing.assert_allclose(float(v_b), float(v_u), rtol=1e-15)


def test_n_samples_validation():
    import pytest

    with pytest.raises(ValueError):
        integrate(_forward, _sampler, jnp.asarray(1.0), jax.random.key(0),
                  n_samples=0)
    with pytest.raises(ValueError):
        integrate(_forward, _sampler, jnp.asarray(1.0), jax.random.key(0),
                  combine="median")


def test_sum_combine_matches_reference_loop_semantics():
    """combine='sum' reproduces the reference's accumulate-without-1/n
    loops exactly (integrate.hpp:33-34 and IntegrateBackward:15-19):
    value and gradient are n_samples * the mean estimator built from
    the same draws, and at n_samples=1 all modes coincide."""
    theta = jnp.asarray(1.7, jnp.float64)
    k = jax.random.key(11)
    for n in (1, 4):
        v_mean = integrate(_forward, _sampler, theta, k, n_samples=n)
        v_sum = integrate(_forward, _sampler, theta, k, n_samples=n,
                          combine="sum")
        np.testing.assert_allclose(float(v_sum), n * float(v_mean),
                                   rtol=1e-12)
        g_mean = jax.grad(lambda t: integrate(
            _forward, _sampler, t, k, n_samples=n))(theta)
        g_sum = jax.grad(lambda t: integrate(
            _forward, _sampler, t, k, n_samples=n,
            combine="sum"))(theta)
        np.testing.assert_allclose(float(g_sum), n * float(g_mean),
                                   rtol=1e-12)

    # Reference-mirror check: hand-rolled += loop over the same fold_in
    # sample stream (the exact integrate_biased semantics).
    n = 3
    acc = 0.0
    for i in range(n):
        x, pdf = _sampler(jax.random.fold_in(k, i))
        acc += float(_forward(theta, x)) / float(pdf)
    v_sum = integrate(_forward, _sampler, theta, k, n_samples=n,
                      combine="sum")
    np.testing.assert_allclose(float(v_sum), acc, rtol=1e-12)

    # Unbiased mode sums the fresh backward draws the same way
    # (IntegrateBackward:15-19 — grad scales with n, no 1/n).
    gfn = jax.jit(jax.grad(lambda t, kk: integrate(
        _forward, _sampler, t, kk, unbiased=True, n_samples=4,
        combine="sum")))
    g = _mc(lambda kk: gfn(theta, kk), 400)
    se = g.std() / np.sqrt(len(g))
    assert abs(g.mean() - 4.0 / 3.0) < 4 * se + 1e-12
