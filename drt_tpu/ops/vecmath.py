"""Vector math over `[..., 3]` arrays.

Pure-function equivalents of the reference's fixed-size vector helpers
(reference: include/drt/vector.hpp:573-606). All functions broadcast over
leading batch dimensions; the trailing axis is the 3-component axis (SoA
batches of rays live as `f32[N, 3]`, which XLA lays out vector-register
friendly on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product -> `[...]` (reference: vector.hpp:573-578)."""
    return jnp.sum(a * b, axis=-1)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    """Euclidean norm -> `[...]` (reference: vector.hpp:580-584)."""
    return jnp.sqrt(dot(a, a))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Unit vector (reference: vector.hpp:586-590). No epsilon: the
    reference divides by the exact norm; a zero vector yields inf/nan,
    matching C++ IEEE semantics."""
    return a / norm(a)[..., None]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over the trailing axis (reference: vector.hpp:592-600)."""
    return jnp.cross(a, b)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflection `-v + 2*dot(n, v)*n` (reference: vector.hpp:602-606).

    Note the reference convention: `v` points *away* from the surface and
    the result points away on the other side.
    """
    return -v + 2.0 * dot(n, v)[..., None] * n
