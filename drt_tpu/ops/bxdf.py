"""Branch-free vectorized BxDF evaluation and sampling (scalarized SoA).

The reference dispatches BxDFs virtually per hit (reference: include/drt/
bxdf.hpp:12-25, pathtracer.hpp:17-35). Here every ray computes all material
variants' cheap scalar parts and selects by material type code — idiomatic
for the VPU, where a gather + select beats divergent control flow. Per-ray
vectors are `V3`s of f[N] (see drt_tpu/ops/vecmath.py).

BRDF values factor as `f = albedo_row * scale` with `scale` material-type
dependent; the adjoint pass (drt_tpu/adjoint.py) exploits this linearity to
scatter-add `d L / d albedo` without a tape.

Faithfully reproduced reference math (including idiosyncrasies — replicate,
do not "fix", for gradient parity; see SURVEY.md "Hard parts"):
  - frame construction Gram-Schmidts e1 or e2 against the *raw* (possibly
    unnormalized) hit normal and uses that raw normal as the frame z-axis
    (reference: bxdf.hpp:29-41);
  - diffuse: eval = albedo/pi (bxdf.hpp:63-67); cosine sampling
    theta = asin(sqrt(u1)), phi = 2 pi u2, pdf = cos(theta)/pi
    (bxdf.hpp:69-79);
  - specular (Blinn-Phong-like): eval = (e+2)/(2 pi) cos^e(th_h) sin(th_h)
    (bxdf.hpp:93-104) — including the extra sin(theta) factor; half-vector
    sampling with below-horizon flip (bxdf.hpp:106-120);
  - mirror: eval = 1/cos(theta_out), delta reflection with pdf 1
    (bxdf.hpp:126-144);
  - null BxDF: f = 0, sample dir = 0, pdf = 1 (pathtracer.hpp:17-35).
"""

from __future__ import annotations

import jax.numpy as jnp

from drt_tpu.constants import PI
from drt_tpu.ops.vecmath import (V3, crossv, dotv, normalizev, reflectv,
                                 wherev)
from drt_tpu.scene import DIFFUSE, SPECULAR, MIRROR


def make_frame(normal: V3):
    """ONB-ish frame about the raw normal (reference: bxdf.hpp:29-41).
    normal: V3 of f[N] -> (tangent, bitangent, normal)."""
    use_e1 = jnp.abs(normal.x) < jnp.abs(normal.y)
    one = jnp.ones_like(normal.x)
    zero = jnp.zeros_like(normal.x)
    e1 = V3(one, zero, zero)
    e2 = V3(zero, one, zero)
    tv = wherev(use_e1, e1 - normal * normal.x, e2 - normal * normal.y)
    tangent = normalizev(tv)
    bitangent = normalizev(crossv(normal, tangent))
    return tangent, bitangent, normal


def angle_to_dir(theta, phi, frame) -> V3:
    """Spherical angles in a frame -> direction (reference: bxdf.hpp:43-52)."""
    tangent, bitangent, normal = frame
    st = jnp.sin(theta)
    x = jnp.cos(phi) * st
    y = jnp.sin(phi) * st
    z = jnp.cos(theta)
    return tangent * x + bitangent * y + normal * z


def _pow_cpp(base: jnp.ndarray, expo: jnp.ndarray) -> jnp.ndarray:
    """C++ `std::pow` semantics for possibly-negative base with integral
    exponent: (-x)^n = |x|^n * (-1)^n. jnp.power would return NaN there.
    Non-integral exponent with negative base -> NaN (as in C++)."""
    mag = jnp.power(jnp.abs(base), expo)
    is_int = expo == jnp.round(expo)
    odd = jnp.mod(jnp.round(expo), 2.0) == 1.0
    neg = base < 0
    sign = jnp.where(neg & odd, -1.0, 1.0)
    val = mag * sign
    return jnp.where(neg & ~is_int, jnp.nan, val)


def eval_scale(mat_type: jnp.ndarray, exponent: jnp.ndarray,
               normal: V3, dir_in: V3, dir_out: V3) -> jnp.ndarray:
    """Scalar BRDF factor s so that f = albedo_row * s. Scalars f[N];
    dir_in points *away* from the surface (the tracer passes -ray_dir,
    reference: pathtracer.hpp:100-101)."""
    # Diffuse: albedo / pi (bxdf.hpp:63-67).
    s_diff = jnp.full_like(normal.x, 1.0 / PI)
    # Specular (bxdf.hpp:93-104). Degenerate-halfway guard: when the
    # sampled (possibly flipped) half vector is exactly perpendicular to
    # dir_in (f32 boundary of the flip at bxdf.hpp:114-115), dir_out ==
    # -dir_in and normalize(dir_in + dir_out) is 0/0; measure-zero in
    # f64, so reference parity is untouched.
    hw = dir_in + dir_out
    hw2 = dotv(hw, hw)
    halfway = normalizev(hw)
    cos_h = dotv(normal, halfway)
    sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
    s_spec = (exponent + 2.0) / (2.0 * PI) * _pow_cpp(cos_h, exponent) * sin_h
    s_spec = jnp.where(hw2 > 0, s_spec, 0.0)
    # Mirror: 1 / cos(theta_out) (bxdf.hpp:131-136). Guarded: an exactly
    # perpendicular reflection (grazing f32 hit) would make 1/0 = inf and
    # then inf * cos = NaN in the tracer; measure-zero in f64, so golden
    # parity is untouched.
    cos_out = dotv(normal, dir_out)
    s_mirr = jnp.where(cos_out != 0, 1.0 / cos_out, 0.0)
    s = jnp.where(mat_type == DIFFUSE, s_diff,
                  jnp.where(mat_type == SPECULAR, s_spec,
                            jnp.where(mat_type == MIRROR, s_mirr, 0.0)))
    return s


def sample_bxdf(mat_type: jnp.ndarray, exponent: jnp.ndarray,
                normal: V3, dir_in: V3,
                u1: jnp.ndarray, u2: jnp.ndarray):
    """Sample an outgoing direction per ray.

    Returns (dir V3 of f[N], pdf f[N]). dir_in points away from the
    surface. Null-material rays return (0, 1) like the reference's null
    fallback (pathtracer.hpp:17-26) — their BRDF value is 0, so the path
    carries zero throughput from here on.
    """
    frame = make_frame(normal)
    # Diffuse cosine-weighted (bxdf.hpp:69-79).
    th_d = jnp.arcsin(jnp.sqrt(u1))
    phi = 2.0 * PI * u2
    dir_d = angle_to_dir(th_d, phi, frame)
    pdf_d = jnp.cos(th_d) / PI
    # Specular half-vector (bxdf.hpp:106-120).
    th_s = jnp.arccos(jnp.sqrt(jnp.power(u1, 2.0 / (exponent + 2.0))))
    half = angle_to_dir(th_s, phi, frame)
    flip = dotv(half, dir_in) < 0
    half = wherev(flip, reflectv(half, normal), half)
    dir_s = reflectv(dir_in, half)
    pdf_s = ((exponent + 2.0) / (2.0 * PI)
             * jnp.power(jnp.cos(th_s), exponent + 1.0) * jnp.sin(th_s))
    # Mirror delta (bxdf.hpp:138-143).
    dir_m = reflectv(dir_in, normal)
    pdf_m = jnp.ones_like(u1)

    is_d = mat_type == DIFFUSE
    is_s = mat_type == SPECULAR
    is_m = mat_type == MIRROR
    d = wherev(is_d, dir_d, wherev(is_s, dir_s, wherev(is_m, dir_m, 0.0)))
    pdf = jnp.where(is_d, pdf_d,
                    jnp.where(is_s, pdf_s,
                              jnp.where(is_m, pdf_m, 1.0)))
    return d, pdf
