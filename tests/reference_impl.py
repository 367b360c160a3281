"""NumPy mirror of the reference renderer for sample-matched parity tests.

This is an independent reimplementation (double precision, recursive,
single-sample) of the reference C++ tracer's observable behavior, written
from the structural survey — NOT a build of the reference. Each method
cites the reference file:line it mirrors. It consumes uniforms through a
`Tape` that records draws both linearly (in the exact order the C++ libc
`rand()` stream would be consumed — SURVEY.md §3.2) and structured by
(ray, bounce, slot), so the recorded tape can be injected into the
wavefront renderer for exact per-sample comparison.

`trace` returns both the untruncated radiance (the reference's unbounded
Russian-roulette recursion, pathtracer.hpp:121-136) and the radiance
truncated at a given max depth (what a fixed-depth wavefront computes).
"""

from __future__ import annotations

import math
import sys

import numpy as np

sys.setrecursionlimit(100_000)

PI = math.pi

# Slot indices within the per-bounce uniform triple.
SLOT_RR, SLOT_U1, SLOT_U2 = 0, 1, 2


class Tape:
    """Records uniforms linearly and structured by (ray, bounce, slot).

    With `values` given, replays that linear stream instead of drawing —
    used to consume the exact uniforms fed to the C++ golden harness.
    """

    def __init__(self, rng: np.random.Generator | None, n_rays: int,
                 max_depth: int, values: np.ndarray | None = None):
        self.rng = rng
        self.values = values
        self.pos = 0
        self.linear: list[float] = []
        self.cam_u = np.full((n_rays, 2), 0.5)
        self.bounce_u = np.full((max_depth, n_rays, 3), 0.5)
        self.max_depth = max_depth

    def _next(self) -> float:
        if self.values is not None:
            v = float(self.values[self.pos])
            self.pos += 1
        else:
            v = float(self.rng.random())
        self.linear.append(v)
        return v

    def draw_cam(self, ray: int, slot: int) -> float:
        v = self._next()
        self.cam_u[ray, slot] = v
        return v

    def draw_bounce(self, ray: int, depth: int, slot: int) -> float:
        v = self._next()
        if depth < self.max_depth:
            self.bounce_u[depth, ray, slot] = v
        return v


def _dot(a, b):
    return float(a[0] * b[0] + a[1] * b[1] + a[2] * b[2])


def _normalize(v):
    return v / math.sqrt(_dot(v, v))


def _cross(a, b):
    return np.array([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def _reflect(v, n):
    # reference: vector.hpp:602-606
    return -v + 2.0 * _dot(n, v) * n


def make_frame(normal):
    """reference: bxdf.hpp:29-41 (raw normal as frame z-axis)."""
    e1 = np.array([1.0, 0.0, 0.0])
    e2 = np.array([0.0, 1.0, 0.0])
    if abs(_dot(e1, normal)) < abs(_dot(e2, normal)):
        tangent = _normalize(e1 - normal * _dot(e1, normal))
    else:
        tangent = _normalize(e2 - normal * _dot(e2, normal))
    bitangent = _normalize(_cross(normal, tangent))
    return tangent, bitangent, normal


def angle_to_dir(theta, phi, frame):
    """reference: bxdf.hpp:43-52."""
    x = math.cos(phi) * math.sin(theta)
    y = math.sin(phi) * math.sin(theta)
    z = math.cos(theta)
    return x * frame[0] + y * frame[1] + z * frame[2]


class Diffuse:
    """reference: bxdf.hpp:56-83."""

    def __init__(self, color):
        self.color = np.asarray(color, dtype=np.float64)

    def eval(self, normal, dir_in, dir_out):
        return self.color / PI

    def sample(self, normal, dir_in, draw):
        theta = math.asin(math.sqrt(draw(SLOT_U1)))
        phi = 2.0 * PI * draw(SLOT_U2)
        frame = make_frame(normal)
        d = angle_to_dir(theta, phi, frame)
        pdf = math.cos(theta) / PI
        return d, pdf


class Specular:
    """reference: bxdf.hpp:85-124."""

    def __init__(self, color, exponent):
        self.color = np.asarray(color, dtype=np.float64)
        self.exponent = float(exponent)

    def eval(self, normal, dir_in, dir_out):
        halfway = _normalize(dir_in + dir_out)
        cos_t = _dot(normal, halfway)
        sin_t = math.sqrt(max(1.0 - cos_t * cos_t, 0.0))
        factor = ((self.exponent + 2.0) / (2.0 * PI)
                  * math.pow(cos_t, self.exponent) * sin_t)
        return factor * self.color

    def sample(self, normal, dir_in, draw):
        e = self.exponent
        theta = math.acos(math.sqrt(math.pow(draw(SLOT_U1), 2.0 / (e + 2.0))))
        phi = 2.0 * PI * draw(SLOT_U2)
        frame = make_frame(normal)
        halfway = angle_to_dir(theta, phi, frame)
        if _dot(halfway, dir_in) < 0:
            halfway = _reflect(halfway, normal)
        d = _reflect(dir_in, halfway)
        pdf = ((e + 2.0) / (2.0 * PI)
               * math.pow(math.cos(theta), e + 1.0) * math.sin(theta))
        return d, pdf


class Mirror:
    """reference: bxdf.hpp:126-144 (eval broadcasts 1/cos to a vec3)."""

    def eval(self, normal, dir_in, dir_out):
        return np.full(3, 1.0 / _dot(normal, dir_out))

    def sample(self, normal, dir_in, draw):
        return _reflect(dir_in, normal), 1.0


class Plane:
    """reference: shape.hpp:37-64."""

    def __init__(self, normal, offset, bxdf=None, emission=None):
        self.normal_v = np.asarray(normal, dtype=np.float64)
        self.offset = float(offset)
        self.bxdf = bxdf
        self.emission = emission

    def intersect(self, o, d):
        with np.errstate(divide="ignore", invalid="ignore"):
            h = _dot(o, self.normal_v) - self.offset
            denom = _dot(d, -self.normal_v)
            t = np.float64(h) / np.float64(denom)
        return (t > 0), float(t)

    def normal(self, point):
        return self.normal_v  # raw, possibly unnormalized (shape.hpp:58-59)


class Sphere:
    """reference: shape.hpp:66-111."""

    def __init__(self, center, radius, bxdf=None, emission=None):
        self.center = np.asarray(center, dtype=np.float64)
        self.radius = float(radius)
        self.bxdf = bxdf
        self.emission = emission

    def intersect(self, o, d):
        oc = o - self.center
        b = 2.0 * _dot(oc, d)
        c = _dot(oc, oc) - self.radius * self.radius
        disc = b * b - 4.0 * c
        if disc < 0:
            return False, 0.0
        sq = math.sqrt(disc)
        t1 = (-b - sq) / 2.0
        t2 = (-b + sq) / 2.0
        if t1 > 0:
            return True, t1
        elif t2 > 0:
            return True, t2
        return False, 0.0

    def normal(self, point):
        return _normalize(point - self.center)


class MirrorTracer:
    """Recursive tracer (reference: pathtracer.hpp:53-136)."""

    def __init__(self, scene, absorb: float, min_bounces: int):
        self.scene = scene
        self.absorb = absorb
        self.min_bounces = min_bounces

    def raycast(self, o, d):
        """reference: pathtracer.hpp:72-89 (strict <, keep-first ties)."""
        tmin = math.inf
        hit = None
        for shape in self.scene:
            ok, t = shape.intersect(o, d)
            if not ok or not (t < tmin):  # NaN compares false, like C++
                continue
            tmin = t
            point = o + t * d
            hit = (point, shape.normal(point), shape)
        return hit

    def trace(self, o, d, depth, tape: Tape, ray: int, max_depth: int):
        """Returns (full_radiance, truncated_radiance) vec3 pair."""
        if depth >= self.min_bounces:
            if tape.draw_bounce(ray, depth, SLOT_RR) < self.absorb:
                return np.zeros(3), np.zeros(3)
            p = 1.0 - self.absorb
        else:
            p = 1.0
        hit = self.raycast(o, d)
        if hit is None:
            return np.zeros(3), np.zeros(3)
        point, normal, shape = hit
        # scatter (pathtracer.hpp:91-115): sampler first, then forward.
        if shape.bxdf is not None:
            draw = lambda slot: tape.draw_bounce(ray, depth, slot)  # noqa: E731
            dir_out, pdf = shape.bxdf.sample(normal, -d, draw)
        else:
            dir_out, pdf = np.zeros(3), 1.0  # null fallback (pathtracer.hpp:17-26)
        orig2 = point + 1e-3 * dir_out
        if shape.bxdf is not None:
            f = shape.bxdf.eval(normal, -d, dir_out)
        else:
            f = np.zeros(3)
        l_full, l_trunc = self.trace(orig2, dir_out, depth + 1, tape, ray,
                                     max_depth)
        cos_t = _dot(normal, dir_out)
        em = (shape.emission if shape.emission is not None
              else np.zeros(3))
        em = np.asarray(em, dtype=np.float64)
        full = (em + f * l_full * cos_t / pdf) / p
        if depth >= max_depth:
            trunc = np.zeros(3)
        else:
            trunc = (em + f * l_trunc * cos_t / pdf) / p
        return full, trunc


class MirrorCamera:
    """reference: camera.hpp (look_at basis, -up t-axis, pdf 1)."""

    def __init__(self, width, height, vfov=1.3963):
        self.width = width
        self.height = height
        self.vfov = vfov
        self.eye = np.zeros(3)
        self.forward = np.array([0.0, 0.0, -1.0])
        self.right = np.array([1.0, 0.0, 0.0])
        self.up = np.array([0.0, 1.0, 0.0])

    def look_at(self, eye, at, up=(0.0, 1.0, 0.0)):
        eye = np.asarray(eye, dtype=np.float64)
        at = np.asarray(at, dtype=np.float64)
        up = np.asarray(up, dtype=np.float64)
        self.eye = eye
        self.forward = _normalize(at - eye)
        self.right = _normalize(_cross(self.forward, up))
        self.up = _cross(self.right, self.forward)

    def sample(self, x, y, tape: Tape, ray: int):
        s = (x + tape.draw_cam(ray, 0)) / self.width
        t = (y + tape.draw_cam(ray, 1)) / self.height
        aspect = self.width / self.height
        half = math.tan(self.vfov / 2.0)
        d = (self.forward
             + (2.0 * s - 1.0) * aspect * half * self.right
             + (2.0 * t - 1.0) * half * (-self.up))
        return _normalize(d), 1.0


def build_cbox():
    """The sample scene, mirrored from src/render.cpp:26-59."""
    red = np.array([0.5, 0.0, 0.0])
    green = np.array([0.0, 0.5, 0.0])
    white = np.array([0.5, 0.5, 0.5])
    emission = np.array([1.0, 1.0, 1.0])
    dr, dg, dw = Diffuse(red), Diffuse(green), Diffuse(white)
    scene = [
        Sphere([0.0, 0.0, 3.0], 1.0, dw),
        Sphere([-1.0, 1.0, 4.5], 1.0, dw),
        Plane([-1.0, 0.0, 0.0], -3.0, dr),
        Plane([1.0, 0.0, 0.1], -3.0, dg),
        Plane([0.0, 0.0, -1.0], -6.0, dw),
        Plane([0.0, 0.0, 1.0], 0.0, dw),
        Plane([0.0, 1.0, 0.0], -3.0, dw),
        Plane([0.0, -1.0, 0.0], -3.0, dw),
        Sphere([0.0, 3.0, 3.0], 1.0, None, emission),
    ]
    return scene


def render_mirror(width, height, spp, *, absorb=0.5, min_bounces=1,
                  max_depth=16, seed=0, scene=None, camera=None,
                  tape_values=None):
    """Render per-sample radiance with the mirror tracer.

    Returns (full f64[N,3], truncated f64[N,3], tape) with ray order
    matching the wavefront layout: ((y*W + x)*spp + i).
    """
    if scene is None:
        scene = build_cbox()
    if camera is None:
        camera = MirrorCamera(width, height)
        camera.look_at([0.0, 0.0, 0.0], [0.0, 0.0, 1.0])
    tracer = MirrorTracer(scene, absorb, min_bounces)
    n = width * height * spp
    tape = Tape(np.random.default_rng(seed), n, max_depth,
                values=tape_values)
    full = np.zeros((n, 3))
    trunc = np.zeros((n, 3))
    ray = 0
    for y in range(height):
        for x in range(width):
            for _ in range(spp):
                d, pdf = camera.sample(x, y, tape, ray)
                lf, lt = tracer.trace(camera.eye, d, 0, tape, ray, max_depth)
                full[ray] = lf / pdf
                trunc[ray] = lt / pdf
                ray += 1
    return full, trunc, tape
