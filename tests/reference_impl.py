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

    def draw_raw(self) -> float:
        """Linear-only draw (no structured slot) — backward-time draws
        of the unbiased mode have no (ray, bounce, slot) home."""
        return self._next()


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

    def __init__(self, color, alb_id=None):
        self.color = np.asarray(color, dtype=np.float64)
        self.alb_id = alb_id  # albedo leaf row for unbiased grads

    def eval(self, normal, dir_in, dir_out):
        return self.color / PI

    def scale(self, normal, dir_in, dir_out):
        """eval without the color leaf: d eval / d color (scalar)."""
        return 1.0 / PI

    def sample(self, normal, dir_in, draw):
        theta = math.asin(math.sqrt(draw(SLOT_U1)))
        phi = 2.0 * PI * draw(SLOT_U2)
        frame = make_frame(normal)
        d = angle_to_dir(theta, phi, frame)
        pdf = math.cos(theta) / PI
        return d, pdf


class Specular:
    """reference: bxdf.hpp:85-124."""

    def __init__(self, color, exponent, alb_id=None):
        self.color = np.asarray(color, dtype=np.float64)
        self.exponent = float(exponent)
        self.alb_id = alb_id

    def eval(self, normal, dir_in, dir_out):
        return self.scale(normal, dir_in, dir_out) * self.color

    def scale(self, normal, dir_in, dir_out):
        halfway = _normalize(dir_in + dir_out)
        cos_t = _dot(normal, halfway)
        sin_t = math.sqrt(max(1.0 - cos_t * cos_t, 0.0))
        return ((self.exponent + 2.0) / (2.0 * PI)
                * math.pow(cos_t, self.exponent) * sin_t)

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

    alb_id = None  # no color leaf: constant-valued eval

    def eval(self, normal, dir_in, dir_out):
        return np.full(3, 1.0 / _dot(normal, dir_out))

    def sample(self, normal, dir_in, draw):
        return _reflect(dir_in, normal), 1.0


class Plane:
    """reference: shape.hpp:37-64."""

    def __init__(self, normal, offset, bxdf=None, emission=None,
                 em_id=None):
        self.normal_v = np.asarray(normal, dtype=np.float64)
        self.offset = float(offset)
        self.bxdf = bxdf
        self.emission = emission
        self.em_id = em_id

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

    def __init__(self, center, radius, bxdf=None, emission=None,
                 em_id=None):
        self.center = np.asarray(center, dtype=np.float64)
        self.radius = float(radius)
        self.bxdf = bxdf
        self.emission = emission
        self.em_id = em_id

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


class UnbiasedMirrorTracer(MirrorTracer):
    """The reference's UNBIASED mode (`integrate(..., unbiased=true)`,
    integrate.hpp:39-52): the forward returns a DETACHED estimate, and
    `IntegrateBackward` (integrate.hpp:11-24) re-draws samples from the
    same global rand() stream at backward time, eagerly re-traces a
    fresh value path, and recurses ONE level per fired node (the deeper
    integrate nodes of each value path sit behind the detach and only
    continue the walk through their own IntegrateBackward).

    Draw-consumption order per sample (deterministic given the tape):
      forward: identical to biased mode (camera s,t then per-vertex
      RR/theta/phi — integrate_unbiased's value loop, :45-47).
      backward at vertex w_k with grad g_k:
        sampler() at w_k (theta, phi) -> dir'_k, pdf'_k
        eager value path from depth_k+1 along dir'_k (RR/theta/phi per
          fresh vertex until death — plain forward consumption)
        d albedo(w_k) += g_k/pdf' * cos' (.) L'     (MulBackward,
          vector.hpp:443-451, through the brdf leaf)
        d emission(w_{k+1}) += g_{k+1}              (the fresh hit)
        recurse at w_{k+1} with g_{k+1} = g_k/pdf' * cos' (.) f' / p
      The chain stops when a value path dies before its first vertex.
    """

    def trace_u(self, o, d, depth, tape: Tape, ray: int,
                record: bool = True):
        """Returns (detached radiance, bwd | None); bwd(g, grads)
        replays the reference's backward walk, consuming more tape."""
        zeros = np.zeros(3)
        if depth >= self.min_bounces:
            u = (tape.draw_bounce(ray, depth, SLOT_RR) if record
                 else tape.draw_raw())
            if u < self.absorb:
                return zeros, None
            p = 1.0 - self.absorb
        else:
            p = 1.0
        hit = self.raycast(o, d)
        if hit is None:
            return zeros, None
        point, normal, shape = hit

        def draw_fwd(slot):
            return (tape.draw_bounce(ray, depth, slot) if record
                    else tape.draw_raw())

        # integrate_unbiased value loop (:45-47): sampler first, then
        # the eager forward; result detached.
        if shape.bxdf is not None:
            dir_out, pdf = shape.bxdf.sample(normal, -d, draw_fwd)
            f = shape.bxdf.eval(normal, -d, dir_out)
        else:
            dir_out, pdf = zeros, 1.0  # pathtracer.hpp:17-26 null
            f = zeros
        orig2 = point + 1e-3 * dir_out
        l_val, _ = self.trace_u(orig2, dir_out, depth + 1, tape, ray,
                                record)
        cos_t = _dot(normal, dir_out)
        em = (np.asarray(shape.emission, dtype=np.float64)
              if shape.emission is not None else zeros)
        value = (em + f * l_val * cos_t / pdf) / p

        def bwd(g, grads):
            h = g / p  # ScalarDiv backward (vector.hpp:465-484)
            if shape.emission is not None:
                grads["emission"][shape.em_id] += h
            # IntegrateBackward (integrate.hpp:15-18): fresh sampler
            # draw, eager fresh forward, backward(grad / pdf).
            if shape.bxdf is not None:
                dir2, pdf2 = shape.bxdf.sample(
                    normal, -d, lambda slot: tape.draw_raw())
                f2 = shape.bxdf.eval(normal, -d, dir2)
            else:
                dir2, pdf2 = zeros, 1.0
                f2 = zeros
            orig3 = point + 1e-3 * dir2
            l2, bwd2 = self.trace_u(orig3, dir2, depth + 1, tape, ray,
                                    record=False)
            cos2 = _dot(normal, dir2)
            hp = g / p / pdf2
            # MulBackward through (f2 (.) radiance) * cos2.
            if shape.bxdf is not None and shape.bxdf.alb_id is not None:
                grads["albedo"][shape.bxdf.alb_id] += (
                    hp * cos2 * l2 * shape.bxdf.scale(normal, -d, dir2))
            if bwd2 is not None:
                bwd2(hp * cos2 * f2, grads)

        return value, bwd


def render_mirror_unbiased(width, height, spp, *, absorb=0.5,
                           min_bounces=1, max_depth=64, seed=0,
                           scene=None, camera=None, tape_values=None,
                           n_albedo=3, n_emission=1):
    """Forward render + the reference's UNBIASED backward per sample
    (radiance.backward(1) right after each sample, as the golden
    harness's grad mode does), all consuming ONE linear stream.

    Returns (img f64[H,W,3], grads dict{albedo f64[Ka,3], emission
    f64[Le,3]}, tape)."""
    if scene is None:
        scene = build_cbox()
    if camera is None:
        camera = MirrorCamera(width, height)
        camera.look_at([0.0, 0.0, 0.0], [0.0, 0.0, 1.0])
    tracer = UnbiasedMirrorTracer(scene, absorb, min_bounces)
    n = width * height * spp
    tape = Tape(np.random.default_rng(seed), n, max_depth,
                values=tape_values)
    grads = {"albedo": np.zeros((n_albedo, 3)),
             "emission": np.zeros((n_emission, 3))}
    img = np.zeros((height, width, 3))
    ray = 0
    ones = np.ones(3)
    for y in range(height):
        for x in range(width):
            pixel = np.zeros(3)
            for _ in range(spp):
                d, pdf = camera.sample(x, y, tape, ray)
                val, bwd = tracer.trace_u(camera.eye, d, 0, tape, ray)
                pixel += val / pdf
                if bwd is not None:
                    bwd(ones, grads)
                ray += 1
            img[y, x] = pixel / spp
    return img, grads, tape


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
    # alb_id/em_id: leaf rows for the unbiased-mode gradient walk,
    # matching the golden harness's param order {red, green, white}.
    dr, dg, dw = (Diffuse(red, alb_id=0), Diffuse(green, alb_id=1),
                  Diffuse(white, alb_id=2))
    scene = [
        Sphere([0.0, 0.0, 3.0], 1.0, dw),
        Sphere([-1.0, 1.0, 4.5], 1.0, dw),
        Plane([-1.0, 0.0, 0.0], -3.0, dr),
        Plane([1.0, 0.0, 0.1], -3.0, dg),
        Plane([0.0, 0.0, -1.0], -6.0, dw),
        Plane([0.0, 0.0, 1.0], 0.0, dw),
        Plane([0.0, 1.0, 0.0], -3.0, dw),
        Plane([0.0, -1.0, 0.0], -3.0, dw),
        Sphere([0.0, 3.0, 3.0], 1.0, None, emission, em_id=0),
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
