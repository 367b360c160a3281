"""Elastic tile scheduler + failure injection (SURVEY.md §5: failure
detection / elastic recovery / fault injection — absent in the reference,
which is one thread rendering once, src/render.cpp:72-92)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drt_tpu.config import RenderConfig
from drt_tpu.models import cbox
from drt_tpu.parallel.multihost import (TileFailure, TileScheduler,
                                        heartbeat, make_tile_renderer)
from drt_tpu.renderer import render_image


def test_tiles_cover_image_exactly():
    s = TileScheduler(width=100, height=70, tile=32)
    seen = np.zeros((70, 100), np.int32)
    for j in s.jobs:
        seen[j.y0:j.y0 + j.height, j.x0:j.x0 + j.width] += 1
    assert (seen == 1).all()


def test_tile_render_matches_monolithic():
    """Tile-based rendering is the same estimator as the monolithic
    renderer (per-tile keys differ, so compare statistically on means)."""
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=32, height=24, spp=32, max_depth=4)
    sched = TileScheduler(cfg.width, cfg.height, tile=16)
    render_tile = make_tile_renderer(scene, cam, cfg, params)
    img_tiles = sched.run(render_tile, seed=0)
    img_mono = np.asarray(render_image(params, scene, cam,
                                       jax.random.key(0), cfg))
    assert np.isfinite(img_tiles).all()
    assert abs(img_tiles.mean() - img_mono.mean()) / img_mono.mean() < 0.15


def test_tile_render_matches_monolithic_seed_matched():
    """With a SHARED global uniform tape (randomness a function of the
    global ray id, not the tiling), the tiled image equals the
    monolithic render exactly — the strong idempotent-decomposition
    property that makes tile re-dispatch after failures bias-free."""
    from drt_tpu.camera import camera_rays
    from drt_tpu.renderer import chunk_pixel_ids, trace_rays

    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=32, height=24, spp=4, max_depth=3)
    n = cfg.width * cfg.height * cfg.spp
    k = jax.random.key(3)
    cam_u = jax.random.uniform(jax.random.fold_in(k, 0), (n, 2),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.fold_in(k, 1),
                              (cfg.max_depth, 3, n), dtype=jnp.float32)

    # Monolithic render consuming the global streams directly.
    xy = chunk_pixel_ids(cfg)
    o, d, pdf = camera_rays(cam, cfg.width, cfg.height, xy, cam_u)
    L = trace_rays(params, scene, o, d, None, cfg, tape=tape)
    mono = np.stack(
        [np.asarray(c / pdf).reshape(cfg.height, cfg.width, cfg.spp)
         .mean(-1) for c in L], -1)

    sched = TileScheduler(cfg.width, cfg.height, tile=16)
    render_tile = make_tile_renderer(scene, cam, cfg, params,
                                     cam_u=cam_u, tape=tape)
    img_tiles = sched.run(render_tile, seed=0)
    np.testing.assert_array_equal(img_tiles, mono.astype(np.float32))


def test_fault_injection_recovers():
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=32, height=24, spp=8, max_depth=3)
    sched = TileScheduler(cfg.width, cfg.height, tile=8,
                          fault_rate=0.5, fault_seed=1)
    render_tile = make_tile_renderer(scene, cam, cfg, params)
    img = sched.run(render_tile, seed=0)
    assert sched.retries > 0  # faults actually fired
    assert np.isfinite(img).all()
    assert img.mean() > 0

    # Idempotence: a clean scheduler reproduces the same image exactly.
    clean = TileScheduler(cfg.width, cfg.height, tile=8)
    img2 = clean.run(render_tile, seed=0)
    np.testing.assert_array_equal(img, img2)


def test_persistent_failure_raises():
    sched = TileScheduler(width=8, height=8, tile=8, max_attempts=2)

    def bad_tile(job, seed):
        raise TileFailure("always down")

    with pytest.raises(TileFailure):
        sched.run(bad_tile, seed=0)


def test_local_jobs_partition():
    sched = TileScheduler(width=64, height=64, tile=16)
    a = sched.local_jobs(process_id=0, process_count=3)
    b = sched.local_jobs(process_id=1, process_count=3)
    c = sched.local_jobs(process_id=2, process_count=3)
    ids = sorted(j.index for js in (a, b, c) for j in js)
    assert ids == [j.index for j in sched.jobs]


def test_heartbeat_single_process():
    assert heartbeat() == 1


def test_two_process_sharded_render_and_grads(tmp_path):
    """REAL multi-process DATA PATH: two jax.distributed processes (4
    virtual CPU devices each) render under an 8-device global mesh with
    the parameter-gradient psum crossing the process boundary. Both
    processes must produce identical replicated outputs, and those must
    match a single-process single-device render of the same config/key
    (the reference's serial loop, src/render.cpp:72-86) to f32 reduction
    tolerance."""
    import json
    import pathlib
    import socket
    import subprocess
    import sys

    import jax.numpy as jnp

    from drt_tpu.config import RenderConfig
    from drt_tpu.models import cbox
    from drt_tpu.parallel.render import make_renderer

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = pathlib.Path(__file__).parent / "multihost_render_worker.py"

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", coord,
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in (0, 1)]
    try:
        for p in procs:
            _, err = p.communicate(timeout=600)
            assert p.returncode == 0, err.decode()[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    meta0 = json.loads((tmp_path / "render_p0.json").read_text())
    assert meta0["global_devices"] == 8
    assert meta0["local_devices"] == 4
    r0 = np.load(tmp_path / "render_p0.npz")
    r1 = np.load(tmp_path / "render_p1.npz")
    # Replicated results agree EXACTLY across processes.
    for k in ("img", "loss", "d_albedo", "d_emission"):
        np.testing.assert_array_equal(r0[k], r1[k])
    assert np.isfinite(r0["img"]).all() and r0["img"].mean() > 0
    assert np.abs(r0["d_albedo"]).max() > 0

    # Single-process, single-device ground truth (same cfg/key/loss).
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=32, height=16, spp=16, max_depth=4)
    render = make_renderer(scene, cfg, cam, differentiable=True,
                           backend="xla")
    key = jax.random.key(17)
    img_ref = np.asarray(render(params, key))
    np.testing.assert_allclose(r0["img"], img_ref, rtol=1e-5, atol=1e-6)
    g_ref = jax.grad(lambda p: (render(p, key) ** 2).sum())(params)
    np.testing.assert_allclose(r0["d_albedo"], np.asarray(g_ref.albedo),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(r0["d_emission"],
                               np.asarray(g_ref.emission),
                               rtol=1e-4, atol=1e-5)
    assert float(r0["loss"]) > 0


def test_two_process_heartbeat_and_redistribution(tmp_path):
    """REAL multi-process runtime: two local CPU processes join a
    jax.distributed group (coordinator on localhost), heartbeat() counts
    2 PROCESSES on both, the static tile partition is disjoint+complete
    across them, and after process 1 exits process 0 adopts its tiles
    and renders to full coverage (the elastic-recovery path)."""
    import json
    import pathlib
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = pathlib.Path(__file__).parent / "multihost_worker.py"

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", coord, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in (0, 1)]
    try:
        for p in procs:
            _, err = p.communicate(timeout=300)
            assert p.returncode == 0, err.decode()[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    r0 = json.loads((tmp_path / "p0.json").read_text())
    r1 = json.loads((tmp_path / "p1.json").read_text())
    assert r0["heartbeat"] == 2 and r1["heartbeat"] == 2
    assert {r0["process_index"], r1["process_index"]} == {0, 1}
    assert r0["process_count"] == 2
    # Static partition: disjoint and complete over the 8 tiles.
    assert sorted(r0["jobs"] + r1["jobs"]) == list(range(8))
    assert not set(r0["jobs"]) & set(r1["jobs"])
    # Survivor adopted exactly the dead peer's tiles and covered the
    # whole image once.
    assert sorted(r0["adopted_jobs"]) == sorted(r1["jobs"])
    assert r0["coverage_complete"] and r0["image_finite"]
