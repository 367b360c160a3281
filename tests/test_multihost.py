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
