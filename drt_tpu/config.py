"""Render configuration.

The reference exposes width/height/samples/min-bounces/absorb-prob as CLI
flags (reference: src/args.hpp:19-67) and has *unbounded* recursion depth
terminated only by Russian roulette (reference: include/drt/pathtracer.hpp:121-136).
A TPU wavefront needs a static trip count, so `max_depth` bounds the bounce
scan; with absorb prob a the truncated tail mass is <= (1-a)^(max_depth -
min_bounces), e.g. < 1e-9 relative at defaults with max_depth=32.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (hashable) configuration for the wavefront tracer.

    Defaults mirror the reference CLI defaults (src/args.hpp:24,32,40,48,56):
    640x480, 100 spp, min_bounces=1, absorb_prob=0.5.
    """

    width: int = 640
    height: int = 480
    spp: int = 100
    min_bounces: int = 1
    absorb_prob: float = 0.5
    max_depth: int = 32
    # Gradient mode of the radiative-backprop adjoint:
    #   biased=False  -> backward retraces with *fresh* RNG keys
    #                    (reference: include/drt/integrate.hpp:11-24,39-52)
    #   biased=True   -> backward replays the forward's keys; equals
    #                    autodiff of the forward estimator
    #                    (reference: include/drt/integrate.hpp:26-37)
    # The reference tracer hard-codes biased mode (pathtracer.hpp:111).
    unbiased: bool = False
    # Number of sample-per-pixel chunks rendered sequentially (lax.map) to
    # bound live wavefront memory on large renders. spp % spp_chunks == 0.
    spp_chunks: int = 1
