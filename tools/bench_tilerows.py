import sys, time, json
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from drt_tpu.config import RenderConfig
from drt_tpu.models import cbox
from drt_tpu.fused import make_fused_image_renderer, seeds_from_key

scene, params, cam = cbox.build(dtype=jnp.float32)
cfg = RenderConfig(width=640, height=480, spp=256, max_depth=5, spp_chunks=16)
seeds = seeds_from_key(jax.random.key(0))
n = 640 * 480 * 256

def best(f, *a, reps=4):
    jax.block_until_ready(f(*a)); b = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(f(*a)); b = min(b, time.perf_counter() - t0)
    return b

for tr in (8, 16, 32, 64):
    render = make_fused_image_renderer(scene, cam, cfg, tile_rows=tr)
    fb = jax.jit(lambda p, s: jax.value_and_grad(lambda pp: render(pp, s).sum())(p))
    fw = jax.jit(lambda p, s: render(p, s))
    t_f = best(fw, params, seeds)
    t_fb = best(fb, params, seeds)
    print(json.dumps({"tile_rows": tr,
                      "fwd_ms": round(t_f * 1e3, 1),
                      "fwdbwd_ms": round(t_fb * 1e3, 1),
                      "fwd_mrays": round(n / t_f / 1e6, 1),
                      "fwdbwd_mrays": round(n / t_fb / 1e6, 1)}), flush=True)
