"""Subprocess worker for the real 2-process SHARDED RENDER test
(tests/test_multihost.py::test_two_process_sharded_render_and_grads).

Each worker contributes 4 virtual CPU devices to a jax.distributed
process group; the 8-device global mesh runs the XLA wavefront renderer
under sharding constraints with the parameter-gradient psum crossing the
process boundary — the actual multi-host data path (SURVEY.md §2
"communication backend": DP over rays, replicated params, grad
all-reduce), not just the control plane."""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    outdir = pathlib.Path(sys.argv[4])

    import os
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from drt_tpu.config import RenderConfig
    from drt_tpu.models import cbox
    from drt_tpu.parallel.multihost import initialize
    from drt_tpu.parallel.render import make_renderer

    initialize(coordinator_address=coord, num_processes=nproc,
               process_id=pid)
    assert jax.device_count() == 4 * nproc, jax.device_count()

    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=32, height=16, spp=16, max_depth=4)
    mesh = Mesh(np.asarray(jax.devices()).reshape(4 * nproc, 1),
                ("tiles", "spp"))
    # Replicate the (tiny) params globally: identical host values on
    # every process + a fully-replicated sharding is the multi-host
    # analogue of the reference's single shared heap (src/render.cpp
    # shared_ptr params).
    rep = NamedSharding(mesh, P())
    params_g = jax.device_put(params, rep)

    render = make_renderer(scene, cfg, cam, mesh=mesh,
                           differentiable=True, backend="xla")
    key = jax.random.key(17)

    # Replicated out_shardings: every process gets a full copy of the
    # (small) image and gradients after the cross-process psum.
    render_j = jax.jit(lambda p: render(p, key), out_shardings=rep)

    def loss(pp):
        return (render(pp, key) ** 2).sum()

    loss_and_grad = jax.jit(jax.value_and_grad(loss),
                            out_shardings=(rep, rep))

    img = render_j(params_g)
    val, grads = loss_and_grad(params_g)
    # Outputs are replicated; every process holds a full addressable copy.
    img_np = np.asarray(img.addressable_data(0)).reshape(16, 32, 3)
    np.savez(outdir / f"render_p{pid}.npz",
             img=img_np,
             loss=np.asarray(val.addressable_data(0)),
             d_albedo=np.asarray(grads.albedo.addressable_data(0)),
             d_emission=np.asarray(grads.emission.addressable_data(0)))
    (outdir / f"render_p{pid}.json").write_text(json.dumps({
        "process_index": jax.process_index(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
