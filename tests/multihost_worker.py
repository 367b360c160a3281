"""Subprocess worker for the real 2-process multihost test
(tests/test_multihost.py::test_two_process_heartbeat_and_redistribution).

Each worker joins a jax.distributed process group over localhost,
heartbeats, claims its static tile partition, and — on process 0 —
adopts the peer's tiles after the peer exits (the orchestration-layer
redistribution path: a dead host's tiles are just re-dispatched,
SURVEY.md §5 "failure detection / elastic recovery")."""

import json
import pathlib
import sys

import numpy as np

# Workers are spawned with an arbitrary cwd; make the repo importable.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    outdir = pathlib.Path(sys.argv[4])

    import jax
    jax.config.update("jax_platforms", "cpu")

    from drt_tpu.parallel.multihost import (TileScheduler, heartbeat,
                                            initialize)

    initialize(coordinator_address=coord, num_processes=nproc,
               process_id=pid)
    hb = heartbeat()

    sched = TileScheduler(width=64, height=32, tile=16)
    mine = [j.index for j in sched.local_jobs()]

    out = {
        "heartbeat": hb,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "jobs": mine,
    }

    if pid == 0:
        # Peer 1 exits after writing its result; process 0 plays the
        # elastic survivor: wait for the peer's tombstone, then adopt
        # its tiles via the same static partition function and render
        # them (pure host-side work — no collectives with a dead peer).
        peer_file = outdir / "p1.json"
        import time
        deadline = time.time() + 120
        while not peer_file.exists() and time.time() < deadline:
            time.sleep(0.2)
        dead = sched.local_jobs(process_id=1, process_count=nproc)
        covered = np.zeros((32, 64), np.int32)

        def render_tile(job, seed):
            covered[job.y0:job.y0 + job.height,
                    job.x0:job.x0 + job.width] += 1
            return np.full((job.height, job.width, 3), 1.0, np.float32)

        survivor = TileScheduler(width=64, height=32, tile=16)
        survivor.jobs = sched.local_jobs(process_id=0,
                                         process_count=nproc) + dead
        img = survivor.run(render_tile, seed=0)
        out["adopted_jobs"] = [j.index for j in dead]
        out["coverage_complete"] = bool((covered == 1).all())
        out["image_finite"] = bool(np.isfinite(img).all())

    (outdir / f"p{pid}.json").write_text(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
