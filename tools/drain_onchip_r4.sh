#!/bin/bash
# Round-4 on-chip capture queue (VERDICT r3 #1; docs/ROUND4_NOTES.md §1).
# Run when the axon TPU tunnel is back: captures every pending number
# into logs/ in priority order, tolerating individual failures.
# Usage: bash tools/drain_onchip_r4.sh   (from the repo root)
set -u
mkdir -p logs
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  timeout "$TO" "$@" 2>&1 | tee "logs/r4_${name}.log"
  echo "=== $name rc=${PIPESTATUS[0]} ==="
}

# 1. Headline (fastmath + ratio-carry + chunk-grid dispatch collapse).
TO=3000 run bench python bench.py

# 2. Regen gate: sweep spp_chunks (straggler model) x tile_rows.
TO=4800 run bench_regen python tools/bench_regen.py

# 3. Dyn-regen on the mesh scene.
TO=3600 run bench_dynregen python tools/bench_dynregen.py

# 4. Cluster culling profitability: default two-level, K sweep at L2/L3.
TO=3600 run bench_cluster python tools/bench_cluster.py --levels 1 2 3
TO=2400 run bench_cluster_k8 python tools/bench_cluster.py --levels 2 3 \
    --cluster-k 8 --skip-off
TO=2400 run bench_cluster_k32 python tools/bench_cluster.py --levels 2 3 \
    --cluster-k 32 --skip-off
TO=2400 run bench_cluster_m1 python tools/bench_cluster.py --levels 3 \
    --super-m 1 --skip-off

# 5. Fastmath re-measure after the ratio-carry commits.
TO=2400 run bench_fastmath python tools/bench_fastmath.py

# 6. XLA big-scene bound bisect (process-isolated rungs; a dead rung
#    must not kill the ladder).
for i in 0 1 2 3 4 5; do
  TO=1800 run "repro_xla_rung$i" \
      python tools/repro_xla_bigscene.py --one-rung "$i"
done

# 7. On-chip test subsets (hardware-PRNG paths the CPU can't emulate).
TO=3600 run tpu_tests python -m pytest \
    tests/test_fused.py::test_internal_unbiased_adjoint_on_tpu \
    tests/test_dynkernel.py::test_dyn_unbiased_adjoint_on_tpu \
    tests/test_chunkgrid.py::test_chunkgrid_seeds_advance_on_tpu -x -q

echo "drain complete — see logs/r4_*.log"
