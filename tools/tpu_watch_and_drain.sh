#!/bin/bash
# Probe the axon TPU tunnel every ~10 min; the first time a probe sees
# real TPU devices, run the round-4 on-chip capture queue
# (tools/drain_onchip_r4.sh) exactly once (lockfile-guarded) and exit.
# Run detached from the repo root: bash tools/tpu_watch_and_drain.sh &
# Progress: logs/tpu_watch.log, then logs/r4_*.log from the drain.
set -u
cd "$(dirname "$0")/.." || exit 1
mkdir -p logs
log() { echo "$(date -u +%FT%TZ) $*" >> logs/tpu_watch.log; }

log "watcher start (pid $$)"
while :; do
  out=$(timeout 120 python -c "import jax; print(jax.devices())" 2>&1)
  rc=$?
  if [ $rc -eq 0 ] && echo "$out" | grep -qi "axon\|tpu"; then
    log "TPU up: $out"
    if mkdir logs/.drain_lock 2>/dev/null; then
      log "drain starting"
      bash tools/drain_onchip_r4.sh >> logs/tpu_watch.log 2>&1
      log "drain complete"
    else
      log "drain already running/done elsewhere; exiting"
    fi
    exit 0
  fi
  log "probe rc=$rc (down): $(echo "$out" | tail -1 | cut -c1-120)"
  sleep 600
done
