#!/bin/bash
# Watch for the axon TPU tunnel to come back, then run the r4 queue.
#
# Loops a cheap subprocess probe (timeout-bounded, so a wedged relay
# can't hang us) every PROBE_INTERVAL seconds; on first success it
# hands off to perf/run_tpu_queue.sh (resumable via /tmp/qmark).
# Exits 0 when the queue script finishes with no TPU-unreachable skips,
# exits 2 after MAX_WAIT_S without ever reaching the device.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
PROBE_INTERVAL=${PROBE_INTERVAL:-300}
MAX_WAIT_S=${MAX_WAIT_S:-36000}
START=$(date +%s)

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d[0].platform != "cpu"
EOF
}

while true; do
  if probe; then
    echo "== tunnel UP $(date) — running queue"
    bash perf/run_tpu_queue.sh 2>&1 | tee /tmp/queue_run.log
    if grep -q "TPU UNREACHABLE" /tmp/queue_run.log; then
      echo "== queue had unreachable skips; resuming watch $(date)"
    else
      echo "== queue finished clean $(date)"
      exit 0
    fi
  else
    echo "== tunnel down $(date)"
  fi
  NOW=$(date +%s)
  if [ $((NOW - START)) -gt "$MAX_WAIT_S" ]; then
    echo "== giving up after ${MAX_WAIT_S}s $(date)"
    exit 2
  fi
  sleep "$PROBE_INTERVAL"
done
