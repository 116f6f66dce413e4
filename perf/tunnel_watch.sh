#!/bin/bash
# Watch for the axon TPU tunnel to come back, then run a queue
# (QUEUE_SCRIPT env, default perf/run_tpu_queue.sh).
#
# Loops a cheap subprocess probe (timeout-bounded, so a wedged relay
# can't hang us) every PROBE_INTERVAL seconds; on probe success it
# hands off to perf/run_tpu_queue.sh (resumable via /tmp/qmark).
#
# Completion logic: after each queue pass, inspect the done-markers.
#  - all rc=0                -> exit 0 (queue genuinely complete)
#  - rc=124/137 (timeout kill), not yet retried -> delete the marker so
#    the next pass re-runs the item once (the documented wedge mode is
#    an item blocking in an RPC until its timeout)
#  - other rc!=0, or second timeout -> left as-is; if nothing remains
#    retryable and nothing is unreachable, exit 3 with a summary
# MAX_WAIT_S bounds CONTINUOUS unreachability only: any successful
# probe resets the clock (a 9 h training pass must not count against
# the give-up budget).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
source perf/probe_device.sh
PROBE_INTERVAL=${PROBE_INTERVAL:-300}
MAX_WAIT_S=${MAX_WAIT_S:-36000}
MARK=${MARK:-/tmp/qmark}
mkdir -p "$MARK"
LAST_UP=$(date +%s)

summary() {
  for f in "$MARK"/*.done; do
    [ -e "$f" ] || continue
    echo "  $(basename "$f" .done): $(cat "$f")"
  done
}

while true; do
  if probe; then
    LAST_UP=$(date +%s)
    echo "== tunnel UP $(date) — running queue"
    bash "${QUEUE_SCRIPT:-perf/run_tpu_queue.sh}" 2>&1 | tee /tmp/queue_run.log
    LAST_UP=$(date +%s)
    # classify the pass
    bad=0 retried=0
    for f in "$MARK"/*.done; do
      [ -e "$f" ] || continue
      rc=$(sed 's/^rc=\([0-9]*\).*/\1/' "$f")
      if [ "$rc" != "0" ]; then
        name=$(basename "$f" .done)
        if { [ "$rc" = "124" ] || [ "$rc" = "137" ]; } \
            && [ ! -f "$MARK/$name.retried" ]; then
          echo "== $name: rc=$rc (timeout), scheduling ONE retry"
          touch "$MARK/$name.retried"
          rm -f "$f"
          retried=1
        else
          bad=1
        fi
      fi
    done
    if grep -q "TPU UNREACHABLE" /tmp/queue_run.log; then
      echo "== queue had unreachable skips; resuming watch $(date)"
    elif [ "$retried" = 1 ]; then
      echo "== re-running queue for retried items $(date)"
      continue
    elif [ "$bad" = 1 ]; then
      echo "== queue complete but items FAILED $(date):"
      summary
      exit 3
    else
      echo "== queue finished clean $(date):"
      summary
      exit 0
    fi
  else
    echo "== tunnel down $(date)"
  fi
  NOW=$(date +%s)
  if [ $((NOW - LAST_UP)) -gt "$MAX_WAIT_S" ]; then
    echo "== giving up after ${MAX_WAIT_S}s continuously unreachable $(date)"
    exit 2
  fi
  sleep "$PROBE_INTERVAL"
done
