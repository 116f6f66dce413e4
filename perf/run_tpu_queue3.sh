#!/bin/bash
# Round-4 queue 3: re-run the items that failed on the train_medusa
# HTTP-413 bug (frozen params were CLOSED OVER by the jitted chunk fn,
# embedding ~1 GB of weight constants in the remote-compile request —
# fixed by passing them as jit arguments, cli/train_medusa.py).
#
# Mechanism: delete the rc=1 markers and re-invoke the main queue — it
# skips every .done item and re-runs just these four, serially, with
# the same probes/timeouts/logs.
#
# Usage: bash perf/run_tpu_queue3.sh   (run ONLY when no other TPU
# process is active — ONE TPU process at a time, CLAUDE.md)
set -u
cd "$(dirname "$0")/.."
MARK=/tmp/qmark
for m in medusa_small spec_medusa spec_medusa_tree engine_tree; do
  if [ -f "$MARK/$m.done" ] && ! grep -q '^rc=0' "$MARK/$m.done"; then
    was=$(cat "$MARK/$m.done")
    rm -f "$MARK/$m.done"
    echo "requeued $m (was: $was)"
  fi
done
exec bash perf/run_tpu_queue.sh
