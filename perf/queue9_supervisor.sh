#!/bin/bash
# Round-5 queue-9 supervisor: queue 9 under tunnel_watch with a HARD
# wall-clock cutoff (round ends 09:44:40 UTC; items self-skip at
# QUEUE9_DEADLINE 09:10, tree-kill at Q9_CUTOFF 09:14) so the chip is
# idle for the final test-subset run and the driver's end-of-round
# bench. Same structure as queue8_supervisor.sh.
set -u
cd "$(dirname "$0")/.."
export QUEUE9_DEADLINE=${QUEUE9_DEADLINE:-$(date -d "09:10" +%s)}
Q9_CUTOFF=${Q9_CUTOFF:-$(date -d "09:14" +%s)}

kill_tree() {  # kill a pid and its descendants by explicit pid, never by pattern
  local pid=$1
  local kids
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  for k in $kids; do
    kill_tree "$k"
  done
  kill -9 "$pid" 2>/dev/null
}

(
  QUEUE_SCRIPT=perf/run_tpu_queue9.sh MAX_WAIT_S=1800 MARK=/tmp/qmark9 \
    PROBE_INTERVAL=120 \
    bash perf/tunnel_watch.sh > /tmp/watch9.log 2>&1
  echo "== watch9 exit rc=$? $(date)" >> /tmp/watch9.log
) &
W9=$!
echo "$W9" > /tmp/queue9.pid
echo "== supervisor: queue 9 watch pid $W9, deadline $(date -d @$QUEUE9_DEADLINE +%H:%M), cutoff $(date -d @$Q9_CUTOFF +%H:%M)"
while kill -0 "$W9" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$Q9_CUTOFF" ]; then
    echo "== supervisor: Q9 cutoff reached, killing tree of $W9 $(date)"
    kill_tree "$W9"
    break
  fi
  sleep 30
done
rm -f /tmp/queue9.pid
echo "== supervisor: queue 9 done $(date) — TPU idle for the driver"
