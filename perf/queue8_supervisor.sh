#!/bin/bash
# Round-5 queue-8 supervisor: run queue 8 under tunnel_watch with a HARD
# wall-clock cutoff so nothing straddles the round boundary (the round-4
# lesson). Items self-skip at QUEUE8_DEADLINE (default 09:30 UTC); the
# supervisor pid-tree-kills any overrun at Q8_CUTOFF (default 09:45).
# After the cutoff the TPU is idle for the full-suite run and the
# driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
export QUEUE8_DEADLINE=${QUEUE8_DEADLINE:-$(date -d "09:30" +%s)}
Q8_CUTOFF=${Q8_CUTOFF:-$(date -d "09:45" +%s)}

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
  QUEUE_SCRIPT=perf/run_tpu_queue8.sh MAX_WAIT_S=7200 MARK=/tmp/qmark8 \
    bash perf/tunnel_watch.sh > /tmp/watch8.log 2>&1
  echo "== watch8 exit rc=$? $(date)" >> /tmp/watch8.log
) &
W8=$!
echo "$W8" > /tmp/queue8.pid
echo "== supervisor: queue 8 watch pid $W8, deadline $(date -d @$QUEUE8_DEADLINE +%H:%M), cutoff $(date -d @$Q8_CUTOFF +%H:%M)"
while kill -0 "$W8" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$Q8_CUTOFF" ]; then
    echo "== supervisor: Q8 cutoff reached, killing tree of $W8 $(date)"
    kill_tree "$W8"
    break
  fi
  sleep 60
done
rm -f /tmp/queue8.pid
echo "== supervisor: queue 8 done $(date) — TPU idle for the suite + driver"
