#!/bin/bash
# Round-5 schedule supervisor: queue 6 (already running) -> queue 7,
# with hard wall-clock cutoffs so NOTHING straddles the round boundary
# (the round-4 lesson — the driver's bench sat behind a live queue).
#
#   Q6_CUTOFF  (default 05:45 UTC): if queue 6 is still running, kill
#              its process tree by explicit pids (never by pattern).
#   QUEUE7_DEADLINE (default 08:15 UTC): queue 7 items self-skip when
#              their timeout doesn't fit (run_tpu_queue7.sh).
#   Q7_CUTOFF  (default 08:30 UTC): kill queue 7's tree too.
#
# After both queues: the TPU is idle for the driver's end-of-round
# bench; the repo's final test-suite run happens separately.
set -u
cd "$(dirname "$0")/.."
Q6_PIDFILE=/tmp/queue6.pid
Q6_CUTOFF=${Q6_CUTOFF:-$(date -d "05:45" +%s)}
Q7_CUTOFF=${Q7_CUTOFF:-$(date -d "08:30" +%s)}

kill_tree() {  # kill_tree <pid>: kill a pid and its descendants by pid
  local pid=$1
  local kids
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  for k in $kids; do
    kill_tree "$k"
  done
  kill -9 "$pid" 2>/dev/null
}

# -- phase 1: wait out queue 6 ------------------------------------------
if [ -f "$Q6_PIDFILE" ]; then
  Q6=$(cat "$Q6_PIDFILE")
  while kill -0 "$Q6" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$Q6_CUTOFF" ]; then
      echo "== supervisor: Q6 cutoff reached, killing tree of $Q6 $(date)"
      kill_tree "$Q6"
      break
    fi
    sleep 60
  done
fi
echo "== supervisor: queue 6 finished/cut $(date)"

# -- phase 2: queue 7 ----------------------------------------------------
(
  QUEUE_SCRIPT=perf/run_tpu_queue7.sh MAX_WAIT_S=7200 MARK=/tmp/qmark7 \
    bash perf/tunnel_watch.sh > /tmp/watch7.log 2>&1
  echo "== watch7 exit rc=$? $(date)" >> /tmp/watch7.log
) &
W7=$!
echo "$W7" > /tmp/queue7.pid
while kill -0 "$W7" 2>/dev/null; do
  if [ "$(date +%s)" -ge "$Q7_CUTOFF" ]; then
    echo "== supervisor: Q7 cutoff reached, killing tree of $W7 $(date)"
    kill_tree "$W7"
    break
  fi
  sleep 60
done
rm -f /tmp/queue7.pid
echo "== supervisor: all queues done $(date) — TPU idle for the driver"
