#!/bin/bash
# Round-4 queue 5 (final): clean int4 capacity re-sweep + AOT isolation.
#
# Queue-1's int4_capacity data is COMPROMISED: the bench_capacity param
# disk cache landed on disk (uncommitted) mid-sweep at ~13:30, and the
# per-point subprocesses import from disk — so points after that ran
# host-numpy params (re-uploaded through the ~100 MB/s tunnel every
# call) while earlier points ran device-resident. The apparent int4
# "cliffs" coincide with cache-hit points, not with batch thresholds.
# Re-measure the low-batch curve with the fixed (device_put) code, and
# finish the w4kv4 frontier past int8's OOM at 96.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
MARK=/tmp/qmark
mkdir -p "$MARK"
IDX=-1

export WHISPER_IPA_TPU_AOT_CACHE=/tmp/aotcache_queue

source perf/probe_device.sh

item() {  # item <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  IDX=$((IDX + 1))
  if [ -f "$MARK/$name.done" ]; then
    echo "== [$IDX] $name: marker exists ($(cat "$MARK/$name.done")), skip"
    return 0
  fi
  if ! probe; then
    echo "== [$IDX] $name: TPU UNREACHABLE, skipping (queue continues probing)"
    return 1
  fi
  echo "== [$IDX] $name: START $(date +%H:%M:%S) (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "/tmp/q_$name.log" 2>&1
  local rc=$?
  echo "rc=$rc $(date)" > "$MARK/$name.done"
  echo "== [$IDX] $name: DONE rc=$rc $(date +%H:%M:%S) (log /tmp/q_$name.log)"
  return 0
}

DEADLINE=${QUEUE5_DEADLINE:-1787166600}   # 19:10 UTC
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }

# 0. The w4kv4 b160 point failed with EMPTY stderr in the sweep (the
#    sweep shows only the last stderr line) — run it direct so the full
#    traceback lands in the log, deciding OOM vs infrastructure.
if ! past_deadline; then
  item int4_w4kv4_b160 1800 \
    python -c "import sys; sys.path.insert(0, 'perf'); \
from bench_capacity import try_point; \
print(try_point('large-v3', 160, 32, 4, 4))"
fi

# 1. Clean low-batch re-sweep (replaces the polluted queue-1 points).
if ! past_deadline; then
  item int4_clean_w4kv4 5400 \
    python perf/bench_capacity.py --configs w4kv4 --batches 8,32,64,128
fi
if ! past_deadline; then
  item int4_clean_mixed 5400 \
    python perf/bench_capacity.py --configs w8kv4,w4kv8 --batches 32,64
fi

# 2. AOT serve-start isolation (aot_start1/2 FAILED_PRECONDITION).
if ! past_deadline; then
  item aot_isolate 3600 bash perf/aot_isolate.sh
fi

# 3. Per-language report on the corpus-trained small (expendable).
if [ -d /tmp/corpus/run_small/best-checkpoint ] && ! past_deadline; then
  item corpus_report_small 3600 \
    python examples/corpus_report.py --run-dir /tmp/corpus/run_small \
      --data /tmp/corpus/data/test.json --model small \
      --mel-cache-dir /tmp/corpus/melcache --batch 32
fi

echo "== queue5 complete $(date)"
