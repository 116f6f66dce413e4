#!/bin/bash
# Round-4 queue 4 (final): items re-run after in-queue fixes.
#
# 1. int4 capacity FRONTIER, split per config: the queue-2 int4_frontier
#    run was killed when its param disk cache was found to return HOST
#    arrays — every decode call re-uploaded the tree through the
#    ~100 MB/s tunnel (w8kv8 b64 measured 98x vs the morning's 796x).
#    bench_capacity now device_puts once; per-point subprocesses pick
#    the fix up from disk. w8kv8 sweeps to its OOM point; w4kv4 probes
#    the capacity frontier beyond it.
# 2. corpus_report_small: per-language held-out breakdown on the
#    corpus-trained whisper-small (skipped in queue 2 for budget).
#
# Run AFTER the queue-2 runner exits (ONE TPU process at a time):
#   nohup bash -c 'while kill -0 <q2pid> 2>/dev/null; do sleep 60; done; \
#     bash perf/run_tpu_queue4.sh' > /tmp/queue4_runner.log 2>&1 &
#   echo $! > /tmp/queue4.pid   # bench.py queue-wait keys on this file
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

# Items stop starting past this deadline (driver's end-of-round bench
# needs the chip; it waits on /tmp/queue4.pid while we run).
DEADLINE=${QUEUE4_DEADLINE:-1787166600}   # 2026-08-19 19:10 UTC
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }

# WARM-started distillation: the queue-2 distill_draft trained the
# student from RANDOM init (12k samples seen) and measured 1.15 t/r —
# capability-starved, not alignment-starved (the corpus tiny at 128k
# samples already accepts 3.74 t/r). Distill FROM that checkpoint: the
# capable student + teacher-KL alignment is the experiment the r3
# negative result actually called for.
CORPUS=/tmp/corpus
if [ -d "$CORPUS/run_tiny/best-checkpoint" ] && ! past_deadline; then
  item distill_warm 2700 \
    python -m whisper_ipa_tpu.cli.distill_draft --student tiny \
      --teacher small --teacher-checkpoint "$CORPUS/run_small/best-checkpoint" \
      --full-checkpoint --student-checkpoint "$CORPUS/run_tiny/best-checkpoint" \
      --train-data $CORPUS/data/train.json --steps 1500 --batch-size 8 \
      --mel-cache-dir $CORPUS/melcache --output-dir $CORPUS/draft_warm
  if [ -d "$CORPUS/draft_warm/checkpoint-1500" ] && ! past_deadline; then
    item spec_distilled_warm 2700 \
      python bench.py --draft-checkpoint $CORPUS/draft_warm/checkpoint-1500 \
        --draft tiny --checkpoint "$CORPUS/run_small/best-checkpoint" \
        --spec-data $CORPUS/data/test.json --model small \
        --mel-cache-dir $CORPUS/melcache
  fi
fi

if ! past_deadline; then
  item int4_frontier_w8 5400 \
    python perf/bench_capacity.py --configs w8kv8 \
      --batches 80,96,128,160,192
fi
if ! past_deadline; then
  item int4_frontier_w4 5400 \
    python perf/bench_capacity.py --configs w4kv4 \
      --batches 96,160,224
fi
if [ -d /tmp/corpus/run_small/best-checkpoint ] && ! past_deadline; then
  item corpus_report_small 3600 \
    python examples/corpus_report.py --run-dir /tmp/corpus/run_small \
      --data /tmp/corpus/data/test.json --model small \
      --mel-cache-dir /tmp/corpus/melcache --batch 32
fi

echo "== queue4 complete $(date)"
