#!/bin/bash
# Round-5 queue 7: finish the verdict's open measurements after queue 6.
#   1-2. per-language corpus reports (tiny + small) -> tracked results/
#   3.   perturbed-acoustics eval (train/test decoupling proxy)
#   4.   large-v3 beam-5 RTF point (VERDICT #7)
#   5.   large-v3 engine tokens/s point (VERDICT #7)
#   6.   adaptive steps-per-sync engine A/B on the trained small
#   7.   collect result JSONs into the tracked results/ dir
#
# HARD DEADLINE (round-4 lesson: no queue item may straddle the round
# boundary): items are SKIPPED — marker written — when their full
# timeout would not fit before QUEUE7_DEADLINE (epoch seconds, default
# 08:15 UTC today). The driver's end-of-round bench then never waits.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
MARK=/tmp/qmark7
mkdir -p "$MARK"
IDX=-1
ART=/root/repo/artifacts
export WHISPER_IPA_TPU_AOT_CACHE="$ART/aotcache"
export WHISPER_IPA_TPU_AOT_FAST_DISK=1
DEADLINE=${QUEUE7_DEADLINE:-$(date -d "08:15" +%s)}

source perf/probe_device.sh

item() {  # item <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  IDX=$((IDX + 1))
  if [ -f "$MARK/$name.done" ]; then
    echo "== [$IDX] $name: marker exists ($(cat "$MARK/$name.done")), skip"
    return 0
  fi
  local now remaining
  now=$(date +%s)
  remaining=$((DEADLINE - now))
  if [ "$remaining" -lt "$tmo" ]; then
    echo "rc=SKIPPED deadline ($remaining s left < ${tmo}s timeout) $(date)" \
      > "$MARK/$name.done"
    echo "== [$IDX] $name: SKIPPED (deadline: ${remaining}s left)"
    return 0
  fi
  if ! probe; then
    echo "== [$IDX] $name: TPU UNREACHABLE, skipping (queue continues probing)"
    return 1
  fi
  echo "== [$IDX] $name: START $(date +%H:%M:%S) (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "/tmp/q7_$name.log" 2>&1
  local rc=$?
  echo "rc=$rc $(date)" > "$MARK/$name.done"
  echo "== [$IDX] $name: DONE rc=$rc $(date +%H:%M:%S) (log /tmp/q7_$name.log)"
  return 0
}

# 1-2. per-language held-out reports (regenerate the r4 /tmp-era
# artifacts from the queue-6 retrained checkpoints; VERDICT #5)
item corpus_report_small 5400 \
  python examples/corpus_report.py --run-dir "$ART/corpus/run_small" \
    --data "$ART/corpus/data/test.json" --model small \
    --mel-cache-dir "$ART/corpus/melcache" --batch 16
item corpus_report_tiny 3600 \
  python examples/corpus_report.py --run-dir "$ART/corpus/run_tiny" \
    --data "$ART/corpus/data/test.json" --model tiny \
    --mel-cache-dir "$ART/corpus/melcache" --batch 32

# 3. acoustic train/test decoupling (VERDICT #6): perturbed held-out
# split through the exact evaluate path
item perturbed_small 7200 \
  python examples/perturbed_eval.py --run-dir "$ART/corpus/run_small" \
    --data "$ART/corpus/data/test.json" --model small --batch 16

# 4. large-v3 beam-5 RTF (VERDICT #7): beam economics on the model
# where step cost favors the new machinery
item beam_large 5400 \
  python perf/bench_beam.py --model large-v3 --batches 8 16 --no-legacy

# 5. large-v3 engine point (VERDICT #7): tokens/s at 16 slots
item engine_large 3600 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 python bench.py --continuous \
    --batch 16 --model large-v3

# 6. adaptive steps-per-sync A/B (VERDICT #4): trained small + real
# audio; compare against queue 6's engine_ttft_plain_* rows
item engine_adaptive 3600 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 python bench.py --continuous \
    --batch 16 --model small \
    --checkpoint "$ART/corpus/run_small/best-checkpoint" \
    --spec-data "$ART/corpus/data/test.json" --adaptive-sync

# 7. make the evidence durable (VERDICT #5)
item collect_results 600 python perf/collect_results.py

echo "== queue 7 complete $(date)"
