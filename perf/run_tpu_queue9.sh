#!/bin/bash
# Round-5 queue 9: a SECOND VM reboot (~08:00 UTC) killed queue 8 at
# small-train step 4000/7000 and wiped /tmp + artifacts/ again, with
# ~80 min of round left. This queue is sized to that budget (the
# round-4 lesson, applied twice): every item's FULL timeout must fit
# before QUEUE9_DEADLINE or it self-skips; the supervisor kills the
# tree at its cutoff, leaving the chip idle for the driver's bench.
#
# Priorities for the time that remains:
#   0. synth + train tiny 1000 steps (save-every 150: even a partial
#      run yields a discoverable trained checkpoint)
#   1. bench.py end-to-end -> records a FRESH headline incl. the
#      trained real-audio row into tracked results/bench_latest.json
#      and warms artifacts/aotcache for the driver's end-of-round run
#      (VERDICT #1, the round's top deliverable)
#   2-4. fast-disk serve-start A/B (VERDICT #2's cheapest open item)
#   5. beam-5 vs greedy quality A/B on the tiny checkpoint (VERDICT #2;
#      tiny stands in for small — small needs a 2.3 h retrain that no
#      longer fits; the substitution is documented in PERF.md)
#   final. collect result JSONs into tracked results/ (unconditional)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
MARK=/tmp/qmark9
mkdir -p "$MARK"
IDX=-1
ART=/root/repo/artifacts
mkdir -p "$ART"
export WHISPER_IPA_TPU_AOT_CACHE="$ART/aotcache"
export WHISPER_IPA_TPU_AOT_FAST_DISK=1
DEADLINE=${QUEUE9_DEADLINE:-$(date -d "09:10" +%s)}

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
  timeout "$tmo" "$@" > "/tmp/q9_$name.log" 2>&1
  local rc=$?
  echo "rc=$rc $(date)" > "$MARK/$name.done"
  echo "== [$IDX] $name: DONE rc=$rc $(date +%H:%M:%S) (log /tmp/q9_$name.log)"
  return 0
}

# 0. trained checkpoint for the bench's real-audio row: tiny, 1000
#    steps (the 4000-step/60-min r4 config does not fit the remaining
#    budget; quality at 1000 steps is reported as-is)
item corpus_tiny_1k 1900 \
  python examples/corpus_scale.py --model tiny --steps 1000 \
    --batch-size 32 --bf16 --lr 2e-4 --skip-floor \
    --val-samples 100 --save-every 150 --validate-every 99999 \
    --out "$ART/corpus"

# 1. THE deliverable: fresh recorded headline + trained row, warm AOT
item bench_full 1200 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 python bench.py

# 2-4. fast-disk pre-trace serve-start A/B (queue-6/8 items never ran)
BENCH16="python bench.py --batch 16 --sample-len 16 --no-trained-row"
item aot_fast_warmup 600 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 WHISPER_IPA_TPU_AOT_FAST_DISK=1 \
  $BENCH16
item aot_fast_start 450 \
  bash -c "time env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 WHISPER_IPA_TPU_AOT_FAST_DISK=1 $BENCH16"
item aot_exact_start 450 \
  bash -c "time env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 WHISPER_IPA_TPU_AOT_FAST_DISK=0 $BENCH16"

# 5. beam-5 vs greedy QUALITY A/B on the trained tiny (VERDICT #2)
item eval_beam_vs_greedy_tiny 1000 bash -c "
  python -m whisper_ipa_tpu.cli.evaluate_model \
    --checkpoint \$(python -c 'from whisper_ipa_tpu.train.checkpoints import latest_checkpoint; import os; b=\"$ART/corpus/run_tiny/best-checkpoint\"; print(b if os.path.isdir(b) else latest_checkpoint(\"$ART/corpus/run_tiny\"))') \
    --full-checkpoint --base-model tiny --skip-base --batch-size 32 \
    --num-samples 64 --test-data $ART/corpus/data/test.json &&
  python -m whisper_ipa_tpu.cli.evaluate_model \
    --checkpoint \$(python -c 'from whisper_ipa_tpu.train.checkpoints import latest_checkpoint; import os; b=\"$ART/corpus/run_tiny/best-checkpoint\"; print(b if os.path.isdir(b) else latest_checkpoint(\"$ART/corpus/run_tiny\"))') \
    --full-checkpoint --base-model tiny --skip-base --batch-size 32 \
    --num-samples 64 --test-data $ART/corpus/data/test.json --beam-size 5"

# final: make the evidence durable — CPU-only, unconditional
echo "== [final] collect_results: START $(date +%H:%M:%S)"
timeout 600 python perf/collect_results.py > /tmp/q9_collect_results.log 2>&1
echo "rc=$? $(date)" > "$MARK/collect_results.done"

echo "== queue 9 complete $(date)"
