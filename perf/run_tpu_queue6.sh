#!/bin/bash
# Round-4 continuation queue 6: restore the trained-artifact evidence
# after the VM reboot wiped /tmp (corpus data, checkpoints, medusa
# sidecar, AOT cache all lived there). Everything retrains into the
# repo-local gitignored artifacts/ dir so the next reboot costs nothing:
#   1. synth + train tiny   (acceptance draft + fast sanity)
#   2. train small          (the flagship trained row: PER/PFER source)
#   3. medusa heads + accuracy sidecar on the trained small
#   4. bench.py end-to-end validation (headline + trained row, warms
#      the artifacts/aotcache the driver's end-of-round run will hit)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
MARK=/tmp/qmark
mkdir -p "$MARK"
IDX=-1
ART=/root/repo/artifacts
mkdir -p "$ART"
# every item shares the serialized-executable cache bench.py defaults
# to, so repeated decode/validate programs compile ONCE per shape
export WHISPER_IPA_TPU_AOT_CACHE="$ART/aotcache"
export WHISPER_IPA_TPU_AOT_FAST_DISK=1

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

# 1. tiny: 4000 steps, resumable (save_every caps at 250 internally)
item corpus_tiny_art 7200 \
  python examples/corpus_scale.py --model tiny --steps 4000 \
    --batch-size 32 --bf16 --lr 2e-4 --out "$ART/corpus"

# 2. small: the trained-row flagship (r4 measured PER 6.94 at 6000
# steps; 9000 here — validation-selected best checkpoint keeps whatever
# point generalizes best, so extra steps can only help)
item corpus_small_art 18000 \
  python examples/corpus_scale.py --model small --steps 9000 \
    --batch-size 16 --bf16 --remat --lr 1e-4 --skip-floor \
    --out "$ART/corpus"

# 3. medusa heads on the trained small (+ accuracy sidecar for the tree)
item medusa_small_art 7200 \
  python -m whisper_ipa_tpu.cli.train_medusa --model small \
    --checkpoint "$ART/corpus/run_small/best-checkpoint" \
    --full-checkpoint --train-data "$ART/corpus/data/train.json" \
    --steps 1500 --batch-size 8 --n-heads 4 \
    --mel-cache-dir "$ART/corpus/melcache" \
    --output "$ART/corpus/medusa_small.safetensors"

# 4. end-to-end driver-flow validation: headline + trained row, and the
#    artifacts/aotcache gets warmed for the driver's end-of-round run
item bench_validate 7200 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 python bench.py

# 5-7. serve-start A/B for the fast-disk pre-trace key (same point as
# the queue-5 measurement: whisper-small greedy, batch 16, 16 tokens).
# 5 warms the cache (compiles once, mirrors under fk_ keys); 6 measures
# the fast-disk warm start (should skip trace+lower: target well under
# the 72-98 s exact-key warm start); 7 re-measures the exact-key warm
# start same-day for a fair baseline.
BENCH16="python bench.py --batch 16 --sample-len 16 --no-trained-row"
item aot_fast_warmup 2400 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 WHISPER_IPA_TPU_AOT_FAST_DISK=1 \
  $BENCH16
item aot_fast_start 2400 \
  bash -c "time env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 WHISPER_IPA_TPU_AOT_FAST_DISK=1 $BENCH16"
item aot_exact_start 2400 \
  bash -c "time env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 WHISPER_IPA_TPU_AOT_FAST_DISK=0 $BENCH16"

# 7b. beam-5 vs greedy QUALITY on the trained small checkpoint (the
# beam path so far has only throughput numbers): held-out corpus test
# split, 100 samples, same batch — does beam buy PER/PFER on this task?
item eval_beam_vs_greedy 5400 bash -c "
  python -m whisper_ipa_tpu.cli.evaluate_model \
    --checkpoint $ART/corpus/run_small/best-checkpoint --full-checkpoint \
    --base-model small --skip-base --batch-size 16 --num-samples 100 \
    --test-data $ART/corpus/data/test.json &&
  python -m whisper_ipa_tpu.cli.evaluate_model \
    --checkpoint $ART/corpus/run_small/best-checkpoint --full-checkpoint \
    --base-model small --skip-base --batch-size 16 --num-samples 100 \
    --test-data $ART/corpus/data/test.json --beam-size 5"

# 8-11. engine TTFT A/B for the join fast-sync path (1-round chunk
# after a join): plain greedy and medusa-tree, 16 slots, trained small
# + real held-out audio — compare ttft_p50/p90 and tokens/s vs the
# fixed-chunk engine the r4 slots sweep measured.
ENG="python bench.py --continuous --batch 16 --model small \
  --checkpoint $ART/corpus/run_small/best-checkpoint \
  --spec-data $ART/corpus/data/test.json"
item engine_ttft_plain_fast 3600 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 $ENG
item engine_ttft_plain_fixed 3600 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 $ENG --no-join-fast-sync
item engine_ttft_tree_fast 3600 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 $ENG \
    --medusa-weights "$ART/corpus/medusa_small.safetensors" --medusa-tree
item engine_ttft_tree_fixed 3600 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 $ENG \
    --medusa-weights "$ART/corpus/medusa_small.safetensors" --medusa-tree \
    --no-join-fast-sync

# 12. medusa-tree at 32 slots (r4 measured tree@16 > plain@32; the
# tree engine's own scaling point at 32 was never taken)
item engine_tree32 3600 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 python bench.py --continuous \
    --batch 32 --model small \
    --checkpoint "$ART/corpus/run_small/best-checkpoint" \
    --spec-data "$ART/corpus/data/test.json" \
    --medusa-weights "$ART/corpus/medusa_small.safetensors" --medusa-tree

echo "== queue 6 complete $(date)"
