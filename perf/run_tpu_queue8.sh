#!/bin/bash
# Round-5 queue 8: the reboot wiped /root/repo/artifacts (checkpoints,
# corpus data, melcache, AOT cache) AND /tmp (queue markers) a second
# time, before queues 6/7's measurements landed. This queue rebuilds the
# artifacts and takes the open VERDICT measurements in priority order:
#   1.  synth + train small  (flagship trained row; 7000 steps — the
#       prior r5 run's validation-selected best was step 6750)
#   2.  bench.py end-to-end  (fresh recorded headline + trained row;
#       warms artifacts/aotcache for the driver's end-of-round bench)
#   3.  beam-5 vs greedy QUALITY A/B            (VERDICT #2)
#   4.  per-language corpus report, small       (VERDICT #5)
#   5-7. engine TTFT fast/fixed + adaptive-sync A/B (VERDICT #2, #4)
#   8.  perturbed-acoustics eval                (VERDICT #6)
#   9-10. medusa heads + tree@32 engine point   (VERDICT #2)
#   11-12. large-v3 beam-5 RTF + engine point   (VERDICT #7)
#   13-14. tiny retrain + per-language report   (VERDICT #5)
#   15-17. fast-disk serve-start A/B            (VERDICT #2)
#   18. collect result JSONs into tracked results/
#
# HARD DEADLINE (round-4 lesson: no item may straddle the round
# boundary): items self-skip when their full timeout would not fit
# before QUEUE8_DEADLINE; the supervisor kills the tree at its cutoff.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
MARK=/tmp/qmark8
mkdir -p "$MARK"
IDX=-1
ART=/root/repo/artifacts
mkdir -p "$ART"
export WHISPER_IPA_TPU_AOT_CACHE="$ART/aotcache"
export WHISPER_IPA_TPU_AOT_FAST_DISK=1
DEADLINE=${QUEUE8_DEADLINE:-$(date -d "11:00" +%s)}

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
  timeout "$tmo" "$@" > "/tmp/q8_$name.log" 2>&1
  local rc=$?
  echo "rc=$rc $(date)" > "$MARK/$name.done"
  echo "== [$IDX] $name: DONE rc=$rc $(date +%H:%M:%S) (log /tmp/q8_$name.log)"
  return 0
}

# 1. flagship: synth the corpus (stage skipped if present) + train small
item corpus_small_art 13000 \
  python examples/corpus_scale.py --model small --steps 7000 \
    --batch-size 16 --bf16 --remat --lr 1e-4 --skip-floor \
    --out "$ART/corpus"

# 2. driver-flow validation: fresh recorded headline + trained row,
#    warms artifacts/aotcache for the driver's end-of-round run
item bench_validate 5400 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 python bench.py

# 3. beam-5 vs greedy QUALITY on the trained small (VERDICT #2)
item eval_beam_vs_greedy 4800 bash -c "
  python -m whisper_ipa_tpu.cli.evaluate_model \
    --checkpoint $ART/corpus/run_small/best-checkpoint --full-checkpoint \
    --base-model small --skip-base --batch-size 16 --num-samples 100 \
    --test-data $ART/corpus/data/test.json &&
  python -m whisper_ipa_tpu.cli.evaluate_model \
    --checkpoint $ART/corpus/run_small/best-checkpoint --full-checkpoint \
    --base-model small --skip-base --batch-size 16 --num-samples 100 \
    --test-data $ART/corpus/data/test.json --beam-size 5"

# 4. per-language held-out report, small (VERDICT #5 — the PERF.md
#    table's tracked artifact)
item corpus_report_small 3600 \
  python examples/corpus_report.py --run-dir "$ART/corpus/run_small" \
    --data "$ART/corpus/data/test.json" --model small \
    --mel-cache-dir "$ART/corpus/melcache" --batch 16

# 5-7. engine A/Bs on trained small + real audio, 16 slots:
#    fast-sync (default) vs fixed-chunk  -> TTFT join-fast-sync A/B
#    fast-sync vs adaptive steps-per-sync -> VERDICT #4 accept/refute
ENG="python bench.py --continuous --batch 16 --model small \
  --checkpoint $ART/corpus/run_small/best-checkpoint \
  --spec-data $ART/corpus/data/test.json"
item engine_plain16 2700 env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 $ENG
item engine_fixed16 2700 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 $ENG --no-join-fast-sync
item engine_adaptive16 2700 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 $ENG --adaptive-sync

# 8. acoustic train/test decoupling (VERDICT #6), 200 held-out samples
#    per condition through the exact evaluate path
item perturbed_small 5400 \
  python examples/perturbed_eval.py --run-dir "$ART/corpus/run_small" \
    --data "$ART/corpus/data/test.json" --model small --batch 16 \
    --num-samples 200

# 9-11. fast-disk pre-trace serve-start A/B (VERDICT #2; queue-6 items
#    5-7 never ran). Cheap, so ahead of the big tail items.
BENCH16="python bench.py --batch 16 --sample-len 16 --no-trained-row"
item aot_fast_warmup 1800 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 WHISPER_IPA_TPU_AOT_FAST_DISK=1 \
  $BENCH16
item aot_fast_start 1800 \
  bash -c "time env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 WHISPER_IPA_TPU_AOT_FAST_DISK=1 $BENCH16"
item aot_exact_start 1800 \
  bash -c "time env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 WHISPER_IPA_TPU_AOT_FAST_DISK=0 $BENCH16"

# 12-13. large-v3 points (VERDICT #7)
item beam_large 3600 \
  python perf/bench_beam.py --model large-v3 --batches 8 16 --no-legacy
item engine_large 3600 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 python bench.py --continuous \
    --batch 16 --model large-v3

# 14-15. medusa heads on the trained small, then the tree@32 point the
#    r4 sweep never took (VERDICT #2)
item medusa_small_art 5400 \
  python -m whisper_ipa_tpu.cli.train_medusa --model small \
    --checkpoint "$ART/corpus/run_small/best-checkpoint" \
    --full-checkpoint --train-data "$ART/corpus/data/train.json" \
    --steps 1500 --batch-size 8 --n-heads 4 \
    --mel-cache-dir "$ART/corpus/melcache" \
    --output "$ART/corpus/medusa_small.safetensors"
item engine_tree32 2700 \
  env WHISPER_IPA_TPU_NO_QUEUE_WAIT=1 python bench.py --continuous \
    --batch 32 --model small \
    --checkpoint "$ART/corpus/run_small/best-checkpoint" \
    --spec-data "$ART/corpus/data/test.json" \
    --medusa-weights "$ART/corpus/medusa_small.safetensors" --medusa-tree

# 16-17. tiny retrain + its per-language report (VERDICT #5; the PERF.md
#    tiny tables' artifacts — lowest priority, the corpus_scale_tiny.json
#    summary is already tracked)
item corpus_tiny_art 7200 \
  python examples/corpus_scale.py --model tiny --steps 4000 \
    --batch-size 32 --bf16 --lr 2e-4 --out "$ART/corpus"
item corpus_report_tiny 2400 \
  python examples/corpus_report.py --run-dir "$ART/corpus/run_tiny" \
    --data "$ART/corpus/data/test.json" --model tiny \
    --mel-cache-dir "$ART/corpus/melcache" --batch 32

# 18. make the evidence durable (VERDICT #5) — CPU-only file collection,
#    runs unconditionally (no deadline skip, no TPU probe).
echo "== [final] collect_results: START $(date +%H:%M:%S)"
timeout 600 python perf/collect_results.py > /tmp/q8_collect_results.log 2>&1
echo "rc=$? $(date)" > "$MARK/collect_results.done"

echo "== queue 8 complete $(date)"
