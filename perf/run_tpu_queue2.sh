#!/bin/bash
# Follow-up measurement queue (round 4, session 4): items discovered
# AFTER perf/run_tpu_queue.sh launched. Same discipline: serial, probed,
# marker-resumable. Run ONLY after the first queue's runner exits
# (ONE TPU process at a time — CLAUDE.md).
#
# Usage: bash perf/run_tpu_queue2.sh
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

# -- 0. medusa re-run FIRST (VERDICT #1's ">1x measured speculative
#       win" candidate): the queue-1 medusa_small item failed on the
#       HTTP-413 closure bug (fixed, cli/train_medusa.py) and its three
#       dependents failed on the missing weights. Clear the rc!=0
#       markers and re-run with the exact queue-1 commands. -------------
# Also adopt the queue-1 items deferred by marker (rc=99) when the
# int4 capacity sweep's ~70 min/config pace pushed them past the
# session budget — they re-run HERE in time-boxed priority order.
for m in medusa_small spec_medusa spec_medusa_tree engine_tree \
         aot_start1 aot_start2 distill_draft spec_distilled final_bench; do
  if [ -f "$MARK/$m.done" ] && ! grep -q '^rc=0' "$MARK/$m.done"; then
    was=$(cat "$MARK/$m.done")
    rm -f "$MARK/$m.done"
    echo "requeued $m (was: $was)"
  fi
done

# Optional items stop starting past this wall-clock deadline so the
# always-run final bench + the driver's own end-of-round bench.py fit
# before the session ends (bench.py now WAITS for an active queue).
DEADLINE=${QUEUE2_DEADLINE:-1787164800}   # 2026-08-19 18:40 UTC
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
CORPUS=/tmp/corpus
TD=$CORPUS/data/train.json
VD=$CORPUS/data/test.json
MC="--mel-cache-dir $CORPUS/melcache"
SMALL_CKPT=$CORPUS/run_small/best-checkpoint
if [ -d "$SMALL_CKPT" ]; then
  item medusa_small 5400 \
    python -m whisper_ipa_tpu.cli.train_medusa --model small \
      --checkpoint "$SMALL_CKPT" --full-checkpoint --train-data $TD \
      --steps 1500 --batch-size 8 --n-heads 4 $MC \
      --output $CORPUS/medusa_small.safetensors
  item spec_medusa 3600 \
    python bench.py --medusa --checkpoint "$SMALL_CKPT" \
      --medusa-weights $CORPUS/medusa_small.safetensors \
      --spec-data $VD --model small $MC
  item spec_medusa_tree 3600 \
    python bench.py --medusa --medusa-tree --checkpoint "$SMALL_CKPT" \
      --medusa-weights $CORPUS/medusa_small.safetensors \
      --spec-data $VD --model small $MC
  item engine_tree 3600 \
    python bench.py --continuous --batch 16 --checkpoint "$SMALL_CKPT" \
      --medusa-weights $CORPUS/medusa_small.safetensors --medusa-tree \
      --spec-data $VD --model small $MC
fi

# Decode-loop residue A/B after the cast hoist (commit 5ba2d5c): the r4
# xprof attributed ~60 ms/decode to in-loop f32 param slices +
# convert_element_type; the hoist should cut the 8.67 ms/token loop
# toward the 6.97 floor. Same shapes as the pre-change breakdown.
item decode_breakdown_postcast 5400 \
  python perf/bench_decode_breakdown.py --batch 128 --profile-dir /tmp/xprof_decode_postcast

# Paper-style per-language held-out breakdown on the corpus checkpoints
# (VERDICT #1 scale-of-evidence; matches reference evaluate_model.py's
# per-run reporting). Batch 32 to amortize tunnel dispatch.
item corpus_report_tiny 3600 \
  python examples/corpus_report.py --run-dir /tmp/corpus/run_tiny \
    --data /tmp/corpus/data/test.json --model tiny \
    --mel-cache-dir /tmp/corpus/melcache --batch 32
if [ -d /tmp/corpus/run_small/best-checkpoint ] && ! past_deadline; then
  item corpus_report_small 5400 \
    python examples/corpus_report.py --run-dir /tmp/corpus/run_small \
      --data /tmp/corpus/data/test.json --model small \
      --mel-cache-dir /tmp/corpus/melcache --batch 32
fi

# -- int4 capacity FRONTIER (replaces the killed queue-1 sweep: that run
#    paid ~8 min of host init+quantize per point — now disk-cached — and
#    its batch list stopped at 64, before the OOM frontier the capacity
#    claim needs). w8kv8 vs w4kv4 is the decisive pair. ------------------
if ! past_deadline; then
  item int4_frontier 7200 \
    python perf/bench_capacity.py --configs w8kv8,w4kv4 \
      --batches 64,80,96,128,160
fi

# -- deferred queue-1 items, priority order, deadline-guarded -------------
SMALL_CKPT=/tmp/corpus/run_small/best-checkpoint
if [ -d "$SMALL_CKPT" ] && ! past_deadline; then
  item distill_draft 5400 \
    python -m whisper_ipa_tpu.cli.distill_draft --student tiny \
      --teacher small --teacher-checkpoint "$SMALL_CKPT" --full-checkpoint \
      --train-data $TD --steps 1500 --batch-size 8 $MC \
      --output-dir $CORPUS/draft_tiny
  if [ -d "$CORPUS/draft_tiny/checkpoint-1500" ] && ! past_deadline; then
    item spec_distilled 3600 \
      python bench.py --draft-checkpoint $CORPUS/draft_tiny/checkpoint-1500 \
        --draft tiny --checkpoint "$SMALL_CKPT" --spec-data $VD \
        --model small $MC
  fi
fi
if ! past_deadline; then
  item aot_start1 5400 env WHISPER_IPA_TPU_AOT_CACHE=/tmp/aotcache \
    python bench.py --batch 16 --sample-len 16 --no-trained-row --iters 2
  item aot_start2 2700 env WHISPER_IPA_TPU_AOT_CACHE=/tmp/aotcache \
    python bench.py --batch 16 --sample-len 16 --no-trained-row --iters 2
fi

# -- final headline bench: ALWAYS runs (trained row + driver format) ------
item final_bench 5400 python bench.py

echo "== queue2 complete $(date)"
