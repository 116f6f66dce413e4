#!/bin/bash
# Serial runner for the round-4 TPU measurement queue (docs/R4_TPU_QUEUE.md).
#
# Discipline (CLAUDE.md): ONE TPU process at a time — every item runs to
# completion (or its timeout) before the next starts, and each item is
# preceded by a cheap subprocess reachability probe so a wedged tunnel
# skips cleanly instead of hanging the queue forever.
#
# Resumable: each item writes $MARK/<name>.done (with its exit code) on
# completion; existing markers are skipped on re-run. Delete a marker to
# re-run an item. Logs: /tmp/q_<name>.log.
#
# Usage: bash perf/run_tpu_queue.sh [first_item_index]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
MARK=/tmp/qmark
mkdir -p "$MARK"
FROM=${1:-0}
IDX=-1

CORPUS=/tmp/corpus
TD=$CORPUS/data/train.json
VD=$CORPUS/data/test.json
MC="--mel-cache-dir $CORPUS/melcache"

# Shared executable cache: every tunnel compile costs 3-7 min and the
# bench items repeat the same decode programs (each spec run re-compiles
# the plain-decode baseline). The aot_start items get their OWN cache dir
# below so their cold/warm A/B stays clean.
export WHISPER_IPA_TPU_AOT_CACHE=/tmp/aotcache_queue

source perf/probe_device.sh

item() {  # item <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  IDX=$((IDX + 1))
  [ "$IDX" -lt "$FROM" ] && { echo "== [$IDX] $name: before --from, skip"; return 0; }
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

# -- 0. cheap accept/refute studies first (~45 min total): the tunnel has
#       wedged before, so bank the high-information-per-minute items
#       before committing hours to training (VERDICT #3) -----------------
item decode_breakdown 5400 \
  python perf/bench_decode_breakdown.py --batch 128 --profile-dir /tmp/xprof_decode
item kv_init_ab 5400 python perf/bench_kv_init.py
item enc_attn_ab 3600 python perf/bench_enc_attn.py

# -- 1. corpus-scale training (VERDICT #1: learning at corpus scale) ------
item corpus_tiny 5400 \
  python examples/corpus_scale.py --model tiny --steps 4000 --batch-size 32 \
    --bf16 --lr 2e-4 --out $CORPUS
item corpus_small 10800 \
  python examples/corpus_scale.py --model small --steps 6000 --batch-size 16 \
    --bf16 --remat --lr 1e-4 --skip-floor --out $CORPUS

SMALL_CKPT=$CORPUS/run_small/best-checkpoint
TINY_CKPT=$CORPUS/run_tiny/best-checkpoint

# -- 2. speculation stack on the trained small (VERDICT #1: measured win) -
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
  item spec_ngram 3600 \
    python bench.py --checkpoint "$SMALL_CKPT" --draft ngram --draft-k 8 \
      --spec-data $VD --model small $MC
  if [ -d "$TINY_CKPT" ]; then
    item spec_model_draft 3600 \
      python bench.py --draft-checkpoint "$TINY_CKPT" --draft tiny \
        --checkpoint "$SMALL_CKPT" --spec-data $VD --model small $MC
  fi
fi

# -- 3. engine TTFT + slots sweep (VERDICT #7) ----------------------------
if [ -d "$SMALL_CKPT" ]; then
  for B in 8 16 32; do
    item engine_b$B 3600 \
      python bench.py --continuous --batch $B --checkpoint "$SMALL_CKPT" \
        --spec-data $VD --model small $MC
  done
  item engine_tree 3600 \
    python bench.py --continuous --batch 16 --checkpoint "$SMALL_CKPT" \
      --medusa-weights $CORPUS/medusa_small.safetensors --medusa-tree \
      --spec-data $VD --model small $MC
fi

# -- 4. beam v2 sweep (VERDICT #4), capacity (VERDICT #5), enc-attn (#3) --
item beam_sweep 7200 python perf/bench_beam.py
item int4_capacity 14400 python perf/bench_capacity.py

# -- 5. AOT serve-start timing (VERDICT #6): two fresh processes ----------
item aot_start1 5400 env WHISPER_IPA_TPU_AOT_CACHE=/tmp/aotcache \
  python bench.py --batch 16 --sample-len 16 --no-trained-row --iters 2
item aot_start2 2700 env WHISPER_IPA_TPU_AOT_CACHE=/tmp/aotcache \
  python bench.py --batch 16 --sample-len 16 --no-trained-row --iters 2
# (isolated /tmp/aotcache: the cold/warm serve-start A/B must not see
#  executables the earlier queue items compiled)

# -- 6. distilled draft (stretch: r3 aligned-draft experiment) ------------
if [ -d "$SMALL_CKPT" ]; then
  item distill_draft 5400 \
    python -m whisper_ipa_tpu.cli.distill_draft --student tiny \
      --teacher small --teacher-checkpoint "$SMALL_CKPT" --full-checkpoint \
      --train-data $TD --steps 1500 --batch-size 8 $MC \
      --output-dir $CORPUS/draft_tiny
  if [ -d "$CORPUS/draft_tiny/checkpoint-1500" ]; then
    item spec_distilled 3600 \
      python bench.py --draft-checkpoint $CORPUS/draft_tiny/checkpoint-1500 \
        --draft tiny --checkpoint "$SMALL_CKPT" --spec-data $VD \
        --model small $MC
  fi
fi

# -- 7. final headline bench (driver-format JSON + trained row) -----------
item final_bench 5400 python bench.py

echo "== queue complete $(date)"
