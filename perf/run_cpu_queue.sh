#!/bin/bash
# CPU follow-up queue for the tunnel-outage corpus run (r4 session 3).
#
# Waits for examples/corpus_scale.py --cpu (run_tiny on /tmp/corpus_cputiny)
# to finish, then produces the hardware-independent acceptance evidence on
# the corpus-trained checkpoint: medusa heads + chain/tree/ngram
# tokens-per-round via bench.py --cpu (acceptance is a model property; only
# wall-clock speedups need the TPU). Serial, resumable via /tmp/cqmark,
# logs in /tmp/cq_*.log. Everything here is pinned to the CPU backend
# and /tmp/corpus_cputiny — but do NOT run it beside tunnel-bound TPU
# work: the single host core is shared and TPU dispatch stalls behind
# CPU-heavy jobs (CLAUDE.md). Intended for tunnel-outage windows only;
# the TPU queue (run_tpu_queue*.sh) supersedes it when the chip is up.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/corpus_cputiny
DATA=/tmp/corpus/data
MC=/tmp/corpus/melcache
MARK=/tmp/cqmark
mkdir -p "$MARK"

run_item() {  # run_item <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2
  shift 2
  if [ -e "$MARK/$name.done" ]; then
    echo "== $name already done ($(cat "$MARK/$name.done"))"
    return 0
  fi
  echo "== $name: $* (timeout ${tmo}s)"
  timeout "$tmo" nice -n 5 "$@" > "/tmp/cq_$name.log" 2>&1
  local rc=$?
  # only success gets a done-marker — a re-run retries failures/timeouts
  if [ "$rc" -eq 0 ]; then
    echo "rc=$rc $(date -u +%H:%M:%S)" > "$MARK/$name.done"
  else
    echo "rc=$rc $(date -u +%H:%M:%S)" > "$MARK/$name.fail"
  fi
  echo "== $name rc=$rc"
  return 0
}

# -- wait for the corpus training to finish ------------------------------
CS="$OUT/run_tiny/corpus_scale.json"
PIDF=/tmp/corpus_cputiny.pid
WAITED=0
WAIT_MAX=${WAIT_MAX:-36000}
while [ ! -e "$CS" ]; do
  # no/ dead trainer pid, or the wait budget exhausted -> stop waiting
  # and use whatever best-checkpoint exists
  if [ ! -e "$PIDF" ] || ! kill -0 "$(cat "$PIDF")" 2>/dev/null; then
    echo "no live trainer without corpus_scale.json; falling back to"
    echo "best-checkpoint if one exists"
    break
  fi
  if [ "$WAITED" -ge "$WAIT_MAX" ]; then
    echo "wait budget ${WAIT_MAX}s exhausted; using best-checkpoint"
    break
  fi
  sleep 120
  WAITED=$((WAITED + 120))
done
CKPT="$OUT/run_tiny/best-checkpoint"
if [ ! -e "$CKPT/model.safetensors" ]; then
  echo "no checkpoint produced; aborting queue"
  exit 3
fi

# -- 1. random-model held-out floor (for the result table) ---------------
run_item floor 3600 python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import json
from whisper_ipa_tpu.config import get_config
from whisper_ipa_tpu.data.dataset import create_data_loader
from whisper_ipa_tpu.models import init_params
from whisper_ipa_tpu.train.loop import validate
cfg = get_config("tiny")
ds = create_data_loader("/tmp/corpus/data/test.json", n_mels=cfg.n_mels,
                        mel_cache_dir="/tmp/corpus/melcache")
r = validate(init_params(cfg, seed=1), cfg, ds, ds.tokenizer, num_samples=64)
print("FLOOR", json.dumps(r))
EOF

# -- 2. medusa heads on the corpus-trained tiny --------------------------
run_item medusa_train 14400 python -m whisper_ipa_tpu.cli.train_medusa \
  --model tiny --checkpoint "$CKPT" --full-checkpoint \
  --train-data "$DATA/train.json" --steps 1000 --batch-size 8 \
  --n-heads 4 --mel-cache-dir "$MC" --save-every 100 --cpu \
  --output "$OUT/medusa_tiny.safetensors"

# -- 3. acceptance measurements on held-out audio ------------------------
if [ -e "$OUT/medusa_tiny.safetensors" ]; then
  run_item acc_medusa_chain 7200 python bench.py --cpu --medusa \
    --checkpoint "$CKPT" --medusa-weights "$OUT/medusa_tiny.safetensors" \
    --spec-data "$DATA/test.json" --model tiny --mel-cache-dir "$MC" \
    --batch 8 --iters 1
  run_item acc_medusa_tree 7200 python bench.py --cpu --medusa \
    --medusa-tree \
    --checkpoint "$CKPT" --medusa-weights "$OUT/medusa_tiny.safetensors" \
    --spec-data "$DATA/test.json" --model tiny --mel-cache-dir "$MC" \
    --batch 8 --iters 1
fi
run_item acc_ngram 7200 python bench.py --cpu \
  --checkpoint "$CKPT" --draft ngram \
  --spec-data "$DATA/test.json" --model tiny --mel-cache-dir "$MC" \
  --batch 8 --iters 1

# -- 4. per-language held-out report (see examples/corpus_report.py)
run_item report 7200 python examples/corpus_report.py \
  --run-dir "$OUT/run_tiny" --data "$DATA/test.json" --model tiny \
  --mel-cache-dir "$MC" --cpu --batch 8

# -- 5. aligned micro-draft via distillation (r3's negative model-draft
#    result called for an ALIGNED draft; acceptance is hardware-independent)
run_item distill 10800 python -m whisper_ipa_tpu.cli.distill_draft \
  --student test-tiny --teacher tiny --teacher-checkpoint "$CKPT" \
  --full-checkpoint --train-data "$DATA/train.json" --steps 1500 \
  --batch-size 8 --mel-cache-dir "$MC" --cpu --save-every 250 \
  --output-dir "$OUT/draft_testtiny"
if [ -e "$OUT/draft_testtiny/checkpoint-1500/model.safetensors" ]; then
  run_item acc_draft 7200 python bench.py --cpu \
    --checkpoint "$CKPT" --draft test-tiny \
    --draft-checkpoint "$OUT/draft_testtiny/checkpoint-1500" \
    --spec-data "$DATA/test.json" --model tiny --mel-cache-dir "$MC" \
    --batch 8 --iters 1
fi

echo "== CPU queue complete"
for f in "$MARK"/*.done; do
  echo "  $(basename "$f" .done): $(cat "$f")"
done
