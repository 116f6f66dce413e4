#!/bin/bash
# Isolate the aot_start FAILED_PRECONDITION (r4): three runs of the same
# bench point against a dedicated cache dir.
#   1. disk-hit on the entries the failing run wrote (reproduce?)
#   2. cold: clear the dir, fresh compile + serialize + run
#   3. disk-hit on the fresh entries (deserialize-then-run)
# Interpretation:
#   1 fails, 2+3 pass -> the 15:34 entries were poisoned (transient);
#     feature works, measure serve-start delta from 2 vs 3.
#   1+3 fail, 2 passes -> deserialize-then-run is broken under axon:
#     executable runs but its outputs can't be fetched (async dispatch
#     hides the error until np.asarray); document + gate the feature.
#   all fail -> this program/env combination is broken some other way.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
CACHE=/tmp/aotcache
BENCH="python bench.py --batch 16 --sample-len 16 --no-trained-row --iters 1"

run() {  # run <tag>
  echo "== aot_isolate $1: START $(date +%H:%M:%S)"
  timeout 1200 env WHISPER_IPA_TPU_AOT_CACHE=$CACHE $BENCH \
    > "/tmp/q_aot_iso_$1.log" 2>&1
  echo "== aot_isolate $1: rc=$? $(date +%H:%M:%S) (log /tmp/q_aot_iso_$1.log)"
}

run stale
rm -f $CACHE/*.jaxexec
run cold
run warm
echo "== aot_isolate complete $(date)"
