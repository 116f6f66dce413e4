#!/bin/bash
# Shared TPU reachability probe: exits 0 iff a non-CPU device answers
# within 90 s. Sourced by run_tpu_queue.sh and tunnel_watch.sh so both
# agree on what "tunnel up" means.
probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d[0].platform != "cpu"
EOF
}
