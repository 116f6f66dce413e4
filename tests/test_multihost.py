"""Real 2-process multi-host test (VERDICT r1 next-step 5).

Spawns two actual OS processes, initializes jax.distributed over localhost,
and runs one data-parallel train step with the global batch assembled from
host-local shards (each process contributes only its own rows via
jax.make_array_from_process_local_data — no cross-host input copy). Both
processes must compute the identical global loss.

This exercises the exact path train() takes on a pod:
parallel/distributed.{initialize,local_shard_indices,global_batch_from_local}
+ the GSPMD all-reduce inside train_step.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

port, pid = sys.argv[1], int(sys.argv[2])
from whisper_ipa_tpu.parallel.distributed import (
    global_batch_from_local, initialize, local_shard_indices, process_info,
)
initialize(f"localhost:{port}", num_processes=2, process_id=pid)

info = process_info()
assert info["process_count"] == 2, info
assert info["global_device_count"] == 4, info

import numpy as np
import jax.numpy as jnp
from dataclasses import replace
from whisper_ipa_tpu.config import CONFIGS
from whisper_ipa_tpu.models import init_params
from whisper_ipa_tpu.parallel import make_mesh, shard_params
from whisper_ipa_tpu.train import create_train_state, train_step

cfg = replace(CONFIGS["test-tiny"], n_audio_ctx=32, n_text_ctx=32)
params = init_params(cfg, seed=0)
mesh = make_mesh(model=1)  # 4 global devices -> data=4
params = shard_params(mesh, params, tensor_parallel=False)
state, tx = create_train_state(params, learning_rate=1e-4)

# host-local input pipeline: 8 global samples, each host owns 4
n_global = 8
shard = local_shard_indices(n_global)
assert len(shard) == 4
assert shard == (list(range(0, 4)) if pid == 0 else list(range(4, 8))), shard

rng = np.random.default_rng(0)
global_mel = rng.standard_normal((n_global, cfg.n_audio_ctx * 2, cfg.n_mels)).astype(np.float32)
eot = 50257
global_tok = np.tile([[50258, 50259, 50359, 50363, 100, 200, eot, eot]], (n_global, 1)).astype(np.int32)

mel = global_batch_from_local(mesh, global_mel[shard])
tokens = global_batch_from_local(mesh, global_tok[shard])
assert mel.shape == (n_global, cfg.n_audio_ctx * 2, cfg.n_mels)

state, loss = train_step(state, mel, tokens, cfg, tx, eot)
print(f"RESULT pid={pid} loss={float(loss):.6f}", flush=True)
"""


def test_two_process_dp_train_step(tmp_path):
    # free localhost port for the jax.distributed coordinator
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    # children must choose their own platform/flags
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO_ROOT,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-3000:]}"

    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert lines, out[-2000:]
        losses.append(float(lines[0].split("loss=")[1]))
    # both processes see the same global loss (GSPMD all-reduce worked)
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
