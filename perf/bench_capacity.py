"""large-v3 serving capacity: int8 vs int4 (weights x KV cache) max batch.

The int4 kernels cost ~11-20% speed vs int8 (docs/PERF.md r3) and are
kept as a CAPACITY option for large-v3 on a 16 GB v5e — but no capacity
measurement exists (VERDICT r3 weak #5). This finds the max serving
batch per config and the resulting throughput at that batch, so the
claim is either substantiated (int4's extra batch headroom buys more
RTF than its per-step cost loses) or demoted.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench_capacity.py \
    [--configs w8kv8,w8kv4,w4kv8,w4kv4] [--batches 8,16,24,32,...]
"""
import argparse
import json
import time

import numpy as np


def _load_params(model, wbits):
    """Random-init (+quantized) params, cached on disk per (model, wbits).

    init_params + quantize_params for large-v3 are ~8 min of single-core
    host work; the original per-point subprocess design re-paid it every
    batch point (~10 min/point measured in the r4 queue). The tree is
    deterministic (seed 0), so cache the flattened tensors once.
    """
    import os

    import numpy as np
    from safetensors.numpy import load_file, save_file

    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.models.convert import (
        flatten_params,
        unflatten_params,
    )
    from whisper_ipa_tpu.ops.quant import quantize_params

    cfg = get_config(model)
    cache = f"/tmp/capcache_{model}_w{wbits}.safetensors"
    if os.path.isfile(cache):
        flat = load_file(cache)
        # 0-d arrays round-trip as 1-d (CLAUDE.md gotcha): restore shape
        flat = {
            k: v.reshape(()) if k.endswith("__scalar__") else v
            for k, v in flat.items()
        }
        flat = {k.replace("__scalar__", ""): v for k, v in flat.items()}
        return cfg, unflatten_params(flat)
    params = init_params(cfg, seed=0)
    if wbits in (4, 8):
        params = quantize_params(params, bits=wbits)
    flat = flatten_params(params)
    save_file(
        {
            (k + "__scalar__" if np.ndim(v) == 0 else k):
                np.ascontiguousarray(v)
            for k, v in flat.items()
        },
        cache,
    )
    return cfg, params


def try_point(model, batch, sample_len, wbits, kvbits):
    import jax
    import jax.numpy as jnp

    from whisper_ipa_tpu.audio import N_SAMPLES
    from whisper_ipa_tpu.decode import DecodingOptions, decode
    from whisper_ipa_tpu.ops import log_mel_spectrogram_pallas
    from whisper_ipa_tpu.tokenizer import get_tokenizer

    cfg, params = _load_params(model, wbits)
    # the disk cache yields HOST numpy arrays — commit them to the
    # device ONCE, or every decode call re-uploads the whole tree
    # through the ~100 MB/s tunnel (measured: 796x -> 98x RTF at
    # w8kv8 batch 64 when this was missing)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    tokenizer = get_tokenizer(
        multilingual=True, num_languages=cfg.num_languages, language="en"
    )
    options = DecodingOptions(
        language="en", without_timestamps=True, sample_len=sample_len,
        suppress_tokens=[-1, tokenizer.eot], fp16=True,
        kv_int8=kvbits == 8, kv_int4=kvbits == 4,
    )
    # generate audio on device (host upload rides a ~100 MB/s tunnel)
    audio = (
        jax.random.normal(
            jax.random.PRNGKey(0), (batch, N_SAMPLES), jnp.float32
        )
        * 0.1
    )
    mel_fn = jax.jit(lambda a: log_mel_spectrogram_pallas(a, n_mels=cfg.n_mels))

    def run():
        return decode(params, cfg, mel_fn(audio), options, tokenizer=tokenizer)

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        run()
    elapsed = (time.time() - t0) / iters
    rtf = batch * 30.0 / elapsed
    return {"rtf": rtf, "elapsed": elapsed, "compile_s": compile_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--sample-len", type=int, default=32)
    ap.add_argument("--configs", default="w8kv8,w8kv4,w4kv8,w4kv4")
    ap.add_argument("--batches", default="8,16,24,32,40,48,64")
    args = ap.parse_args()

    batches = [int(b) for b in args.batches.split(",")]
    out = {}
    for name in args.configs.split(","):
        wbits = int(name[1])
        kvbits = int(name[4])
        best = None
        for b in batches:
            import subprocess
            import sys

            # each point in a SUBPROCESS: an OOM must not kill the sweep,
            # and freeing a failed allocation through the tunnel is flaky
            here = __import__("os").path.dirname(
                __import__("os").path.abspath(__file__)
            )
            code = (
                f"import json,sys; sys.path.insert(0,{here!r});"
                "from bench_capacity import try_point;"
                f"r=try_point({args.model!r},{b},{args.sample_len},"
                f"{wbits},{kvbits});"
                "print('RESULT '+json.dumps(r))"
            )
            p = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=3600,
                env={
                    **__import__("os").environ,
                    "PYTHONPATH": "/root/repo:/root/.axon_site",
                },
            )
            line = [
                ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")
            ]
            if p.returncode == 0 and line:
                r = json.loads(line[0][7:])
                r["batch"] = b
                best = r
                print(
                    f"{name} batch {b}: RTF {r['rtf']:.1f}x "
                    f"({r['elapsed']:.2f}s/iter, compile {r['compile_s']:.0f}s)",
                    flush=True,
                )
            else:
                err = (p.stderr or "")[-400:]
                oom = "RESOURCE_EXHAUSTED" in p.stderr or "OOM" in p.stderr
                print(
                    f"{name} batch {b}: {'OOM' if oom else 'FAIL'} "
                    f"({err.splitlines()[-1] if err.splitlines() else ''})",
                    flush=True,
                )
                break
        out[name] = best
    print("\nCAPACITY " + json.dumps(out))


if __name__ == "__main__":
    main()
