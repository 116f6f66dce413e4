"""Beam-search study: batch sweep + device-time attribution (VERDICT r3 #4).

Beam 5 on whisper-small was last measured at 339x RTF (batch 8) vs 3068x
greedy — but it never got the greedy treatment (batch sweep, breakdown,
floor argument). This sweeps batch sizes, and compares against greedy at
the SAME effective device load (batch x beam KV replicas).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench_beam.py
"""
import json
import time

import numpy as np


def point(batch, beam=5, sample_len=48, iters=3, model="small"):
    import jax
    import jax.numpy as jnp

    from whisper_ipa_tpu.audio import N_SAMPLES
    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.decode import DecodingOptions, decode
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.ops import log_mel_spectrogram_pallas
    from whisper_ipa_tpu.tokenizer import get_tokenizer

    cfg = get_config(model)
    params = init_params(cfg, seed=0)
    tokenizer = get_tokenizer(
        multilingual=True, num_languages=cfg.num_languages, language="en"
    )
    options = DecodingOptions(
        language="en", without_timestamps=True, sample_len=sample_len,
        suppress_tokens=[-1, tokenizer.eot], fp16=True, kv_int8=True,
        beam_size=beam,
    )
    audio = (
        jax.random.normal(
            jax.random.PRNGKey(0), (batch, N_SAMPLES), jnp.float32
        ) * 0.1
    )
    mel_fn = jax.jit(
        lambda a: log_mel_spectrogram_pallas(a, n_mels=cfg.n_mels)
    )

    def run():
        return decode(params, cfg, mel_fn(audio), options,
                      tokenizer=tokenizer)

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        run()
    elapsed = (time.time() - t0) / iters
    return {
        "batch": batch,
        "rtf": batch * 30.0 / elapsed,
        "elapsed": elapsed,
        "compile_s": compile_s,
    }


def main():
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="small")
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[8, 16, 32, 64])
    ap.add_argument("--sample-len", type=int, default=48)
    ap.add_argument("--no-legacy", action="store_true",
                    help="skip the legacy-variant A/B (large models: "
                    "each compile costs many tunnel-minutes)")
    args = ap.parse_args()

    rows = []
    for batch in args.batches:
        for variant in ("v2", "legacy"):
            if variant == "legacy" and (args.no_legacy or batch > 16):
                continue  # legacy A/B at small batches only (compile cost)
            os.environ.pop("WHISPER_IPA_TPU_LEGACY_BEAM", None)
            if variant == "legacy":
                os.environ["WHISPER_IPA_TPU_LEGACY_BEAM"] = "1"
            try:
                r = point(batch, sample_len=args.sample_len,
                          model=args.model)
                r["variant"] = variant
                rows.append(r)
                print(
                    f"beam5 {args.model} {variant} batch {r['batch']}: "
                    f"RTF {r['rtf']:.1f}x"
                    f" ({r['elapsed']:.2f}s/iter, "
                    f"compile {r['compile_s']:.0f}s)",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"beam5 {variant} batch {batch}: FAIL {str(e)[-200:]}",
                    flush=True,
                )
    print("\nBEAM " + json.dumps(rows))


if __name__ == "__main__":
    main()
