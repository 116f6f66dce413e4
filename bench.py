"""Benchmark: whisper-small batched inference real-time factor on one chip.

Measures the full on-device pipeline — log-mel frontend (matmul-DFT), encoder
forward, and a KV-cached greedy decode of 64 tokens per 30 s utterance, in
bfloat16 — and reports audio-seconds processed per wall-clock second per chip.
EOT is suppressed so every utterance decodes the full 64 tokens (worst-case,
no early-exit inflation).

Baseline: the driver-set north star of 10x real-time per chip for
whisper-small inference (BASELINE.md "North-star"); vs_baseline = RTF / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import os

    import jax

    # persistent compilation cache: later runs skip the long XLA compiles
    cache_dir = os.path.expanduser("~/.cache/whisper_ipa_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp

    from whisper_ipa_tpu.audio import N_SAMPLES
    from whisper_ipa_tpu.ops import log_mel_spectrogram_pallas
    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.decode import DecodingOptions, decode
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.tokenizer import get_tokenizer

    cfg = get_config("small")
    params = init_params(cfg, seed=0)
    tokenizer = get_tokenizer(multilingual=True, language="en")

    batch = 32
    sample_len = 64
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, N_SAMPLES)).astype(np.float32) * 0.1
    audio = jnp.asarray(audio)

    options = DecodingOptions(
        language="en",
        without_timestamps=True,
        sample_len=sample_len,
        suppress_tokens=[-1, tokenizer.eot],  # force full-length decode
        fp16=True,  # bfloat16 compute on TPU
    )

    # fused Pallas frontend (framing+window+DFT+power+mel+log in one kernel)
    mel_fn = jax.jit(
        lambda a: log_mel_spectrogram_pallas(a, n_mels=cfg.n_mels)
    )

    def run():
        mel = mel_fn(audio)
        results = decode(params, cfg, mel, options, tokenizer=tokenizer)
        return results

    # warmup/compile
    t0 = time.time()
    run()
    compile_time = time.time() - t0

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        run()
    elapsed = time.time() - t0

    audio_seconds = batch * 30.0 * iters
    rtf = audio_seconds / elapsed

    print(
        json.dumps(
            {
                "metric": "whisper-small inference RTF (audio-sec/sec/chip)",
                "value": round(rtf, 2),
                "unit": "x realtime",
                "vs_baseline": round(rtf / 10.0, 3),
            }
        )
    )
    print(
        f"# batch={batch} sample_len={sample_len} iters={iters} "
        f"elapsed={elapsed:.2f}s compile={compile_time:.1f}s "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
