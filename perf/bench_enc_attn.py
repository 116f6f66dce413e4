"""Encoder-attention A/B: split-head kernel vs head-merged I/O vs XLA.

VERDICT r3 item 3 / docs/ROADMAP.md: the fused encoder attention runs at
36% MFU and its (B*H, T, 64) operands pay the 64->128 lane pad in HBM.
The head-merged variant (ops/attention.fused_attention_merged) removes
the pad, streams K/V once per q block for all heads, and drops the four
split/merge transposes — IF Mosaic's 64-wide lane slicing doesn't eat
the savings (the kernel may be VPU-bound). This measures all three paths
on a real whisper-small encode, device-resident inputs, fetch-synced.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench_enc_attn.py
"""
import json
import time


def encode_time(mode: str, batch: int, iters: int = 10, model: str = "small"):
    import jax
    import jax.numpy as jnp

    import whisper_ipa_tpu.models.layers as L
    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.models.whisper import encode

    cfg = get_config(model)
    params = init_params(cfg, seed=0)

    L.use_fused_attention(mode != "xla")
    L.use_merged_attention(mode == "merged")

    @jax.jit
    def run(p, mel):
        return encode(p, cfg, mel, dtype=jnp.bfloat16)

    mel = (
        jax.random.normal(
            jax.random.PRNGKey(0), (batch, 3000, cfg.n_mels), jnp.float32
        )
        * 0.5
    )
    out = run(params, mel)
    float(out[0, 0, 0])  # sync (block_until_ready is a no-op under axon)

    t0 = time.time()
    for _ in range(iters):
        out = run(params, mel)
    float(out[0, 0, 0])
    dt = (time.time() - t0) / iters

    # MFU: encoder fwd FLOPs (matmuls only, 2*m*n*k)
    d, T, L_ = cfg.n_audio_state, cfg.n_audio_ctx, cfg.n_audio_layer
    flops = batch * (
        2 * 3000 * d * (cfg.n_mels * 3) + 2 * 1500 * d * (d * 3)  # convs
        + L_ * (
            4 * 2 * T * d * d            # qkv+out projections
            + 2 * 2 * T * T * d          # qk + av
            + 2 * 2 * T * d * 4 * d      # mlp
        )
    )
    mfu = flops / dt / 197e12  # v5e bf16 peak
    return dt, mfu


def main():
    results = {}
    for mode in ("split", "merged", "xla"):
        for batch in (16, 64):
            try:
                dt, mfu = encode_time(mode, batch)
                results[f"{mode}_b{batch}"] = {
                    "ms": round(dt * 1e3, 1), "mfu_pct": round(mfu * 100, 1)
                }
                print(f"{mode} b{batch}: {dt*1e3:.1f} ms  ({mfu*100:.1f}% MFU)",
                      flush=True)
            except Exception as e:  # Mosaic may reject the merged kernel
                results[f"{mode}_b{batch}"] = {"error": str(e)[:200]}
                print(f"{mode} b{batch}: FAILED {str(e)[:200]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
