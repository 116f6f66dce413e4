"""A/B the fused cross-KV init kernel (ops/kv_init.py) vs the XLA path.

Part of the VERDICT r3 item-3 study: init_cache is the bulk of the
~150 ms one-time prefix/init in the headline decode. The fused kernel
collapses the projection write + quantize re-read + T-minor transpose
into one HBM pass. This measures init_cache alone (both paths), then
the full greedy decode with the winner, at the headline shapes.

Run ON TPU: PYTHONPATH=/root/repo:/root/.axon_site python perf/bench_kv_init.py
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--model", default="small")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.models.whisper import init_cache, use_fused_kv_init

    cfg = get_config(args.model)
    params = init_params(cfg, seed=0)
    B = args.batch

    feats = jax.jit(
        lambda k: 0.3 * jax.random.normal(
            k, (B, cfg.n_audio_ctx, cfg.n_text_state), jnp.bfloat16
        )
    )(jax.random.PRNGKey(0))

    def sync(cache):
        float(jnp.ravel(cache.cross_k_scale)[0])

    # dispatch+fetch latency to subtract (block_until_ready is a no-op
    # under axon; scalar fetch is the only real sync)
    probe = jax.jit(lambda x: x + 1.0)
    float(jnp.ravel(probe(jnp.zeros((8, 128))))[0])
    t0 = time.time()
    for _ in range(3):
        float(jnp.ravel(probe(jnp.zeros((8, 128))))[0])
    lat = (time.time() - t0) / 3
    print(f"sync latency {lat * 1e3:.1f} ms", flush=True)

    results = {}
    for fused in (False, True):
        use_fused_kv_init(fused)
        # fresh jit per flag: the fused gate is read at trace time, so a
        # shared jit instance would silently reuse the first program
        init_fn = jax.jit(
            init_cache,
            static_argnames=("cfg", "max_len", "dtype", "cross_kv_int8"),
        )
        cache = init_fn(
            params, cfg, feats, max_len=68, dtype=jnp.bfloat16,
            cross_kv_int8=True,
        )
        sync(cache)
        t0 = time.time()
        for _ in range(args.iters):
            cache = init_fn(
                params, cfg, feats, max_len=68, dtype=jnp.bfloat16,
                cross_kv_int8=True,
            )
        sync(cache)
        dt = max(0.0, time.time() - t0 - lat) / args.iters
        results[fused] = dt
        print(f"init_cache fused={fused}: {dt * 1e3:.1f} ms", flush=True)
        # keep codes/scales honest: compare a checksum across paths
        print(f"  checksum scale sum={float(jnp.sum(cache.cross_k_scale)):.4f}",
              flush=True)
    use_fused_kv_init(False)

    speedup = results[False] / max(results[True], 1e-9)
    print(f"fused speedup: {speedup:.2f}x "
          f"({results[False] * 1e3:.1f} -> {results[True] * 1e3:.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
