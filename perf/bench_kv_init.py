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
    ap.add_argument("--no-full", action="store_true",
                    help="skip the end-to-end decode A/B (2 extra compiles)")
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
    caches = {}
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
        caches[fused] = cache
        print(f"init_cache fused={fused}: {dt * 1e3:.1f} ms", flush=True)
    use_fused_kv_init(False)

    # DEVICE-SIDE parity of the two caches (this is the first Mosaic
    # compile of the kernel on real hardware — the CPU tests only cover
    # the interpreter): codes must agree within the rounding-tie ULP,
    # scales near-exactly. Fetching the full caches would ride the
    # ~100 MB/s tunnel, so reduce on device and fetch scalars.
    @jax.jit
    def compare(a_k, a_ks, a_v, a_vs, b_k, b_ks, b_v, b_vs):
        di = lambda x, y: jnp.max(
            jnp.abs(x.astype(jnp.int32) - y.astype(jnp.int32))
        )
        return (
            di(a_k, b_k),
            di(a_v, b_v),
            jnp.max(jnp.abs(a_ks - b_ks)),
            jnp.max(jnp.abs(a_vs - b_vs)),
            jnp.mean((a_k != b_k).astype(jnp.float32)),
        )

    a, b = caches[False], caches[True]
    kd, vd, ksd, vsd, frac = (
        float(x)
        for x in compare(
            a.cross_k, a.cross_k_scale, a.cross_v, a.cross_v_scale,
            b.cross_k, b.cross_k_scale, b.cross_v, b.cross_v_scale,
        )
    )
    ok = kd <= 1 and vd <= 1 and ksd < 1e-5 and vsd < 1e-5 and frac < 1e-3
    print(
        f"parity {'PASS' if ok else 'FAIL'}: max|code diff| k={kd:.0f} "
        f"v={vd:.0f}, max|scale diff| k={ksd:.2e} v={vsd:.2e}, "
        f"code mismatch frac={frac:.2e}",
        flush=True,
    )

    speedup = results[False] / max(results[True], 1e-9)
    print(f"fused init speedup: {speedup:.2f}x "
          f"({results[False] * 1e3:.1f} -> {results[True] * 1e3:.1f} ms)",
          flush=True)

    if args.no_full or not ok:
        return

    # end-to-end: the unfused path may partially fuse into the decode
    # program anyway, so the accept decision uses the FULL greedy decode
    # (encoder skipped: decode() takes (B, n_audio_ctx, d) features)
    del caches, a, b
    from whisper_ipa_tpu.decode import DecodingOptions, decode
    from whisper_ipa_tpu.decode import decoding as _decoding
    from whisper_ipa_tpu.tokenizer import get_tokenizer

    tokenizer = get_tokenizer(
        multilingual=True, num_languages=cfg.num_languages, language="en"
    )
    options = DecodingOptions(
        language="en", without_timestamps=True, sample_len=64,
        suppress_tokens=[-1, tokenizer.eot], fp16=True, kv_int8=True,
    )
    full = {}
    for fused in (False, True):
        use_fused_kv_init(fused)
        # the greedy program is a module-level jit keyed on shapes only;
        # the fused gate is read at trace time, so force a retrace
        _decoding._greedy_decode_jit.clear_cache()
        decode(params, cfg, feats, options, tokenizer=tokenizer)  # compile
        t0 = time.time()
        for _ in range(3):
            decode(params, cfg, feats, options, tokenizer=tokenizer)
        full[fused] = (time.time() - t0) / 3
        print(f"full decode fused={fused}: {full[fused] * 1e3:.1f} ms",
              flush=True)
    use_fused_kv_init(False)
    _decoding._greedy_decode_jit.clear_cache()
    print(
        f"end-to-end: {full[False] / max(full[True], 1e-9):.3f}x "
        f"({(full[False] - full[True]) * 1e3:+.1f} ms per decode)",
        flush=True,
    )


if __name__ == "__main__":
    main()
