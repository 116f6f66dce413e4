"""Stage breakdown of the headline greedy decode (VERDICT r3 item 3).

The r2 capture attributed decode device time as: cross einsums at the
HBM floor (proved r3) + ~150 ms one-time prefix/init + ~160 ms loop
residue + encoder fused attention at 36% MFU. This script isolates the
non-floor items as SEPARATE jitted programs so each can be accepted or
refuted with a number:

  mel | encode | init_cache (cross-KV project+quantize+transpose) |
  prefix step | full decode (everything, the headline program)

loop residue = full - (mel + encode + init + prefix) - floor einsums.
Optionally writes an xprof trace of one full decode for attribution
(--profile-dir).

Run ON TPU (one process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python perf/bench_decode_breakdown.py
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--sample-len", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--model", default="small")
    ap.add_argument("--profile-dir", default=None,
                    help="write an xprof trace of one full decode here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from whisper_ipa_tpu.audio import N_SAMPLES
    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.decode import DecodingOptions, decode
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.models.whisper import (
        decode_step,
        encode,
        init_cache,
    )
    from whisper_ipa_tpu.ops import log_mel_spectrogram_pallas
    from whisper_ipa_tpu.tokenizer import get_tokenizer

    cfg = get_config(args.model)
    params = init_params(cfg, seed=0)
    tokenizer = get_tokenizer(
        multilingual=True, num_languages=cfg.num_languages, language="en"
    )
    B = args.batch
    dtype = jnp.bfloat16

    # generate the audio ON DEVICE (host arrays ride the ~100 MB/s tunnel)
    audio = jax.jit(
        lambda k: 0.1 * jax.random.normal(k, (B, N_SAMPLES), jnp.float32)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(audio)

    mel_fn = jax.jit(lambda a: log_mel_spectrogram_pallas(a, n_mels=cfg.n_mels))
    encode_fn = jax.jit(encode, static_argnames=("cfg", "dtype"))
    init_fn = jax.jit(
        init_cache,
        static_argnames=("cfg", "max_len", "dtype", "cross_kv_int8",
                         "cross_kv_int4"),
    )
    prefix_fn = jax.jit(decode_step, static_argnames=("cfg", "dtype"))

    sot_seq = list(tokenizer.sot_sequence_including_notimestamps)
    n_prefix = len(sot_seq)
    prefix_tokens = jnp.tile(jnp.asarray(sot_seq, jnp.int32)[None, :], (B, 1))
    max_len = n_prefix + args.sample_len

    options = DecodingOptions(
        language="en", without_timestamps=True, sample_len=args.sample_len,
        suppress_tokens=[-1, tokenizer.eot], fp16=True, kv_int8=True,
    )

    # block_until_ready does NOT sync under axon (CLAUDE.md): force
    # completion by fetching ONE scalar to host, and subtract the
    # measured dispatch+fetch latency of that sync (~0.1-0.4 s through
    # the tunnel) from every timing.
    def _sync(out):
        leaves = [
            x for x in jax.tree_util.tree_leaves(out)
            if isinstance(x, jax.Array)
        ]
        if leaves:  # decode() outputs are host-side already (self-syncing)
            float(jnp.ravel(leaves[0])[0].astype(jnp.float32))

    probe = jax.jit(lambda x: x + 1.0)
    _sync(probe(jnp.zeros((8, 128), jnp.float32)))  # compile
    t0 = time.time()
    for _ in range(3):
        _sync(probe(jnp.zeros((8, 128), jnp.float32)))
    sync_lat = (time.time() - t0) / 3
    print(f"sync latency: {sync_lat * 1e3:.1f} ms (subtracted per stage)",
          flush=True)

    def timed(name, fn, *a, syncs_per_iter=0, **kw):
        """syncs_per_iter=0: async-enqueue all iters, one final sync
        (subtract sync_lat once). syncs_per_iter=1: fn host-fetches its
        own outputs every call (decode() does), so each iteration pays
        one tunnel round-trip — subtract sync_lat per iteration, else
        the full-vs-stages difference inflates by (iters-1)*sync_lat."""
        out = fn(*a, **kw)  # compile
        _sync(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*a, **kw)  # enqueued async; device runs serially
        _sync(out)  # one sync for the whole chain
        n_syncs = max(1, syncs_per_iter * args.iters)
        dt = max(0.0, time.time() - t0 - n_syncs * sync_lat) / args.iters
        print(f"{name:>14}: {dt * 1e3:8.1f} ms", flush=True)
        return out, dt

    print(f"model={args.model} batch={B} sample_len={args.sample_len} "
          f"iters={args.iters} device={jax.devices()[0].device_kind}",
          flush=True)

    mel, t_mel = timed("mel", mel_fn, audio)
    feats, t_enc = timed(
        "encode", encode_fn, params, cfg, mel, dtype=dtype
    )
    cache, t_init = timed(
        "init_cache", init_fn, params, cfg, feats,
        max_len=max_len, dtype=dtype, cross_kv_int8=True,
    )
    (_, _), t_prefix = timed(
        "prefix_step", prefix_fn, params, cfg, prefix_tokens, cache, 0,
        dtype=dtype,
    )

    def full():
        return decode(params, cfg, mel_fn(audio), options,
                      tokenizer=tokenizer)

    _, t_full = timed("full_decode", full, syncs_per_iter=1)

    loop = t_full - (t_mel + t_enc + t_init + t_prefix)
    per_tok = loop / args.sample_len
    print(f"{'loop (diff)':>14}: {loop * 1e3:8.1f} ms "
          f"({per_tok * 1e6:.0f} us/token)", flush=True)
    print(f"{'one-time share':>14}: "
          f"{(t_init + t_prefix) / t_full * 100:5.1f}% of full decode",
          flush=True)

    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            full()  # decode() host-fetches its outputs = full sync
        print(f"xprof trace written to {args.profile_dir}", flush=True)


if __name__ == "__main__":
    main()
