"""Isolated A/B of the decode cross-attention paths on the int8 T-minor
cache: XLA convert-in-dot einsums vs the fused Pallas dequant kernel
(ops/decode_attention.py). Replicates the r2 kernel-study methodology
(12-layer x N-step scan over whisper-small shapes, device-resident data,
scalar-fetch sync) on the CURRENT production layout — the r2 study only
measured the old Dh-minor layout (docs/PERF.md).

  python -m whisper_ipa_tpu.cli.bench_decode_kernel --batch 128
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from ..models import layers


def make_data(key, L, B, H, Dh, T, int4=False):
    ks = jax.random.split(key, 6)
    t_codes = T // 2 if int4 else T  # int4: byte = two packed nibbles
    shape = (L, B, H, Dh, t_codes)
    k8 = jax.random.randint(ks[0], shape, -127, 128, jnp.int32).astype(
        jnp.int8
    )
    v8 = jax.random.randint(ks[1], shape, -127, 128, jnp.int32).astype(
        jnp.int8
    )
    ksc = jax.random.uniform(
        ks[2], (L, B, H, T), jnp.float32, 0.001, 0.02
    )
    vsc = jax.random.uniform(
        ks[3], (L, B, H, T), jnp.float32, 0.001, 0.02
    )
    return k8, ksc, v8, vsc


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--head-dim", type=int, default=64)
    p.add_argument("--t", type=int, default=1536)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument(
        "--int4", action="store_true",
        help="bench the nibble-packed int4 cache paths instead of int8",
    )
    args = p.parse_args(argv)

    L, B, H, Dh, T = args.layers, args.batch, args.heads, args.head_dim, args.t
    d = H * Dh
    data = jax.jit(
        lambda k: make_data(k, L, B, H, Dh, T, int4=args.int4)
    )(jax.random.PRNGKey(0))
    jax.tree.map(lambda x: x.block_until_ready(), data)

    @jax.jit
    def bench(k8, ksc, v8, vsc):
        def step_fn(q, _):
            def layer(qc, kv):
                k, kss, v, vss = kv
                o = layers.multi_head_attention_int8kv(qc, k, kss, v, vss, H)
                return o.astype(qc.dtype), None

            q, _ = jax.lax.scan(layer, q, (k8, ksc, v8, vsc))
            return q, None

        q0 = jnp.ones((B, 1, d), jnp.bfloat16)
        q, _ = jax.lax.scan(step_fn, q0, None, length=args.steps)
        return q.sum()

    # K+V codes + f32 scales, each streamed once per (layer, step)
    code_bytes = Dh // 2 if args.int4 else Dh
    bytes_per_step = L * B * H * T * (2 * code_bytes + 2 * 4)
    results = {}
    for name, flag in (("xla-einsum", False), ("pallas-kernel", True)):
        layers.use_decode_kernel(flag)
        bench_c = bench.lower(*data).compile()
        float(bench_c(*data))  # warm
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            float(bench_c(*data))
            best = min(best, time.time() - t0)
        ms_tok = best / args.steps * 1000
        gbs = bytes_per_step / (best / args.steps) / 1e9
        results[name] = ms_tok
        print(
            f"{name:14s} {ms_tok:7.2f} ms/token   {gbs:6.0f} GB/s effective"
            f"   (total {best:.3f} s / {args.steps} steps)"
        )
    layers.use_decode_kernel(None)
    if results["pallas-kernel"] < results["xla-einsum"]:
        print(
            f"kernel wins: {results['xla-einsum'] / results['pallas-kernel']:.2f}x"
        )
    else:
        print(
            f"einsum wins: {results['pallas-kernel'] / results['xla-einsum']:.2f}x"
        )


if __name__ == "__main__":
    main()
