"""Pallas TPU kernel: single-query cross-attention over the int8 T-minor
K/V cache.

The decode loop's cross-attention is a batched matvec — one query token
against 1500 encoder positions per (batch, head) — and is pure HBM
bandwidth: ~3.85 GB of int8 K/V codes + f32 scales per whisper-small
decode step at batch 128 (12 layers). The r2 xprof blamed the XLA path's
int8->bf16 convert-in-dot for throttling the streaming loads; this
kernel tests that hypothesis by DMAing the raw int8 tiles into VMEM and
dequantizing on-chip: one grid step per batch element loads that
element's (H, Dh, T) K and V tiles exactly once, computes logits ->
masked softmax -> weighted sum per head entirely in VMEM, and writes
only the (H, Dh) output. The softmax row-sum divide is folded into the
small output (the r2 encoder-kernel trick). Padded key positions carry
scale 0 (real scales are strictly positive), which doubles as the
attention mask.

MEASURED RESULT (r3, cli/bench_decode_kernel, batch 128 whisper-small
shapes, 12-layer x 64-step scan, one v5e): dead heat — XLA einsum
6.98 ms/token vs this kernel 6.97 ms/token, both at ~553 GB/s effective.
The convert-throttle hypothesis is REFUTED on the T-minor layout: the
XLA einsums already stream int8 at the achievable rate (per-(b,h) and
multi-batch block grids measured worse). History: three formulations on
the OLD Dh-minor (B,H,T,Dh) layout measured 67/38/37 ms/token vs XLA's
30 (r2) — the layout, not the kernel, was the problem there too. See
docs/PERF.md "kernel study (r3 addendum)". The kernel is kept as the
validated on-chip-dequant foundation (an int4 variant halves the
streamed bytes, which a pure-XLA path cannot do without a separate
unpack pass).

The query must already carry the full d_head**-0.5 attention scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(n_head: int, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref):
    """One batch element per grid step; heads unrolled in-kernel.

    Shapes per grid step (T-minor, lane-tiled):
      q (1, H, 1, Dh) bf16/f32   k/v (1, H, Dh, T) int8
      ks/vs (1, H, 1, T) f32     o (1, H, 1, Dh)
    """
    for h in range(n_head):  # static unroll
        q = q_ref[0, h].astype(jnp.float32)  # (1, Dh)
        k = k_ref[0, h]  # (Dh, T) int8
        ks = ks_ref[0, h]  # (1, T)
        v = v_ref[0, h]
        vs = vs_ref[0, h]

        logits = jax.lax.dot_general(
            q,
            k.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, T)
        logits = jnp.where(ks > 0.0, logits * ks, -jnp.inf)

        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs  # fold the V scales into the probabilities

        out = jax.lax.dot_general(
            p,
            v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, Dh)
        o_ref[0, h] = (out / s).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def decode_cross_attention_int8_tminor(
    q, k_i8, k_scale, v_i8, v_scale, interpret: bool = False
):
    """(B,H,1,Dh) x int8 T-minor (B,H,Dh,T) + scales (B,H,T) -> (B,H,1,Dh).

    q must already carry the attention scale (d_head**-0.5 applied in
    full to the query — NOT Whisper's split q/k scaling, since K is int8).
    T must be a multiple of 128 (init_cache pre-pads; scale 0 == masked).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, Dh = q.shape
    assert S == 1, "decode kernel is single-query"
    T = k_i8.shape[-1]
    assert T % 128 == 0, "cache T axis must be pre-padded to the lane tile"

    ksf = k_scale.reshape(B, H, 1, T)
    vsf = v_scale.reshape(B, H, 1, T)

    kv_spec = pl.BlockSpec(
        (1, H, Dh, T), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sc_spec = pl.BlockSpec(
        (1, H, 1, T), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (1, H, 1, Dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_kernel, H),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), q.dtype),
        grid=(B,),
        in_specs=[q_spec, kv_spec, sc_spec, kv_spec, sc_spec],
        out_specs=q_spec,
        interpret=interpret,
    )(q, k_i8, ksf, v_i8, vsf)


def _kernel_int4(n_head, q_ref, kp_ref, kse_ref, kso_ref, vp_ref,
                 vse_ref, vso_ref, o_ref):
    """int4 variant: one batch element per grid step, heads unrolled.

    The packed byte at position t2 holds codes for cache positions 2*t2
    (low nibble) and 2*t2+1 (high nibble). Softmax over key positions is
    permutation-invariant, so the two nibble planes are NEVER
    interleaved: each plane gets its own logits/probabilities (scaled by
    its own de-interleaved scale plane), the max and row-sum are taken
    jointly, and the output is the sum of two plane-wise AV dots. This
    sidesteps both Mosaic's no-reshape-across-tiles rule and the XLA
    path's stack/slice shuffles.

    Shapes per grid step:
      q (1, H, 1, Dh)  kp/vp (1, H, Dh, T2) int8 (packed)
      kse/kso/vse/vso (1, H, 1, T2) f32 (even/odd scale planes)
    """
    for h in range(n_head):
        q = q_ref[0, h].astype(jnp.float32)  # (1, Dh)
        kp = kp_ref[0, h].astype(jnp.int32)  # (Dh, T2) packed codes
        # arithmetic shifts sign-extend: low nibble via <<28 >>28
        k_lo = jnp.right_shift(jnp.left_shift(kp, 28), 28)
        k_hi = jnp.right_shift(jnp.left_shift(kp, 24), 28)
        kse = kse_ref[0, h]  # (1, T2)
        kso = kso_ref[0, h]

        def qk(kplane):
            return jax.lax.dot_general(
                q,
                kplane.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, T2)

        le = jnp.where(kse > 0.0, qk(k_lo) * kse, -jnp.inf)
        lo = jnp.where(kso > 0.0, qk(k_hi) * kso, -jnp.inf)

        m = jnp.maximum(
            jnp.max(le, axis=-1, keepdims=True),
            jnp.max(lo, axis=-1, keepdims=True),
        )
        pe = jnp.exp(le - m)
        po = jnp.exp(lo - m)
        s = jnp.sum(pe, axis=-1, keepdims=True) + jnp.sum(
            po, axis=-1, keepdims=True
        )
        pe = pe * vse_ref[0, h]
        po = po * vso_ref[0, h]

        vp = vp_ref[0, h].astype(jnp.int32)
        v_lo = jnp.right_shift(jnp.left_shift(vp, 28), 28)
        v_hi = jnp.right_shift(jnp.left_shift(vp, 24), 28)

        def av(p, vplane):
            return jax.lax.dot_general(
                p,
                vplane.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, Dh)

        out = av(pe, v_lo) + av(po, v_hi)
        o_ref[0, h] = (out / s).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def decode_cross_attention_int4_tminor(
    q, k_p4, k_scale, v_p4, v_scale, interpret: bool = False
):
    """(B,H,1,Dh) x nibble-packed int4 T-minor (B,H,Dh,T/2) -> (B,H,1,Dh).

    k_p4/v_p4 pack two T-adjacent int4 codes per byte (even T low
    nibble, odd high — ops/quant.pack_int4 along T); scales are
    (B, H, T) f32 with scale 0 marking padded positions. Streams HALF
    the int8 cache's bytes, dequantizing in VMEM. q must already carry
    the full d_head**-0.5 scale. Requires (T/2) % 128 == 0.

    MEASURED (r3, cli/bench_decode_kernel --int4, batch 128
    whisper-small shapes, one v5e): 8.40 ms/token — identical to the
    XLA nibble-plane path (8.41) and SLOWER than the int8 cache (6.97)
    despite half the bytes: the path is bound by the VPU nibble dequant
    (int8 vector shifts don't legalize in Mosaic, so codes widen to
    int32 first — ~4 elementwise ops per element vs int8's single
    convert), not by HBM. int4 KV stays a MEMORY feature; int8 T-minor
    is the speed point (docs/PERF.md r3 addendum).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, Dh = q.shape
    assert S == 1, "decode kernel is single-query"
    T2 = k_p4.shape[-1]
    T = k_scale.shape[-1]
    assert T == 2 * T2 and T2 % 128 == 0

    def planes(sc):  # (B,H,T) -> even/odd (B,H,1,T2)
        sc = sc.reshape(B, H, T2, 2)
        return (
            sc[..., 0].reshape(B, H, 1, T2),
            sc[..., 1].reshape(B, H, 1, T2),
        )

    kse, kso = planes(k_scale)
    vse, vso = planes(v_scale)

    kv_spec = pl.BlockSpec(
        (1, H, Dh, T2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sc_spec = pl.BlockSpec(
        (1, H, 1, T2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (1, H, 1, Dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_kernel_int4, H),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), q.dtype),
        grid=(B,),
        in_specs=[
            q_spec, kv_spec, sc_spec, sc_spec, kv_spec, sc_spec, sc_spec,
        ],
        out_specs=q_spec,
        interpret=interpret,
    )(q, k_p4, kse, kso, v_p4, vse, vso)
