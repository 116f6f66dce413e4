"""Pallas TPU kernel: fused unmasked attention (encoder self/cross).

For Whisper's fixed 1500-position encoder, K/V for one (batch, head) fit
comfortably in VMEM (1536 x 64 fp32 = 0.4 MB), so no online-softmax
streaming is needed: each grid step loads a q block plus the full K/V,
computes logits -> softmax -> output entirely on-chip, and only the final
output ever touches HBM. XLA's unfused path materializes the (B, H, T, T)
probability tensor in HBM (~1.7 GB for whisper-small at batch 16 fp32);
this kernel eliminates that round-trip.

Numerical notes: logits and softmax accumulate in float32 regardless of
input dtype; padded key positions (sequence rounded up to the 128-tile)
are masked with -inf inside the kernel.

Pass the total attention scale (d_head**-0.5) via ``scale`` — it is
applied to the q block in VMEM, so no scaled (B, H, T, Dh) copies are
materialized in HBM (models/layers.py does this).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# q rows per grid cell. Bigger blocks amortize the per-cell K/V residency
# and grid overhead; v5e sweep (whisper-small encode, batch 128, bf16,
# 2026-08-16): 128 -> 665 ms, 256 -> 596, 512 -> 565, 768 -> 557 (with
# pad-free partial blocks; the old host-padded BLOCK_Q=128 ran 687 ms).
# VMEM at 768: (768, 1536) f32 logits ~4.7 MB + K/V/q blocks ~0.5 MB.
BLOCK_Q = 768


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _attn_kernel(kv_len: int, scale: float, q_ref, k_ref, v_ref, out_ref):
    q = q_ref[0]  # (BLOCK_Q, Dh)
    if scale != 1.0:
        # fold the attention scale into the VMEM-resident q block: the
        # host-side q*scale and k*scale muls materialized (B, H, T, Dh)
        # copies (52 ms per batch-128 whisper-small encode in xprof).
        # Whisper head dims are powers of two, so d_head**-0.5 is exact
        # in bf16.
        q = q * jnp.asarray(scale, q.dtype)
    k = k_ref[0]  # (T_pad, Dh)
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLOCK_Q, T_pad)

    t_pad = k.shape[0]
    if t_pad > kv_len:  # static: mask the padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, -jnp.inf)
        # partial-block K/V rows hold UNDEFINED VMEM contents (the inputs
        # are not host-padded); the -inf mask zeroes their probabilities,
        # but 0 * NaN = NaN in the p @ v dot — zero the rows themselves
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(row < kv_len, v, 0)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    # divide the (BLOCK_Q, Dh) OUTPUT by the row sums instead of the
    # (BLOCK_Q, T_pad) probabilities — T_pad/Dh x less VPU divide work
    out = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    out_ref[0] = (out / denom).astype(out_ref.dtype)


def _xla_attention(q, k, v, scale: float = 1.0):
    """Reference unfused path (used for the backward pass)."""
    if scale != 1.0:
        q = q * jnp.asarray(scale, q.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, scale: float = 1.0, interpret: bool = False):
    """(B, H, Tq, Dh) x (B, H, Tk, Dh) -> (B, H, Tq, Dh), no mask.

    ``scale`` (static) is applied to q inside the kernel; pass 1.0 when
    q/k already carry the attention scale.

    Differentiable: the forward pass runs the Pallas kernel; the backward
    pass recomputes attention through the XLA path and takes its VJP
    (flash-style recompute — the (T, T) probabilities are materialized only
    inside the backward pass, and not at all under stop_gradient, e.g. the
    frozen-encoder training regime).
    """
    return _fused_attention_impl(q, k, v, scale, interpret)


def _fused_attention_fwd(q, k, v, scale, interpret):
    return _fused_attention_impl(q, k, v, scale, interpret), (q, k, v)


def _fused_attention_bwd(scale, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


@partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_attention_impl(q, k, v, scale: float = 1.0,
                          interpret: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Tq, Dh = q.shape
    Tk = k.shape[2]
    BH = B * H

    # No host-side padding: partial trailing blocks are handled in-kernel
    # (K cols masked to -inf, V rows zeroed, partial q/out blocks clipped
    # by Mosaic). The jnp.pad/slice pair this replaces showed up as 86 ms
    # of pure HBM copies per whisper-small batch-128 encode in xprof.
    tk_pad = _round_up(Tk, 128)

    qf = q.reshape(BH, Tq, Dh)
    kf = k.reshape(BH, Tk, Dh)
    vf = v.reshape(BH, Tk, Dh)

    grid = (BH, _round_up(Tq, BLOCK_Q) // BLOCK_Q)
    out = pl.pallas_call(
        partial(_attn_kernel, Tk, scale),
        out_shape=jax.ShapeDtypeStruct((BH, Tq, Dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, BLOCK_Q, Dh),
                lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tk_pad, Dh),
                lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tk_pad, Dh),
                lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_Q, Dh),
            lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    return out.reshape(B, H, Tq, Dh)
