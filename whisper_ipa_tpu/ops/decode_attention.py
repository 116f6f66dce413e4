"""Pallas TPU kernel: single-query cross-attention over an int8 K/V cache.

The decode loop's cross-attention is a batched matvec — one query token
against 1500 encoder positions per (batch, head). Profiling on v5e (batch
128, whisper-small) showed XLA spending ~27 ms/token here against a ~4 ms
HBM floor: the S=1 einsum tiles terribly onto the MXU and dominates decode.

This kernel streams each (batch*head)'s K/V tile through VMEM exactly once
(K/V stay int8 in HBM — the dequantize happens on-chip), computes
logits -> masked softmax -> weighted sum entirely in VMEM, and writes only
the (1, Dh) output. Layout: K/V head-split (B, H, T, Dh) int8 with
per-(position, head) float32 scales (B, H, T).

EXPERIMENT RECORD — not wired into the decode path. All three kernel
formulations measured slower than XLA's einsums on this Dh-minor layout
(67/38/37 vs 30 ms/token, v5e batch 128), and the production cache has
since moved to the T-minor (B, H, Dh, T) layout, where plain XLA einsums
run 3x faster still (docs/PERF.md "Decode cross-attention kernel study").

The query must already carry the full d_head**-0.5 attention scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(n_head: int, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref):
    """One batch element per grid step; all heads processed in-kernel.

    Padded key positions carry scale 0 (real scales are strictly positive),
    which doubles as the attention mask — no position iota needed and no
    per-step padding of the cache.
    """
    for h in range(n_head):  # static unroll
        q = q_ref[0, h].astype(jnp.float32)  # (1, Dh)
        k = k_ref[0, h].astype(jnp.float32)  # (T_pad, Dh) from int8
        ks = ks_ref[0, h]  # (1, T_pad)
        v = v_ref[0, h].astype(jnp.float32)
        vs = vs_ref[0, h]

        logits = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, T_pad)
        logits = jnp.where(ks > 0.0, logits * ks, -jnp.inf)

        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p = p * vs  # fold the V scales into the probabilities

        out = jax.lax.dot_general(
            p,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, Dh)
        o_ref[0, h] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def decode_cross_attention_int8(
    q, k_i8, k_scale, v_i8, v_scale, interpret: bool = False
):
    """(B,H,1,Dh) x int8 (B,H,T,Dh) + scales (B,H,T) -> (B,H,1,Dh).

    q must already carry the attention scale (d_head**-0.5 applied in full
    to the query — NOT Whisper's split q/k scaling, since K here is int8).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, Dh = q.shape
    assert S == 1, "decode kernel is single-query"
    T = k_i8.shape[2]
    t_pad = _round_up(T, 128)

    kf, vf = k_i8, v_i8
    ks2, vs2 = k_scale, v_scale
    if t_pad != T:
        # only hit by direct callers; init_cache pre-pads (padding here,
        # inside the decode loop, would copy the whole cache every token).
        # Padded positions get scale 0 == masked.
        pad4 = ((0, 0), (0, 0), (0, t_pad - T), (0, 0))
        kf = jnp.pad(kf, pad4)
        vf = jnp.pad(vf, pad4)
        ks2 = jnp.pad(k_scale, ((0, 0), (0, 0), (0, t_pad - T)))
        vs2 = jnp.pad(v_scale, ((0, 0), (0, 0), (0, t_pad - T)))
    ksf = ks2.reshape(B, H, 1, t_pad)
    vsf = vs2.reshape(B, H, 1, t_pad)

    kv_spec = pl.BlockSpec(
        (1, H, t_pad, Dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sc_spec = pl.BlockSpec(
        (1, H, 1, t_pad), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_kernel, H),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, 1, Dh),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            kv_spec,
            sc_spec,
            kv_spec,
            sc_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, H, 1, Dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, kf, ksf, vf, vsf)

    return out
