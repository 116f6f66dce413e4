"""Functional building blocks for the Whisper transformer.

Pure functions over parameter pytrees — no module framework. Canonical
parameter layouts (chosen for TPU-friendly ``x @ w`` contractions):

  linear:  {"w": (in, out), "b": (out,)}        (k-projection has no bias)
  ln:      {"g": (d,), "b": (d,)}
  conv1d:  {"w": (width, in, out), "b": (out,)}  -- 'WIO' rhs layout

Attention follows the Whisper convention: the 1/sqrt(d_head) scale is split
as d_head**-0.25 applied to q and k separately.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(x, p, eps: float = 1e-5):
    """LayerNorm in float32 accumulation regardless of activation dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)


import os as _os

_INT8_ACTIVATIONS = _os.environ.get("WHISPER_IPA_TPU_INT8_ACT", "0") == "1"


def use_int8_activations(enabled: bool) -> None:
    """Full int8 serving path: quantized weights AND activations run the
    Pallas int8 x int8 MXU kernel (ops/quant_matmul.py). Needs quantized
    params (ops/quant.py) and a non-CPU backend."""
    global _INT8_ACTIVATIONS
    _INT8_ACTIVATIONS = enabled


def _int4_halves(packed, w_s4, dtype):
    """Nibble-packed int4 codes + group scales -> (lo, hi) half-weights.

    packed: (in//2, out) int8, original row 2i in the low nibble, 2i+1 in
    the high (ops/quant.pack_int4). Arithmetic shifts sign-extend the
    4-bit codes. Returns the dequantized even-row and odd-row halves,
    each (in//2, out) — interleaving them back (stack+reshape) costs an
    XLA lane relayout that is SLOWER than the matmul it feeds (measured
    +30% decode time on v5e), so the consumer contracts each half
    against the matching stride-2 slice of x instead.
    """
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4).astype(dtype)
    hi = jnp.right_shift(packed, 4).astype(dtype)
    n_half, n_out = packed.shape
    n_groups = w_s4.shape[0]
    s = w_s4[:, None, :].astype(dtype)
    rows = n_half // n_groups  # group//2 packed rows per group
    lo = (lo.reshape(n_groups, rows, n_out) * s).reshape(n_half, n_out)
    hi = (hi.reshape(n_groups, rows, n_out) * s).reshape(n_half, n_out)
    return lo, hi


def _unpack_int4(packed, w_s4, dtype):
    """Full dequantized (in, out) weight — for tests/inspection only."""
    lo, hi = _int4_halves(packed, w_s4, dtype)
    n_half, n_out = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * n_half, n_out)


# Fused int4 weight matmul policy (ops/quant_matmul.int4_matmul): the
# packed codes DMA into VMEM and dequantize on-chip, with the dequant
# amortized over all M rows — unlike the int4 KV decode kernel (M=1,
# VPU-dequant-bound, no win). Opt-in until measured faster end-to-end:
# WHISPER_IPA_TPU_INT4_MATMUL=1 or use_int4_matmul(True).
_INT4_MATMUL = _os.environ.get("WHISPER_IPA_TPU_INT4_MATMUL") == "1"


def use_int4_matmul(enabled: bool) -> None:
    global _INT4_MATMUL
    _INT4_MATMUL = enabled


def linear(x, p):
    if "w_q4" in p:
        rows_per_group = p["w_q4"].shape[0] // p["w_s4"].shape[0]
        # the fused kernel holds both f32 input splits (4*M*K bytes) in
        # VMEM per grid step; encoder/prefill-shaped calls (M = B*1500)
        # would overflow the ~16 MB VMEM, so bound eligibility by M*K
        # and fall back to the XLA half-weight path above it
        m_rows = 1
        for d in x.shape[:-1]:
            m_rows *= d
        if (
            _INT4_MATMUL
            and rows_per_group % 8 == 0
            and m_rows * x.shape[-1] <= 2 * 1024 * 1024
            and jax.devices()[0].platform != "cpu"
        ):
            from ..ops.quant_matmul import int4_matmul

            y = int4_matmul(x, p["w_q4"], p["w_s4"]).astype(x.dtype)
            if "b" in p and p["b"] is not None:
                y = y + p["b"].astype(x.dtype)
            return y
        lo, hi = _int4_halves(p["w_q4"], p["w_s4"], x.dtype)
        # y = x @ w with w rows de-interleaved: even input features hit
        # the low-nibble half, odd the high-nibble half
        y = x[..., 0::2] @ lo + x[..., 1::2] @ hi
        if "b" in p and p["b"] is not None:
            y = y + p["b"].astype(x.dtype)
        return y
    if "w_q" in p:
        if _INT8_ACTIVATIONS and jax.devices()[0].platform != "cpu":
            from ..ops.quant_matmul import int8_matmul

            y = int8_matmul(x, p["w_q"], p["w_s"]).astype(x.dtype)
            if "b" in p and p["b"] is not None:
                y = y + p["b"].astype(x.dtype)
            return y
        # weight-only int8 (ops/quant.py): dequant fuses into the matmul,
        # so HBM traffic stays int8
        w = p["w_q"].astype(x.dtype) * p["w_s"].astype(x.dtype)
    else:
        w = p["w"].astype(x.dtype)
    y = x @ w
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def conv1d(x, p, stride: int = 1):
    """1-D convolution, SAME-style padding 1, NWC layout.

    x: (B, W, C_in); p["w"]: (width, C_in, C_out).
    """
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + p["b"].astype(x.dtype)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Fixed sinusoidal position embeddings for the audio encoder."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(
        -log_timescale_increment * np.arange(channels // 2)
    )
    scaled_time = (
        np.arange(length)[:, None] * inv_timescales[None, :]
    )
    return np.concatenate(
        [np.sin(scaled_time), np.cos(scaled_time)], axis=1
    ).astype(np.float32)


def _split_heads(x, n_head: int):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


# Fused-attention policy: unmasked long-query attention (the encoder) can
# run through the Pallas kernel in ops/attention.py instead of
# materializing (B, H, T, T) probabilities in HBM. Measured on one v5e
# (whisper-small encoder, batch 16, 2026-08-16): bf16 82.7 ms fused vs
# 90.3 ms XLA (33.8% vs 30.9% MFU); fp32 127.7 vs 120.2 ms (XLA wins).
# Default is therefore AUTO: fused for bfloat16 inputs on TPU, XLA
# otherwise. Override with WHISPER_IPA_TPU_FUSED_ATTN=1/0 or
# use_fused_attention(True/False/None).
import os as _os

_FUSED_ATTENTION = {"1": True, "0": False}.get(
    _os.environ.get("WHISPER_IPA_TPU_FUSED_ATTN", "auto")
)  # None = auto
# Minimum q length for the fused kernel. Short-q callers (decode steps,
# speculative verify, AND the teacher-forced training cross-attention at
# q = token_len-1 ~ 47) stay on XLA — measured on one v5e (cached-feature
# train step, batch 64, r3): routing the q=47 cross-attention through the
# Pallas kernels took the step 124.6 -> 160.7 ms (fwd kernel only) ->
# 236.5 ms (+ flash bwd). Two reasons: (a) a per-(b,h) grid at q=47 is
# 768 tiny cells per layer — cell setup swamps the ~18 MFLOP of work;
# (b) flash's HBM advantage vanishes at short q: the (47, 1500) probs
# matrix is the SAME size as K/V, so XLA's materializing einsums are
# already within ~15% of the operand-traffic roofline. The kernels win
# when Tq is block-sized (encoder self-attention, Tq = Tk = 1500, where
# probs are 150x K/V bytes).
_FUSED_MIN_QLEN = 128


def use_fused_attention(enabled) -> None:
    """True = always (when eligible), False = never, None = auto (bf16)."""
    global _FUSED_ATTENTION
    _FUSED_ATTENTION = enabled


# Head-merged kernel I/O variant (ops/attention.fused_attention_merged):
# (B, T, d) operands stay merged through the kernel — no 64-minor lane
# pad on the HBM I/O, K/V streamed once per q block for ALL heads, and
# no split/merge transposes. Opt-in pending the TPU A/B (the kernel may
# be VPU-bound, in which case the saved bandwidth buys nothing):
# WHISPER_IPA_TPU_MERGED_ATTN=1 or use_merged_attention(True).
_MERGED_ATTENTION = _os.environ.get("WHISPER_IPA_TPU_MERGED_ATTN") == "1"


def use_merged_attention(enabled: bool) -> None:
    global _MERGED_ATTENTION
    _MERGED_ATTENTION = enabled


def _fused_eligible(q, mask) -> bool:
    if mask is not None:
        return False
    enabled = _FUSED_ATTENTION
    if enabled is None:  # auto: the kernel wins in bf16, loses in fp32
        enabled = q.dtype == jnp.bfloat16
    if not enabled:
        return False
    if q.shape[1] < _FUSED_MIN_QLEN:
        return False  # decode steps: padding to the q tile would waste work
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


# Decode-kernel policy: the single-query (S=1) cross-attention over the
# int8 T-minor cache can run through the fused Pallas kernel in
# ops/decode_attention.py (raw int8 DMA + on-chip dequant) instead of the
# convert-in-dot einsums. Measured on one v5e (whisper-small shapes,
# batch 128, 12-layer x 64-step scan, r3): DEAD HEAT — kernel 6.97
# ms/token vs XLA 6.98, both ~553 GB/s: the einsums already stream int8
# at the achievable rate on the T-minor layout. Default OFF (the einsum
# is simpler and equally fast); the kernel stays as the validated
# on-chip-dequant base for the int4 variant. Override with
# WHISPER_IPA_TPU_DECODE_KERNEL=1/0 or use_decode_kernel(True/False/None).
_DECODE_KERNEL = {"1": True, "0": False}.get(
    _os.environ.get("WHISPER_IPA_TPU_DECODE_KERNEL", "auto")
)  # None = auto (currently: off)


def use_decode_kernel(enabled) -> None:
    """True = always (when eligible), False = never, None = auto."""
    global _DECODE_KERNEL
    _DECODE_KERNEL = enabled


def _on_accelerator() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def _decode_kernel_eligible(qh, k_i8, interpret: bool) -> bool:
    if qh.shape[2] != 1:  # single-query steps only (the greedy loop)
        return False
    if k_i8.shape[-1] % 128 != 0:  # init_cache pre-pads to the lane tile
        return False
    if _DECODE_KERNEL is not True:
        return False  # None = auto: einsum (measured parity, simpler)
    return interpret or _on_accelerator()


def multi_head_attention_int8kv(
    q, k_i8, k_scale, v_i8, v_scale, n_head: int, interpret: bool = False
):
    """Unmasked attention with an int8-quantized, T-minor K/V cache.

    q: (B, S, d); k_i8/v_i8: (B, H, Dh, T) int8; scales: (B, H, T) f32
    (init_cache's cross_kv_int8 layout). Cross-K/V reads dominate the
    decode loop's HBM traffic — int8 halves the bytes vs bfloat16, and
    storing T as the MINOR axis is load-bearing: with Dh=64 minor, TPU
    (sub)lane tiles pad 64->128 and every load moves 2x the bytes. xprof
    on v5e (batch 128): (B,H,T,Dh) sustained 186-202 GB/s in the decode
    einsums; this (B,H,Dh,T) layout runs the same ops 3x faster
    (21.2 -> 7.2 ms/token isolated). Scales fold into the logits (K) and
    the probabilities (V); no dequantized copy is materialized. An
    int8 x int8 MXU formulation (quantized q and probabilities) measured
    no faster than this convert-in-dot one on the same layout, so the
    simpler form stays; three Pallas flash-decode kernels on the OLD
    layout also lost (see ops/decode_attention.py, kept as a record).
    """
    d_head = q.shape[-1] // n_head
    qh = _split_heads(q * (d_head**-0.5), n_head)  # (B, H, S, Dh)

    if k_scale.shape[-1] != k_i8.shape[-1]:
        # int4 nibble-packed codes (T_pad/2 bytes vs T_pad scales):
        # dequantize per nibble plane, interleave only the SMALL logits
        return _mha_int4kv(
            qh, k_i8, k_scale, v_i8, v_scale, interpret=interpret
        )

    if _decode_kernel_eligible(qh, k_i8, interpret):
        from ..ops.decode_attention import (
            decode_cross_attention_int8_tminor,
        )

        out = decode_cross_attention_int8_tminor(
            qh, k_i8, k_scale, v_i8, v_scale, interpret=interpret
        )
        return _merge_heads(out)

    logits = jnp.einsum(
        "bhsd,bhdt->bhst", qh, k_i8.astype(q.dtype)
    ).astype(jnp.float32)
    ks = k_scale[:, :, None, :]
    # scale 0 marks tile-padding positions (real scales are > 0)
    logits = jnp.where(ks > 0.0, logits * ks, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    w = (w * v_scale[:, :, None, :]).astype(q.dtype)
    out = jnp.einsum("bhst,bhdt->bhsd", w, v_i8.astype(q.dtype))
    return _merge_heads(out)


def _mha_int4kv(qh, k_p4, k_scale, v_p4, v_scale, interpret: bool = False):
    """Attention over the nibble-packed int4 T-minor cache.

    qh: (B, H, S, Dh) pre-scaled; k_p4/v_p4: (B, H, Dh, T_pad/2) int8
    holding two T-adjacent int4 codes (even T low nibble, odd high);
    scales: (B, H, T_pad) f32. The K/V loads stay packed (quarter of
    bf16's bytes); the nibble planes are contracted separately and only
    the (B, H, S, T) logits/probabilities — tiny next to the cache — are
    interleaved/de-interleaved.

    Single-query steps can route through the fused Pallas kernel
    (in-VMEM nibble dequant) via use_decode_kernel(True). Measured r3:
    dead heat with this XLA plane path (8.40 vs 8.41 ms/token, batch
    128 v5e) — both are VPU-dequant-bound, so the kernel is opt-in like
    the int8 one (docs/PERF.md r3 int4 kernel row).
    """
    dtype = qh.dtype
    B, H, S, Dh = qh.shape
    T2 = k_p4.shape[-1]

    if S == 1 and T2 % 128 == 0 and _DECODE_KERNEL is True and (
        interpret or _on_accelerator()
    ):
        from ..ops.decode_attention import (
            decode_cross_attention_int4_tminor,
        )

        out = decode_cross_attention_int4_tminor(
            qh, k_p4, k_scale, v_p4, v_scale, interpret=interpret
        )
        return _merge_heads(out)

    def planes(p):
        lo = jnp.right_shift(jnp.left_shift(p, 4), 4).astype(dtype)
        hi = jnp.right_shift(p, 4).astype(dtype)
        return lo, hi

    k_lo, k_hi = planes(k_p4)
    l_even = jnp.einsum("bhsd,bhdt->bhst", qh, k_lo).astype(jnp.float32)
    l_odd = jnp.einsum("bhsd,bhdt->bhst", qh, k_hi).astype(jnp.float32)
    logits = jnp.stack([l_even, l_odd], axis=-1).reshape(B, H, S, 2 * T2)
    ks = k_scale[:, :, None, :]
    logits = jnp.where(ks > 0.0, logits * ks, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    w = w * v_scale[:, :, None, :]
    v_lo, v_hi = planes(v_p4)
    w_even = w[..., 0::2].astype(dtype)
    w_odd = w[..., 1::2].astype(dtype)
    out = jnp.einsum("bhst,bhdt->bhsd", w_even, v_lo) + jnp.einsum(
        "bhst,bhdt->bhsd", w_odd, v_hi
    )
    return _merge_heads(out)


def multi_head_attention(
    q, k, v, n_head: int, mask: Optional[jax.Array] = None
):
    """Scaled dot-product attention over merged-head projections.

    q/k/v: (B, Tq/Tk, d). mask: additive, broadcastable to (B, H, Tq, Tk).
    Softmax accumulates in float32.
    """
    d_head = q.shape[-1] // n_head
    scale = d_head ** -0.25

    if _fused_eligible(q, mask):
        if _MERGED_ATTENTION:
            from ..ops.attention import fused_attention_merged

            return fused_attention_merged(
                q, k, v, n_head, scale=float(d_head ** -0.5)
            )
        from ..ops.attention import fused_attention

        # the total d_head**-0.5 scale is folded into the kernel's q
        # block in VMEM — host-side q*scale/k*scale muls materialized
        # (B, H, T, Dh) copies (xprof: 52 ms per batch-128 encode)
        return _merge_heads(
            fused_attention(
                _split_heads(q, n_head),
                _split_heads(k, n_head),
                _split_heads(v, n_head),
                scale=float(d_head ** -0.5),
            )
        )

    # NOT wrapped in jax.checkpoint. Tried (r3): rematerializing the
    # (B, H, Tq, Tk) softmax in the backward instead of saving it cost
    # 19% on the cached-feature train step (batch 64: 124.6 -> 148
    # ms/step; batch 96: 402 samples/s vs full-remat's 433) and did NOT
    # unlock batch 128 — the binding residuals there are the stacked
    # per-layer cross-attention K/V projections (2 x bf16[12,B,1500,768]
    # = 6.6 GB at B=128, per the OOM dump), which attention-local remat
    # cannot touch. The existing per-layer `remat` flag subsumes both
    # and measures faster, so memory pressure routes there instead.
    return _attention_core(q, k, v, mask, n_head=n_head, scale=scale)


def _attention_core(q, k, v, mask, *, n_head: int, scale: float):
    qh = _split_heads(q, n_head) * scale
    kh = _split_heads(k, n_head) * scale
    vh = _split_heads(v, n_head)

    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    if mask is not None:
        logits = logits + mask
    w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return _merge_heads(out)


def multi_head_attention_two_part(
    q, k_cache, v_cache, k_new, v_new, n_head: int, mask_cache, mask_new
):
    """Attention over [frozen cache | new in-step keys] WITHOUT
    concatenating K/V (a (B, n_ctx, d) concat would re-copy the whole
    cache every decode step — the copy this formulation exists to kill).
    Only the LOGITS are concatenated ((B, H, S, n_ctx + S), a few KB at
    S=1), then the two value dots are summed.

    mask_cache: additive, broadcastable to (B, H, S, n_ctx);
    mask_new: additive, broadcastable to (B, H, S, S).
    """
    d_head = q.shape[-1] // n_head
    scale = d_head ** -0.25
    qh = _split_heads(q, n_head) * scale
    kc = _split_heads(k_cache, n_head) * scale
    kn = _split_heads(k_new, n_head) * scale

    lc = jnp.einsum("bhqd,bhkd->bhqk", qh, kc).astype(jnp.float32)
    lc = lc + mask_cache
    ln = jnp.einsum("bhqd,bhkd->bhqk", qh, kn).astype(jnp.float32)
    ln = ln + mask_new
    n_ctx = lc.shape[-1]
    w = jax.nn.softmax(
        jnp.concatenate([lc, ln], axis=-1), axis=-1
    ).astype(v_cache.dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", w[..., :n_ctx], _split_heads(v_cache, n_head)
    ) + jnp.einsum(
        "bhqk,bhkd->bhqd", w[..., n_ctx:], _split_heads(v_new, n_head)
    )
    return _merge_heads(out)


def multi_head_attention_beam_cache(
    q, k_cache, v_cache, k_new, v_new, n_head: int, sel_mask
):
    """Beam self-attention over UNREORDERED per-row K/V caches.

    Classic TPU beam search reorders the whole self-KV cache every step
    (a one-hot einsum = a full cache copy — the dominant HBM term once
    the context grows). This formulation never moves the cache: each
    physical row k keeps the K/V its beam slot wrote, an ancestry table
    records which row holds beam j's history at each position, and
    attention computes logits against ALL rows then lets an additive
    select-mask (0 where anc[b,j,p]==k and p is live, -inf elsewhere)
    pick exactly one row per (beam, position) inside the softmax. Bytes
    read: live rows once (same as reordered attention); bytes written:
    none. The K-fold extra logit FLOPs are decode-shaped matvecs — MXU
    change, not an HBM one.

    q/k_new/v_new: (B, J, d) — one query (and one new self K/V) per
    beam; k_cache/v_cache: (B, K, n_ctx, d) physical rows (J == K);
    sel_mask: additive (B, J, K, n_ctx). The new token attends itself
    (causally last), so its logit needs no mask.
    """
    B, J, d = q.shape
    n_ctx = k_cache.shape[2]
    d_head = d // n_head
    scale = d_head ** -0.25

    def split(x):  # (B, X, d) -> (B, X, H, Dh)
        return x.reshape(x.shape[:-1] + (n_head, d_head))

    qh = split(q) * scale  # (B, J, H, Dh)
    kc = split(k_cache.reshape(B, -1, d)).reshape(
        B, k_cache.shape[1], n_ctx, n_head, d_head
    ) * scale  # (B, K, P, H, Dh)
    kn = split(k_new) * scale  # (B, J, H, Dh)

    lc = jnp.einsum("bjhd,bkphd->bhjkp", qh, kc).astype(jnp.float32)
    lc = lc + sel_mask[:, None]  # (B, H, J, K, P)
    ln = jnp.einsum("bjhd,bjhd->bhj", qh, kn).astype(jnp.float32)

    flat = jnp.concatenate(
        [lc.reshape(B, n_head, J, -1), ln[..., None]], axis=-1
    )
    w = jax.nn.softmax(flat, axis=-1).astype(v_cache.dtype)
    wc = w[..., :-1].reshape(lc.shape)
    vc = split(v_cache.reshape(B, -1, d)).reshape(
        B, v_cache.shape[1], n_ctx, n_head, d_head
    )
    out = jnp.einsum("bhjkp,bkphd->bjhd", wc, vc)
    out = out + w[..., -1][..., None].transpose(0, 2, 1, 3) * split(v_new)
    return out.reshape(B, J, d)


def attention_block(x, p, n_head: int, mask=None, kv=None):
    """Self- or cross-attention through a Whisper attention param group.

    p: {"query","key","value","out"}. When kv is given (cross-attention or
    cached keys/values) it is a tuple (k, v) of already-projected tensors.
    """
    q = linear(x, p["query"])
    if kv is None:
        k = linear(x, p["key"])
        v = linear(x, p["value"])
    else:
        k, v = kv
    out = multi_head_attention(q, k, v, n_head, mask)
    return linear(out, p["out"]), (k, v)


def mlp_block(x, p):
    return linear(gelu(linear(x, p["mlp1"])), p["mlp2"])


def causal_mask(n_ctx: int) -> np.ndarray:
    """(n_ctx, n_ctx) additive causal mask (upper triangle = -inf)."""
    mask = np.full((n_ctx, n_ctx), -np.inf, dtype=np.float32)
    return np.triu(mask, k=1)
