"""Fused cross-attention K/V cache build: projection + int8 quantize,
written directly in the T-minor decode layout.

The XLA path (models/whisper.init_cache) runs three HBM passes per
layer tensor: the K/V projection writes (B, T, d) bf16, the quantizer
reads it back (transpose + amax pass + codes pass), and the int8 codes
land T-minor. This kernel does it in ONE pass: each grid step loads an
x block once, projects it for K and V on the MXU with the weights held
transposed so the output is born (d, T_BLK) — T already minor, no HBM
transpose, no (B, T, d) intermediate — then quantizes per (head,
position) group in VMEM and stores int8 codes + f32 scales.

Part of the round-3 verdict item 3 study (the ~150 ms one-time
prefix/init in the headline decode): behavioral reference for the
quantization contract is models/whisper._quantize_kv_heads (scale 0
marks padded positions; per-(position, head) symmetric int8 over the
Dh=64 group). Reference decode path: /root/reference uses mlx-whisper's
KV cache build (whisper/decoding.py) — this layout/fusion design is
TPU-specific, no counterpart there.

Numerics match the XLA path: the MXU accumulates in f32, then the
projection result is rounded through bfloat16 (exactly what the
unfused linear() returns) before the f32 quantization math, so codes
agree with the reference composition to +/-1 ULP of the rounding.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, wkt_ref, bk_ref, wvt_ref, bv_ref,
            kc_ref, ks_ref, vc_ref, vs_ref,
            *, n_head: int, t_len: int, t_block: int, out_dtype):
    t = pl.program_id(1)
    x = x_ref[0]  # (T_BLK, d_in)
    d = wkt_ref.shape[0]
    dh = d // n_head

    # lane index of each output column; columns past the real T get
    # scale 0 (the downstream mask contract) and code 0
    col = jax.lax.broadcasted_iota(jnp.int32, (1, t_block), 1)
    valid = (t * t_block + col) < t_len

    for wt_ref, b_ref, c_ref, s_ref in (
        (wkt_ref, bk_ref, kc_ref, ks_ref),
        (wvt_ref, bv_ref, vc_ref, vs_ref),
    ):
        # (d, T_BLK) = W^T @ x^T: weights arrive pre-transposed so the
        # contraction is lane-vs-lane (the same dimension_numbers the
        # fused-attention kernel uses); T is minor from birth
        y = jax.lax.dot_general(
            wt_ref[:],
            x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # mirror the unfused path's rounding order exactly: linear()
        # rounds the f32-accumulated dot to bf16, adds the bf16 bias,
        # and rounds again (for a bf16-exact value + bias 0 the second
        # rounding is the identity, so the no-bias case matches too)
        y = y.astype(out_dtype).astype(jnp.float32)
        y = (y + b_ref[:]).astype(out_dtype).astype(jnp.float32)
        for h in range(n_head):
            blk = y[h * dh:(h + 1) * dh]  # (Dh, T_BLK) sublane slice
            amax = jnp.max(jnp.abs(blk), axis=0, keepdims=True)
            scale = jnp.maximum(amax, 1e-8) / 127.0
            codes = jnp.round(blk / scale).astype(jnp.int8)
            c_ref[0, h] = jnp.where(valid, codes, 0)
            s_ref[0, h] = jnp.where(valid, scale, 0.0)


@partial(
    jax.jit,
    static_argnames=("n_head", "t_block", "out_dtype", "interpret"),
)
def fused_kv_init_int8(
    x,
    wk,
    bk,
    wv,
    bv,
    n_head: int,
    t_block: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Project x with (wk, bk) / (wv, bv) and int8-quantize, T-minor.

    x: (B, T, d_in); wk/wv: (d_in, d); bk/bv: (d,) or None.
    Returns (k_codes, k_scale, v_codes, v_scale) with codes
    (B, H, Dh, T_pad) int8 and scales (B, H, T_pad) f32, T_pad the
    128-lane round-up — bit-matching models/whisper._quantize_kv_heads
    applied to linear(x, {w, b}).
    """
    if not interpret:
        try:
            interpret = jax.devices()[0].platform == "cpu"
        except Exception:
            interpret = True

    B, T, d_in = x.shape
    d = wk.shape[1]
    dh = d // n_head
    t_pad = ((T + 127) // 128) * 128
    while t_pad % t_block:  # t_block must tile t_pad exactly
        t_block //= 2
    n_t = t_pad // t_block

    # pre-transpose the weights (folded by XLA into the params' layout;
    # (d, d) bf16 is ~1 MB) and shape biases (d, 1) f32 for lane
    # broadcast; a missing bias becomes zeros (whisper K has none)
    wkt = wk.astype(out_dtype).T
    wvt = wv.astype(out_dtype).T
    # biases pre-rounded to the compute dtype (linear() adds them as
    # x.dtype), carried f32 for the in-kernel add
    zeros = jnp.zeros((d, 1), jnp.float32)
    bkc = (zeros if bk is None
           else bk.astype(out_dtype).astype(jnp.float32).reshape(d, 1))
    bvc = (zeros if bv is None
           else bv.astype(out_dtype).astype(jnp.float32).reshape(d, 1))

    kernel = partial(
        _kernel,
        n_head=n_head,
        t_len=T,
        t_block=t_block,
        out_dtype=out_dtype,
    )
    codes_shape = jax.ShapeDtypeStruct((B, n_head, dh, t_pad), jnp.int8)
    scale_shape = jax.ShapeDtypeStruct((B, n_head, 1, t_pad), jnp.float32)

    kc, ks, vc, vs = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, t_block, d_in), lambda b, t: (b, t, 0)),
            pl.BlockSpec((d, d_in), lambda b, t: (0, 0)),
            pl.BlockSpec((d, 1), lambda b, t: (0, 0)),
            pl.BlockSpec((d, d_in), lambda b, t: (0, 0)),
            pl.BlockSpec((d, 1), lambda b, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_head, dh, t_block), lambda b, t: (b, 0, 0, t)),
            pl.BlockSpec((1, n_head, 1, t_block), lambda b, t: (b, 0, 0, t)),
            pl.BlockSpec((1, n_head, dh, t_block), lambda b, t: (b, 0, 0, t)),
            pl.BlockSpec((1, n_head, 1, t_block), lambda b, t: (b, 0, 0, t)),
        ],
        out_shape=[codes_shape, scale_shape, codes_shape, scale_shape],
        interpret=interpret,
    )(x.astype(out_dtype), wkt, bkc, wvt, bvc)
    return kc, ks.reshape(B, n_head, t_pad), vc, vs.reshape(B, n_head, t_pad)
