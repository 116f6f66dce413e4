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


# q rows per grid cell in the BACKWARD kernel. Smaller than the forward's
# 768: the backward keeps three (BLOCK, T_pad) f32 temporaries (logits,
# probs, dP) in VMEM at once.
BLOCK_Q_BWD = 512


def _attn_bwd_kernel(
    tq: int, kv_len: int, scale: float,
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
):
    """Flash-style attention backward for one (b*h, q-block) grid cell.

    Recomputes logits/softmax from q/k in VMEM (never materializing the
    (Tq, Tk) probabilities in HBM), then forms dq for this q block and
    accumulates dk/dv across q blocks (the dk/dv out blocks ignore the
    q-grid index, so Pallas keeps them VMEM-resident across the revisits).

    Uses the denominator-folding identities (P = p/denom unnormalized):
      dV = P^T g            = p^T (g/denom)
      dP' = (g/denom) v^T   = dP_true/denom
      delta = rowsum(p . dP') = rowsum(P . dP_true)
      dS = P.(dP_true - delta) = p . (dP' - delta/denom)
    so the only (BLOCK, T_pad)-sized elementwise ops are one multiply and
    one subtract — no big divides.
    """
    import jax.experimental.pallas as pl

    i = pl.program_id(1)
    q = q_ref[0]  # (BLOCK, Dh); rows past tq hold undefined VMEM
    k = k_ref[0]  # (T_pad, Dh); rows past kv_len hold undefined VMEM
    v = v_ref[0]
    g = g_ref[0]

    t_pad = k.shape[0]
    if t_pad > kv_len:
        # zero the undefined K/V pad rows: dS's zero pad columns hit them
        # in the dq/dP dots, and 0 * NaN = NaN would poison the result
        row = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        k = jnp.where(row < kv_len, k, 0)
        v = jnp.where(row < kv_len, v, 0)
    # partial final q block: rows past tq hold undefined VMEM (possibly
    # NaN) and feed the dk dot (dS^T @ q) — zero them
    rowid = (
        jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], 1), 0)
        + i * q.shape[0]
    )
    rvalid = rowid < tq
    q = jnp.where(rvalid, q, 0)
    if scale != 1.0:
        q = q * jnp.asarray(scale, q.dtype)  # qs: S = qs @ k^T

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLOCK, T_pad) f32
    if t_pad > kv_len:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    # invalid q rows contribute nothing to the dk/dv accumulation
    p = jnp.where(rvalid, p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    denom = jnp.where(rvalid, denom, 1.0)

    gs = jnp.where(rvalid, g.astype(jnp.float32) / denom, 0.0)  # g/denom
    gs = gs.astype(v.dtype)
    dP = jax.lax.dot_general(  # (BLOCK, T_pad) = gs @ v^T
        gs, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(p * dP, axis=-1, keepdims=True)
    dS = p * (dP - delta / denom)  # (BLOCK, T_pad) f32

    dSc = dS.astype(q.dtype)
    dq = jax.lax.dot_general(  # (BLOCK, Dh) = dS @ k, then undo the fold
        dSc, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:
        dq = dq * jnp.asarray(scale, dq.dtype)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk = jax.lax.dot_general(  # (T_pad, Dh) = dS^T @ qs
        dSc, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv = jax.lax.dot_general(  # (T_pad, Dh) = p^T @ gs
        p.astype(gs.dtype), gs,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(i > 0)
    def _accum():
        dk_ref[0] += dk.astype(dk_ref.dtype)
        dv_ref[0] += dv.astype(dv_ref.dtype)


@partial(jax.jit, static_argnames=("scale", "interpret"))
def _flash_attention_bwd_impl(q, k, v, g, scale: float = 1.0,
                              interpret: bool = False):
    """dq/dk/dv via the Pallas backward kernel. dk/dv accumulate in f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Tq, Dh = q.shape
    Tk = k.shape[2]
    BH = B * H
    tk_pad = _round_up(Tk, 128)
    n_qb = _round_up(Tq, BLOCK_Q_BWD) // BLOCK_Q_BWD

    qf = q.reshape(BH, Tq, Dh)
    kf = k.reshape(BH, Tk, Dh)
    vf = v.reshape(BH, Tk, Dh)
    gf = g.reshape(BH, Tq, Dh)

    # single q block (the teacher-forced training shapes): no cross-block
    # accumulation, so emit dk/dv in the input dtype directly — f32
    # outputs would double the dominant HBM write (dk/dv are (Tk=1500)-
    # sized in cross-attention) and add a convert pass. Multi-block grids
    # keep the f32 accumulator for exact partial sums.
    acc_dtype = jnp.float32 if n_qb > 1 else k.dtype

    full_kv = pl.BlockSpec(
        (1, tk_pad, Dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    qblock = pl.BlockSpec(
        (1, BLOCK_Q_BWD, Dh), lambda b, i: (b, i, 0),
        memory_space=pltpu.VMEM,
    )
    dq, dk, dv = pl.pallas_call(
        partial(_attn_bwd_kernel, Tq, Tk, scale),
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tq, Dh), q.dtype),
            jax.ShapeDtypeStruct((BH, Tk, Dh), acc_dtype),
            jax.ShapeDtypeStruct((BH, Tk, Dh), acc_dtype),
        ],
        grid=(BH, n_qb),
        in_specs=[qblock, full_kv, full_kv, qblock],
        out_specs=[
            qblock,
            pl.BlockSpec(
                (1, tk_pad, Dh), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tk_pad, Dh), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        interpret=interpret,
    )(qf, kf, vf, gf)

    return (
        dq.reshape(B, H, Tq, Dh),
        dk.reshape(B, H, Tk, Dh).astype(k.dtype),
        dv.reshape(B, H, Tk, Dh).astype(v.dtype),
    )


# q rows per grid cell in the MERGED-head kernel. Smaller than the
# split kernel's 768: blocks are H*Dh wide instead of Dh, so VMEM holds
# q/out at (BLOCK, d) plus one (BLOCK, T_pad) f32 logits temp.
BLOCK_Q_MERGED = 512


def _attn_kernel_merged(
    n_head: int, kv_len: int, scale: float, q_ref, k_ref, v_ref, out_ref
):
    """Head-merged I/O variant: blocks arrive as (BLOCK, d = H*Dh).

    WHY (r3 verdict item 3 / docs/ROADMAP.md head-merged idea): the
    split-head kernel's HBM operands are (B*H, T, 64) — the 64-minor
    axis pads to the 128-lane tile, so every q/k/v/out byte moves twice
    (docs/PERF.md r2: '2.0x expansion'). Merged (B, T, 768) operands
    have a tile-aligned minor dim (no pad), K/V stream ONCE per q block
    for all heads instead of once per head, and the four split/merge
    transposes around the kernel (models/layers._split_heads/_merge_
    heads — real HBM copies) disappear. Heads are separated INSIDE VMEM
    by static 64-wide lane slices. Whether the on-chip slicing costs
    more than the saved bandwidth is the open A/B (the kernel measured
    36% MFU, i.e. possibly VPU-bound, not HBM-bound) — measured on TPU
    via perf/bench_enc_attn.py.
    """
    d = q_ref.shape[-1]
    dh = d // n_head
    q = q_ref[0]  # (BLOCK, d)
    if scale != 1.0:
        q = q * jnp.asarray(scale, q.dtype)
    k = k_ref[0]  # (T_pad, d)
    v = v_ref[0]

    t_pad = k.shape[0]
    if t_pad > kv_len:
        # zero undefined V pad rows once for all heads (0 * NaN guard)
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(row < kv_len, v, 0)

    for h in range(n_head):
        q_h = q[:, h * dh:(h + 1) * dh]
        k_h = k[:, h * dh:(h + 1) * dh]
        v_h = v[:, h * dh:(h + 1) * dh]
        logits = jax.lax.dot_general(
            q_h, k_h,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLOCK, T_pad) f32
        if t_pad > kv_len:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < kv_len, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(
            p.astype(v_h.dtype), v_h, preferred_element_type=jnp.float32
        )
        out_ref[0, :, h * dh:(h + 1) * dh] = (out / denom).astype(
            out_ref.dtype
        )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_merged(
    q, k, v, n_head: int, scale: float = 1.0, interpret: bool = False
):
    """(B, Tq, d) x (B, Tk, d) -> (B, Tq, d): fused attention with
    head-merged kernel I/O (no (B, H, T, 64) intermediates anywhere).

    Forward: _attn_kernel_merged. Backward: the existing flash backward
    on split heads (training perf is unchanged; this variant targets the
    inference encode path).
    """
    return _fused_attention_merged_impl(q, k, v, n_head, scale, interpret)


def _fused_attention_merged_fwd(q, k, v, n_head, scale, interpret):
    return (
        _fused_attention_merged_impl(q, k, v, n_head, scale, interpret),
        (q, k, v),
    )


def _fused_attention_merged_bwd(n_head, scale, interpret, residuals, g):
    q, k, v = residuals

    def split(x):
        b, t, d = x.shape
        return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)

    def merge(x):
        b, h, t, hd = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)

    on_cpu = False
    if not interpret:
        try:
            on_cpu = jax.devices()[0].platform == "cpu"
        except Exception:
            on_cpu = True
    if on_cpu:
        _, vjp = jax.vjp(
            lambda q, k, v: merge(
                _xla_attention(split(q), split(k), split(v), scale)
            ),
            q, k, v,
        )
        return vjp(g)
    dq, dk, dv = _flash_attention_bwd_impl(
        split(q), split(k), split(v), split(g), scale, interpret
    )
    return merge(dq), merge(dk), merge(dv)


fused_attention_merged.defvjp(
    _fused_attention_merged_fwd, _fused_attention_merged_bwd
)


@partial(jax.jit, static_argnames=("n_head", "scale", "interpret"))
def _fused_attention_merged_impl(
    q, k, v, n_head: int, scale: float = 1.0, interpret: bool = False
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tq, d = q.shape
    Tk = k.shape[1]
    tk_pad = _round_up(Tk, 128)

    grid = (B, _round_up(Tq, BLOCK_Q_MERGED) // BLOCK_Q_MERGED)
    full_kv = pl.BlockSpec(
        (1, tk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    qblock = pl.BlockSpec(
        (1, BLOCK_Q_MERGED, d), lambda b, i: (b, i, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        partial(_attn_kernel_merged, n_head, Tk, scale),
        out_shape=jax.ShapeDtypeStruct((B, Tq, d), q.dtype),
        grid=grid,
        in_specs=[qblock, full_kv, full_kv],
        out_specs=qblock,
        interpret=interpret,
    )(q, k, v)


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
    pass runs a flash-style Pallas kernel too (_attn_bwd_kernel) that
    recomputes logits/softmax in VMEM — the (Tq, Tk) probabilities never
    touch HBM in either pass, and not at all under stop_gradient, e.g.
    the frozen-encoder training regime. (CPU without interpret falls back
    to the XLA VJP.)
    """
    return _fused_attention_impl(q, k, v, scale, interpret)


def _fused_attention_fwd(q, k, v, scale, interpret):
    return _fused_attention_impl(q, k, v, scale, interpret), (q, k, v)


def _fused_attention_bwd(scale, interpret, residuals, g):
    q, k, v = residuals
    on_cpu = False
    if not interpret:
        try:
            on_cpu = jax.devices()[0].platform == "cpu"
        except Exception:
            on_cpu = True
    if on_cpu:  # Pallas needs an accelerator (or interpret mode)
        _, vjp = jax.vjp(
            lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v
        )
        return vjp(g)
    return _flash_attention_bwd_impl(q, k, v, g, scale, interpret)


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
