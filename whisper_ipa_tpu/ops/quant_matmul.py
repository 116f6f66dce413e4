"""Pallas TPU kernel: dynamic-activation int8 x int8 matmul.

Completes the int8 serving path: ops/quant.py stores weights as int8 +
per-output-channel scales; this kernel also quantizes activations on the
fly (per-row symmetric int8) so the MXU runs int8 x int8 -> int32 — double
the bf16 throughput on v5e — and only int8 weight bytes cross HBM.

y[m, n] = (x_q[m, :] . w_q[:, n]) * x_scale[m] * w_scale[n]

Accuracy: two int8 quantizations compound to ~1-2% relative error on
transformer activations — acceptable for serving, not for training (the
weight-only path in models/layers.py remains the default).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BLOCK_M = 128
BLOCK_N = 256


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _int8_matmul_kernel(x_ref, wq_ref, ws_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)  # (BLOCK_M, K)

    # per-row symmetric activation quantization
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    x_scale = jnp.maximum(absmax, 1e-6) / 127.0
    x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        x_q,
        wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (BLOCK_M, BLOCK_N) int32

    out_ref[0] = (
        acc.astype(jnp.float32) * x_scale * ws_ref[:].astype(jnp.float32)
    )


@partial(jax.jit, static_argnames=("interpret",))
def int8_matmul(x, w_q, w_scale, interpret: bool = False):
    """x (..., K) float x int8 weights (K, N) + scales (N,) -> (..., N) f32.

    Both operands int8 on the MXU; activations quantized per row inside
    the kernel.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    K = orig_shape[-1]
    N = w_q.shape[1]
    xf = x.reshape(-1, K)
    M = xf.shape[0]

    m_pad = _round_up(max(M, 1), BLOCK_M)
    n_pad = _round_up(N, BLOCK_N)
    if m_pad != M:
        xf = jnp.pad(xf, ((0, m_pad - M), (0, 0)))
    wq = w_q
    ws = w_scale
    if n_pad != N:
        wq = jnp.pad(w_q, ((0, 0), (0, n_pad - N)))
        ws = jnp.pad(w_scale, (0, n_pad - N))
    ws2 = ws.reshape(1, n_pad)

    out = pl.pallas_call(
        _int8_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad // BLOCK_M, BLOCK_M, n_pad), jnp.float32),
        grid=(m_pad // BLOCK_M, n_pad // BLOCK_N),
        in_specs=[
            pl.BlockSpec(
                (1, BLOCK_M, K),
                lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K, BLOCK_N),
                lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BLOCK_N),
                lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_M, BLOCK_N),
            lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(xf.reshape(m_pad // BLOCK_M, BLOCK_M, K), wq, ws2)

    out = out.reshape(m_pad, n_pad)[:M, :N]
    return out.reshape(*orig_shape[:-1], N)


# -- int4 weight-only fused matmul -------------------------------------

BLOCK_N4 = 256


def _int4_matmul_kernel(rows_per_group, x_even_ref, x_odd_ref, wp_ref,
                        ws_ref, out_ref):
    """Dequantize nibble-packed int4 weights in VMEM and contract.

    Per grid step (one BLOCK_N4 column tile):
      x_even/x_odd (M, K/2) f32 — stride-2 input splits (host-side)
      wp (K/2, BLOCK_N4) int8 packed codes (row 2i low nibble, 2i+1 high)
      ws (K/G, BLOCK_N4) f32 group scales (G = 64 input rows = 32 packed)
    The group scales are applied via a (K/2, N) -> (G_cnt, 32, N)
    reshape: the minor (lane) dim is untouched and 32 is a multiple of
    the 8-row sublane tile, so the split lands on tile boundaries
    (Mosaic's reshape constraint).
    """
    wp = wp_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(wp, 28), 28).astype(jnp.float32)
    hi = jnp.right_shift(jnp.left_shift(wp, 24), 28).astype(jnp.float32)
    n_half, n_blk = wp.shape
    g_cnt = n_half // rows_per_group
    s = ws_ref[:][:, None, :]  # (G_cnt, 1, BLOCK_N4)
    lo = (lo.reshape(g_cnt, rows_per_group, n_blk) * s).reshape(
        n_half, n_blk
    )
    hi = (hi.reshape(g_cnt, rows_per_group, n_blk) * s).reshape(
        n_half, n_blk
    )

    def dot(a, b):
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out_ref[:] = dot(x_even_ref[:], lo) + dot(x_odd_ref[:], hi)


@partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(x, w_q4, w_s4, interpret: bool = False):
    """x (..., K) float x nibble-packed int4 weights -> (..., N) f32.

    w_q4: (K/2, N) int8 (ops/quant.pack_int4), w_s4: (K/G, N) f32 group
    scales. Streams only the packed bytes (half of int8, quarter of
    bf16) and dequantizes in VMEM — unlike models/layers._int4_halves,
    which makes XLA materialize both dequantized (K/2, N) half-weight
    matrices in registers/HBM per call. The dequant cost is amortized
    over all M rows (the KV-cache int4 kernel showed dequant dominates
    at M=1; a weight matmul reuses the dequantized tile M times).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    K = orig_shape[-1]
    n_half, N = w_q4.shape
    assert 2 * n_half == K
    g_cnt = w_s4.shape[0]
    rows_per_group = n_half // g_cnt
    assert rows_per_group % 8 == 0, (
        "packed rows per scale group must fill whole sublane tiles"
    )
    xf = x.reshape(-1, K).astype(jnp.float32)
    M = xf.shape[0]
    m_pad = _round_up(max(M, 1), 8)
    if m_pad != M:
        xf = jnp.pad(xf, ((0, m_pad - M), (0, 0)))
    x_even = xf[:, 0::2]
    x_odd = xf[:, 1::2]

    n_pad = _round_up(N, BLOCK_N4)
    wq = w_q4
    ws = w_s4
    if n_pad != N:
        wq = jnp.pad(w_q4, ((0, 0), (0, n_pad - N)))
        ws = jnp.pad(w_s4, ((0, 0), (0, n_pad - N)))

    out = pl.pallas_call(
        partial(_int4_matmul_kernel, rows_per_group),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        grid=(n_pad // BLOCK_N4,),
        in_specs=[
            pl.BlockSpec(
                (m_pad, n_half), lambda j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m_pad, n_half), lambda j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_half, BLOCK_N4), lambda j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g_cnt, BLOCK_N4), lambda j: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (m_pad, BLOCK_N4), lambda j: (0, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(x_even, x_odd, wq, ws)

    return out[:M, :N].reshape(*orig_shape[:-1], N)
