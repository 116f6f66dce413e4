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
