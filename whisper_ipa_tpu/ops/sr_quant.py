"""On-device stochastic-rounding int8 quantization (Pallas TPU kernel).

Quantizing weights on the HOST (ops/quant.py, numpy) costs a full
float32 download + CPU pass + upload — ~10 s for whisper-large-v3 at
serve startup. This kernel quantizes in place on the TPU: one pass over
HBM, no host round-trip.

Stochastic rounding (q = round-to-nearest with probability proportional
to proximity, via ``pltpu.stochastic_round``) makes the quantizer
unbiased — E[q·s] = w — so quantization error behaves like zero-mean
noise instead of a systematic bias. The scale convention matches
ops/quant.quantize_linear: per-output-channel symmetric,
s[out] = max|w[:, out]| / 127.

The TPU PRNG primitives have no CPU lowering (not even in interpret
mode), so non-TPU backends use an equivalent ``jax.random``-based
fallback: floor(x/s + u), u ~ U[0, 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BLOCK_C = 256


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _sr_quant_kernel(seed_ref, x_ref, q_ref, s_ref):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # decorrelate column blocks: each grid step reseeds with its block id
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]  # (R, BLOCK_C) float32
    amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    scaled = x / s
    bits = pltpu.bitcast(
        pltpu.prng_random_bits(scaled.shape), jnp.uint32
    )
    # uniform [0, 1) from the top 23 random bits via the float32 mantissa:
    # (bits >> 9) | 0x3F800000 bitcast to f32 lies in [1, 2). This build's
    # pltpu.stochastic_round only targets float dtypes, so int8 SR is done
    # by hand: floor(x/s + u) is SR to the nearest integers.
    mant = jax.lax.shift_right_logical(bits, jnp.uint32(9)) | jnp.uint32(
        0x3F800000
    )
    u = pltpu.bitcast(mant, jnp.float32) - 1.0
    q_ref[:] = jnp.clip(jnp.floor(scaled + u), -127, 127).astype(jnp.int8)
    s_ref[:] = s


@partial(jax.jit, static_argnames=())
def _sr_quant_fallback(x, seed):
    key = jax.random.PRNGKey(seed)
    amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    u = jax.random.uniform(key, x.shape, jnp.float32)
    q = jnp.clip(jnp.floor(x / s + u), -127, 127).astype(jnp.int8)
    return q, s[0]


def stochastic_quantize_int8(x, seed: int = 0):
    """(in, out) float -> (int8 codes (in, out), scales (out,) float32).

    Per-output-channel symmetric scales (the ops/quant weight layout),
    stochastically rounded. Runs the Pallas kernel on TPU, a jax.random
    fallback elsewhere.
    """
    x = jnp.asarray(x, jnp.float32)
    try:
        on_tpu = jax.devices()[0].platform not in ("cpu",)
    except Exception:
        on_tpu = False
    if not on_tpu:
        return _sr_quant_fallback(x, seed)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = x.shape
    r_pad = _round_up(R, 8)
    c_pad = _round_up(C, BLOCK_C)
    xp = x
    if (r_pad, c_pad) != (R, C):
        xp = jnp.pad(x, ((0, r_pad - R), (0, c_pad - C)))

    q, s = pl.pallas_call(
        _sr_quant_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, c_pad), jnp.int8),
            jax.ShapeDtypeStruct((1, c_pad), jnp.float32),
        ),
        grid=(c_pad // BLOCK_C,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (r_pad, BLOCK_C), lambda j: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (r_pad, BLOCK_C), lambda j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BLOCK_C), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
        ),
    )(jnp.asarray([seed], jnp.int32), xp)
    return q[:R, :C], s[0, :C]


def quantize_linear_device(p, seed: int = 0):
    """Device-side {"w": ...} -> {"w_q", "w_s"} (stochastic rounding)."""
    q, s = stochastic_quantize_int8(p["w"], seed=seed)
    out = {k: v for k, v in p.items() if k != "w"}
    out["w_q"] = q
    out["w_s"] = s
    return out


def quantize_params_device(params, quantize_encoder: bool = True,
                           seed: int = 0):
    """On-device int8 weight quantization of a whole parameter tree.

    Same output layout as ops/quant.quantize_params(bits=8), but the
    float32 weights never leave the device and rounding is stochastic.
    Each weight gets a distinct derived seed.
    """
    import numpy as np

    counter = [0]

    def visit(tree):
        if isinstance(tree, dict):
            if "w" in tree and np.ndim(tree["w"]) == 2:
                counter[0] += 1
                return quantize_linear_device(tree, seed=seed + counter[0])
            return {k: visit(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [visit(v) for v in tree]
        return tree

    out = dict(params)
    out["decoder"] = {
        k: (visit(v) if k == "blocks" else v)
        for k, v in params["decoder"].items()
    }
    if quantize_encoder:
        out["encoder"] = {
            k: (visit(v) if k == "blocks" else v)
            for k, v in params["encoder"].items()
        }
    return out
