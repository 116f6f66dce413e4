"""int8 x int8 Pallas matmul: accuracy vs the float reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_ipa_tpu.ops.quant import quantize_linear
from whisper_ipa_tpu.ops.quant_matmul import int8_matmul


@pytest.mark.parametrize("m,k,n", [(4, 64, 48), (130, 768, 320), (1, 64, 257)])
def test_accuracy(m, k, n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((m, k)).astype(np.float32) * 0.5
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    q = quantize_linear({"w": w})
    out = np.asarray(
        int8_matmul(
            jnp.asarray(x), q["w_q"], q["w_s"], interpret=True
        )
    )
    ref = x @ w
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert out.shape == ref.shape
    assert rel < 0.03, rel


def test_batched_leading_dims():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 32)).astype(np.float32)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    q = quantize_linear({"w": w})
    out = np.asarray(
        int8_matmul(jnp.asarray(x), q["w_q"], q["w_s"], interpret=True)
    )
    assert out.shape == (2, 3, 16)
    rel = np.abs(out - x @ w).max() / (np.abs(x @ w).max() + 1e-9)
    assert rel < 0.05


def test_int4_matmul_matches_xla_plane_path():
    """Fused int4 weight matmul (in-VMEM nibble dequant) == the XLA
    half-weight path in models/layers.linear, bit-for-bit math."""
    import jax.numpy as jnp

    from whisper_ipa_tpu.models.layers import _int4_halves
    from whisper_ipa_tpu.ops.quant import quantize_linear_int4
    from whisper_ipa_tpu.ops.quant_matmul import int4_matmul

    rng = np.random.default_rng(3)
    K, N, M = 256, 384, 16  # N % BLOCK_N4 != 0: exercises the pad path
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    q = quantize_linear_int4({"w": w})
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    got = int4_matmul(x, q["w_q4"], q["w_s4"], interpret=True)
    lo, hi = _int4_halves(q["w_q4"], q["w_s4"], jnp.float32)
    want = x[:, 0::2] @ lo + x[:, 1::2] @ hi
    assert got.shape == (M, N)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-3


def test_int4_matmul_batched_leading_dims():
    import jax.numpy as jnp

    from whisper_ipa_tpu.ops.quant import quantize_linear_int4
    from whisper_ipa_tpu.ops.quant_matmul import int4_matmul

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 128)).astype(np.float32)
    w = rng.standard_normal((128, 64)).astype(np.float32)
    q = quantize_linear_int4({"w": w})
    out = np.asarray(
        int4_matmul(jnp.asarray(x), q["w_q4"], q["w_s4"], interpret=True)
    )
    assert out.shape == (2, 3, 64)
    rel = np.abs(out - x @ w).max() / (np.abs(x @ w).max() + 1e-9)
    assert rel < 0.1  # int4 quantization noise only
