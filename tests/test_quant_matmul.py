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
