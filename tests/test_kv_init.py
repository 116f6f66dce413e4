"""Fused cross-KV init kernel (ops/kv_init.py): parity vs the unfused
linear() + _quantize_kv_heads composition, padding contract, and the
init_cache wiring flag."""

from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_ipa_tpu.models.layers import linear
from whisper_ipa_tpu.models.whisper import (
    _quantize_kv_heads,
    init_cache,
    init_params,
    use_fused_kv_init,
)
from whisper_ipa_tpu.ops.kv_init import fused_kv_init_int8


def _make_inputs(B=2, T=150, d=64, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((B, T, d)) * 0.5).astype(np.float32)
    wk = (rng.standard_normal((d, d)) * 0.1).astype(np.float32)
    wv = (rng.standard_normal((d, d)) * 0.1).astype(np.float32)
    bv = (rng.standard_normal((d,)) * 0.1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(wk), jnp.asarray(wv), jnp.asarray(bv)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_parity_vs_unfused(dtype):
    H = 2
    x, wk, wv, bv = _make_inputs()
    xd = x.astype(dtype)

    k_ref = linear(xd, {"w": wk})
    kq_ref, ks_ref = _quantize_kv_heads(k_ref, H)
    v_ref = linear(xd, {"w": wv, "b": bv})
    vq_ref, vs_ref = _quantize_kv_heads(v_ref, H)

    kq, ks, vq, vs = fused_kv_init_int8(
        x, wk, None, wv, bv, H, out_dtype=dtype, interpret=True
    )

    assert kq.shape == kq_ref.shape and ks.shape == ks_ref.shape
    np.testing.assert_allclose(
        np.asarray(ks), np.asarray(ks_ref), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(vs), np.asarray(vs_ref), rtol=1e-6, atol=1e-9
    )
    # codes may differ by 1 on exact rounding ties; require near-total
    # agreement
    for got, ref in ((kq, kq_ref), (vq, vq_ref)):
        diff = np.abs(
            np.asarray(got, np.int32) - np.asarray(ref, np.int32)
        )
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.999


def test_padding_contract():
    """Positions >= T carry scale 0 (the downstream attention mask) and
    code 0; T_pad is the 128-lane round-up."""
    H = 2
    x, wk, wv, bv = _make_inputs(T=150)
    kq, ks, vq, vs = fused_kv_init_int8(
        x, wk, None, wv, bv, H, out_dtype=jnp.float32, interpret=True
    )
    assert kq.shape[-1] == 256  # 150 -> 256
    for arr in (ks, vs):
        tail = np.asarray(arr)[..., 150:]
        assert (tail == 0.0).all()
        head = np.asarray(arr)[..., :150]
        assert (head > 0.0).all()
    for arr in (kq, vq):
        assert (np.asarray(arr)[..., 150:] == 0).all()


def test_init_cache_flag_wires_fused_path():
    """init_cache with the fused flag produces the same cache pytree as
    the XLA path (and decode consumes it identically by construction:
    same shapes, same scale-0 mask contract)."""
    from whisper_ipa_tpu.config import CONFIGS

    cfg = replace(CONFIGS["test-tiny"], n_audio_ctx=16, n_text_ctx=16)
    params = init_params(cfg, seed=0)
    feats = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (2, cfg.n_audio_ctx, cfg.n_text_state)
        ).astype(np.float32)
        * 0.3
    )
    try:
        use_fused_kv_init(False)
        ref = init_cache(params, cfg, feats, max_len=8, cross_kv_int8=True)
        use_fused_kv_init(True)
        got = init_cache(params, cfg, feats, max_len=8, cross_kv_int8=True)
    finally:
        use_fused_kv_init(False)

    assert got.cross_k.shape == ref.cross_k.shape
    assert got.cross_k_scale.shape == ref.cross_k_scale.shape
    np.testing.assert_allclose(
        np.asarray(got.cross_k_scale),
        np.asarray(ref.cross_k_scale),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got.cross_v_scale),
        np.asarray(ref.cross_v_scale),
        rtol=1e-6,
    )
    for got_c, ref_c in (
        (got.cross_k, ref.cross_k),
        (got.cross_v, ref.cross_v),
    ):
        diff = np.abs(
            np.asarray(got_c, np.int32) - np.asarray(ref_c, np.int32)
        )
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.999
