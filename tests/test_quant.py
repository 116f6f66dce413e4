"""Weight-only int8 quantization tests."""

from dataclasses import replace

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_ipa_tpu.config import CONFIGS
from whisper_ipa_tpu.decode import DecodingOptions, decode
from whisper_ipa_tpu.models import init_params
from whisper_ipa_tpu.models.layers import linear
from whisper_ipa_tpu.models.whisper import decoder_logits, encode
from whisper_ipa_tpu.ops.quant import (
    quantize_linear,
    quantize_params,
    quantized_bytes,
)
from whisper_ipa_tpu.tokenizer import get_tokenizer

CFG = replace(CONFIGS["test-tiny"], n_audio_ctx=32, n_text_ctx=32)


class TestQuantizeLinear:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((64, 128)).astype(np.float32)
        p = {"w": w, "b": np.zeros(128, np.float32)}
        q = quantize_linear(p)
        assert q["w_q"].dtype == jnp.int8
        deq = np.asarray(q["w_q"], np.float32) * np.asarray(q["w_s"])
        # per-channel symmetric int8: max error is s/2 = max|w|/254
        max_err = np.abs(deq - w).max(axis=0)
        bound = np.abs(w).max(axis=0) / 127.0
        assert (max_err <= bound * 0.5 + 1e-7).all()

    def test_linear_apply_matches(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((32, 48)).astype(np.float32)
        x = rng.standard_normal((4, 32)).astype(np.float32)
        p = {"w": jnp.asarray(w), "b": jnp.zeros(48)}
        q = quantize_linear(p)
        y_full = np.asarray(linear(jnp.asarray(x), p))
        y_quant = np.asarray(linear(jnp.asarray(x), q))
        rel = np.abs(y_quant - y_full).max() / (np.abs(y_full).max() + 1e-9)
        assert rel < 0.02

    def test_zero_column_safe(self):
        p = {"w": np.zeros((8, 4), np.float32)}
        q = quantize_linear(p)
        assert np.isfinite(np.asarray(q["w_s"])).all()


class TestQuantizedModel:
    @pytest.fixture(scope="class")
    def params(self):
        return init_params(CFG, seed=0)

    @pytest.fixture(scope="class")
    def qparams(self, params):
        return quantize_params(params)

    def test_size_reduction(self, params, qparams):
        # compare the transformer blocks (the toy config's embedding table
        # dwarfs its 2 layers; real models are block-dominated)
        full = quantized_bytes(params["decoder"]["blocks"])
        quant = quantized_bytes(qparams["decoder"]["blocks"])
        assert quant < full * 0.35  # int8 + scales vs float32

    def test_forward_close(self, params, qparams):
        rng = np.random.default_rng(0)
        mel = jnp.asarray(
            rng.standard_normal((1, CFG.n_audio_ctx * 2, CFG.n_mels)).astype(
                np.float32
            )
        )
        tokens = jnp.asarray([[50258, 50259, 50359, 50363]])
        feats_f = encode(params, CFG, mel)
        feats_q = encode(qparams, CFG, mel)
        lf = np.asarray(decoder_logits(params, CFG, tokens, feats_f))
        lq = np.asarray(decoder_logits(qparams, CFG, tokens, feats_q))
        rel = np.abs(lq - lf).max() / (np.abs(lf).max() + 1e-9)
        assert rel < 0.1

    def test_quantized_decode_runs(self, qparams):
        tok = get_tokenizer(multilingual=True, language="en")
        rng = np.random.default_rng(0)
        mel = jnp.asarray(
            rng.standard_normal((1, CFG.n_audio_ctx * 2, CFG.n_mels)).astype(
                np.float32
            )
        )
        results = decode(
            qparams,
            CFG,
            mel,
            DecodingOptions(
                language="en", without_timestamps=True, sample_len=4
            ),
            tokenizer=tok,
        )
        assert len(results) == 1
        assert np.isfinite(results[0].avg_logprob)
