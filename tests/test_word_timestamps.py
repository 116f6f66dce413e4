"""Phone-timestamp alignment tests (DTW, median filter, end-to-end)."""

from dataclasses import replace

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_ipa_tpu.config import CONFIGS
from whisper_ipa_tpu.decode.word_timestamps import (
    dtw_path,
    median_filter,
    phone_timestamps,
    token_alignment,
)
from whisper_ipa_tpu.models import init_params
from whisper_ipa_tpu.tokenizer import get_tokenizer

CFG = replace(CONFIGS["test-tiny"], n_audio_ctx=32, n_text_ctx=48)


class TestDTW:
    def test_diagonal_preference(self):
        # identity-like cost: path should be near-diagonal
        n = 6
        cost = np.ones((n, n))
        np.fill_diagonal(cost, 0.0)
        ti, fi = dtw_path(cost)
        assert ti[0] == 0 and fi[0] == 0
        assert ti[-1] == n - 1 and fi[-1] == n - 1
        # monotonic
        assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()

    def test_monotonic_on_random(self):
        rng = np.random.default_rng(0)
        cost = rng.uniform(size=(5, 40))
        ti, fi = dtw_path(cost)
        assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
        assert ti[-1] == 4 and fi[-1] == 39

    def test_median_filter(self):
        x = np.array([[0.0, 10.0, 0.0, 0.0, 0.0]])
        out = median_filter(x, 3)
        assert out[0, 1] == 0.0  # spike removed
        assert out.shape == x.shape


class TestPhoneTimestamps:
    @pytest.fixture(scope="class")
    def setup(self):
        params = init_params(CFG, seed=0)
        tok = get_tokenizer(multilingual=True, language="en")
        rng = np.random.default_rng(0)
        mel = jnp.asarray(
            rng.standard_normal((1, CFG.n_audio_ctx * 2, CFG.n_mels)).astype(
                np.float32
            )
        )
        return params, tok, mel

    def test_token_alignment_shapes(self, setup):
        params, tok, mel = setup
        from whisper_ipa_tpu.models.whisper import encode

        feats = encode(params, CFG, mel)
        tokens = tok.encode("kæt")
        bounds = token_alignment(params, CFG, tokens, feats, tok)
        assert bounds.shape == (len(tokens), 2)
        assert (bounds[:, 1] >= bounds[:, 0]).all()
        # monotone non-decreasing starts
        assert (np.diff(bounds[:, 0]) >= -1e-9).all()

    def test_phone_timestamps_end_to_end(self, setup):
        params, tok, mel = setup
        tokens = tok.encode("kæt siː")
        out = phone_timestamps(params, CFG, tokens, mel, tokenizer=tok)
        phones = [p["phone"] for p in out]
        assert phones == ["k", "æ", "t", "s", "iː"]
        for p in out:
            assert 0.0 <= p["start"] <= p["end"]
