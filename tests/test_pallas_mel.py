"""Pallas fused log-mel kernel: numerical equivalence vs NumPy reference.

Runs in interpreter mode on the CPU test host; the same kernel compiles
for TPU (exercised by bench/TPU runs).
"""

import numpy as np
import pytest

from whisper_ipa_tpu.audio import (
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    pad_or_trim,
)
from whisper_ipa_tpu.ops import log_mel_spectrogram_pallas


def sine(seconds=3.0, freq=330.0):
    t = np.arange(int(seconds * SAMPLE_RATE)) / SAMPLE_RATE
    return (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_matches_numpy_reference(n_mels):
    rng = np.random.default_rng(0)
    audio = pad_or_trim(
        sine() + 0.05 * rng.standard_normal(3 * SAMPLE_RATE).astype(np.float32)
    )
    ref = log_mel_spectrogram(audio, n_mels=n_mels)
    out = np.asarray(
        log_mel_spectrogram_pallas(audio, n_mels=n_mels, interpret=True)
    )
    assert out.shape == (N_FRAMES, n_mels)
    assert np.max(np.abs(out - ref)) < 5e-4


def test_batched():
    rng = np.random.default_rng(1)
    batch = rng.standard_normal((2, N_SAMPLES)).astype(np.float32) * 0.1
    out = np.asarray(log_mel_spectrogram_pallas(batch, interpret=True))
    assert out.shape == (2, N_FRAMES, 80)
    ref0 = log_mel_spectrogram(batch[0])
    assert np.max(np.abs(out[0] - ref0)) < 5e-4
