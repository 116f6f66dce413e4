from .mel_kernel import log_mel_spectrogram_pallas

__all__ = ["log_mel_spectrogram_pallas"]
