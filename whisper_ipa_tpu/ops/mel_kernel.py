"""Pallas TPU kernel: fused STFT + mel filterbank + log compression.

One kernel fuses the whole spectral frontend per 128-frame block:

  frame extraction (overlapped strided reshape, no gather) ->
  windowed DFT as two MXU matmuls against precomputed (Hann-folded) bases ->
  power spectrum -> mel filterbank matmul -> log10 clamp

The global dynamic-range clamp (max - 8) and (x+4)/4 normalization need the
spectrogram-wide max, so they run as (fused) XLA ops on the kernel output.

Frame extraction trick: with hop 160 and window 400, frame i is the
concatenation of 160-sample rows [i, i+1, i+2[:80]] of the hop-strided
signal. Rather than materializing (frames, 400) windows, the windowed DFT
splits into three partial matmuls: frames @ Cos = r0 @ Cos[0:160] +
r1 @ Cos[160:320] + r2 @ Cos[320:400] (the third basis chunk zero-padded to
160 rows). The host passes three row-shifted views of the same hop-reshaped
signal; every kernel operand is tile-aligned and no in-kernel reshape or
gather is needed.

Numerical contract matches audio/mel.py (Whisper frontend); equivalence is
tested against the NumPy reference. Matmuls run at float32 MXU precision
(the power spectrum feeds a log10 over 8 decades).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import (
    HOP_LENGTH,
    N_FFT,
    _hann_periodic,
    mel_filters,
)

BLOCK_FRAMES = 128
_SPAN = (BLOCK_FRAMES + 2) * HOP_LENGTH  # 20800 samples per block
_N_BINS_PAD = 256  # 201 rfft bins padded to a lane-friendly size
_N_MELS_PAD = 128


@lru_cache(maxsize=4)
def _padded_operators(n_mels: int):
    """Hann-folded DFT basis chunks and mel matrix, zero-padded to tiles.

    Returns (cos_chunks, sin_chunks, mel): each chunk list has three
    (HOP, 256) bases covering window samples [0:160), [160:320), [320:400)
    (the last zero-padded from 80 to 160 rows).
    """
    k = np.arange(N_FFT // 2 + 1)[None, :]
    n = np.arange(N_FFT)[:, None]
    ang = -2.0 * np.pi * n * k / N_FFT
    win = _hann_periodic()[:, None]
    cos_b = np.zeros((N_FFT, _N_BINS_PAD), np.float32)
    sin_b = np.zeros((N_FFT, _N_BINS_PAD), np.float32)
    cos_b[:, : k.shape[1]] = np.cos(ang) * win
    sin_b[:, : k.shape[1]] = np.sin(ang) * win

    def chunks(basis):
        out = []
        for start in range(0, N_FFT, HOP_LENGTH):
            chunk = np.zeros((HOP_LENGTH, _N_BINS_PAD), np.float32)
            rows = basis[start : start + HOP_LENGTH]
            chunk[: rows.shape[0]] = rows
            out.append(chunk)
        return out

    mel = np.zeros((_N_BINS_PAD, _N_MELS_PAD), np.float32)
    fb = mel_filters(n_mels)  # (n_mels, 201)
    mel[: fb.shape[1], : n_mels] = fb.T
    return chunks(cos_b), chunks(sin_b), mel


def _mel_block_kernel(
    r0_ref, r1_ref, r2_ref,
    c0_ref, c1_ref, c2_ref,
    s0_ref, s1_ref, s2_ref,
    melm_ref, out_ref,
):
    # HIGHEST precision: full-f32 MXU passes — the power spectrum feeds a
    # log10 spanning 8 decades and bf16 passes cost ~2e-2 absolute error.
    hi = jax.lax.Precision.HIGHEST

    def dft(b0, b1, b2):
        return (
            jnp.dot(r0_ref[0], b0[:], preferred_element_type=jnp.float32,
                    precision=hi)
            + jnp.dot(r1_ref[0], b1[:], preferred_element_type=jnp.float32,
                      precision=hi)
            + jnp.dot(r2_ref[0], b2[:], preferred_element_type=jnp.float32,
                      precision=hi)
        )

    re = dft(c0_ref, c1_ref, c2_ref)  # (128, 256)
    im = dft(s0_ref, s1_ref, s2_ref)
    power = re * re + im * im  # padded bins are exactly zero

    mel = jnp.dot(
        power, melm_ref[:], preferred_element_type=jnp.float32, precision=hi
    )
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


def log_mel_spectrogram_pallas(
    audio, n_mels: int = 80, interpret: bool = False
):
    """(B, n_samples) float32 -> (B, n_frames, n_mels) log-mel.

    interpret=True runs the kernel in the Pallas interpreter (CPU tests).
    On a CPU backend the interpreter is forced automatically (Mosaic
    kernels need an accelerator) so synthetic-data bench/CLI paths run
    off-TPU without per-callsite fallbacks — slow, but correct (the
    interpreter path is what the parity tests assert against NumPy).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not interpret:
        try:
            interpret = jax.devices()[0].platform == "cpu"
        except Exception:
            interpret = True

    audio = jnp.asarray(audio, jnp.float32)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    B, n_samples = audio.shape

    n_frames = n_samples // HOP_LENGTH  # final frame dropped, per Whisper
    n_blocks = -(-n_frames // BLOCK_FRAMES)

    pad = N_FFT // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    need = (n_blocks - 1) * (BLOCK_FRAMES * HOP_LENGTH) + _SPAN
    if padded.shape[1] < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
    padded = padded[:, :need]

    # hop-strided rows + the three shifted views (see module docstring)
    n_rows = need // HOP_LENGTH  # n_blocks*128 + 2
    rows = padded.reshape(B, n_rows, HOP_LENGTH)
    nb128 = n_blocks * BLOCK_FRAMES
    r0 = rows[:, 0:nb128]
    r1 = rows[:, 1 : nb128 + 1]
    r2 = rows[:, 2 : nb128 + 2]

    cos_chunks, sin_chunks, melm = _padded_operators(n_mels)

    out = pl.pallas_call(
        _mel_block_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_blocks * BLOCK_FRAMES, _N_MELS_PAD), jnp.float32
        ),
        grid=(B, n_blocks),
        in_specs=[
            *[
                pl.BlockSpec(
                    (1, BLOCK_FRAMES, HOP_LENGTH),
                    lambda b, f: (b, f, 0),
                    memory_space=pltpu.VMEM,
                )
                for _ in range(3)
            ],
            *[
                pl.BlockSpec(
                    (HOP_LENGTH, _N_BINS_PAD),
                    lambda b, f: (0, 0),
                    memory_space=pltpu.VMEM,
                )
                for _ in range(6)
            ],
            pl.BlockSpec(
                (_N_BINS_PAD, _N_MELS_PAD),
                lambda b, f: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_FRAMES, _N_MELS_PAD),
            lambda b, f: (b, f, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(
        r0, r1, r2,
        *[jnp.asarray(c) for c in cos_chunks],
        *[jnp.asarray(c) for c in sin_chunks],
        jnp.asarray(melm),
    )

    log_spec = out[:, :n_frames, :n_mels]
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    if squeeze:
        log_spec = log_spec[0]
    return log_spec
