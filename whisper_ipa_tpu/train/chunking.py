"""Shared helpers for chunked dispatch (C optimizer steps per device call).

Used by train/loop.py, cli/train_medusa.py and cli/distill_draft.py so the
chunk-sizing and batch-stacking rules stay in one place.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def pow2_floor(n: int) -> int:
    """Largest power of two <= n (n >= 1) — chunk sizes are restricted to
    powers of two so jit compiles O(log C) programs, not one per residue."""
    n = max(1, n)
    while n & (n - 1):
        n &= n - 1
    return n


def stack_pad_batches(
    batches: Sequence[Dict],
    eot: int,
    bf16_mels: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack C loader batches into (C, B, ...) mel/token arrays.

    Bucketed token widths may differ across the chunk; right-pad with EOT
    to the chunk max — loss-exact (eot_loss_mask keeps only the first EOT
    and pad positions are causal-masked). bf16_mels casts the mel stack
    to bfloat16 on host (entry-cast-exact under bf16 compute: encode and
    decoder_hidden both .astype(dtype) their inputs) to halve the upload.
    """
    tw = max(b["tokens"].shape[1] for b in batches)
    toks: List[np.ndarray] = []
    for b in batches:
        t = np.asarray(b["tokens"])
        if t.shape[1] < tw:
            pad = np.full((t.shape[0], tw - t.shape[1]), eot, dtype=t.dtype)
            t = np.concatenate([t, pad], axis=1)
        toks.append(t)
    mels = np.stack([np.asarray(b["mel_features"]) for b in batches])
    if bf16_mels:
        import ml_dtypes

        mels = mels.astype(ml_dtypes.bfloat16)
    return mels, np.stack(toks)
