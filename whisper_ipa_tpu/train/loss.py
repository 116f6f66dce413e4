"""Teacher-forced cross-entropy with the first-EOT-kept mask.

The subtlety (reference scripts/train_whisper_ipa.py:238-247): padding uses
the EOT token, so the loss must keep exactly the FIRST EOT of each target
row (the model must learn to stop) while masking the rest. A cumulative sum
over the EOT indicator implements "is the first EOT" as cumsum == 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..models.whisper import decoder_logits, encode


def eot_loss_mask(target_tokens, eot: int):
    """True where loss is computed: non-EOT tokens plus the first EOT."""
    is_eot = target_tokens == eot
    eot_cumsum = jnp.cumsum(is_eot.astype(jnp.int32), axis=1)
    return (~is_eot) | (eot_cumsum == 1)


def masked_cross_entropy(logits, targets, mask):
    """Mean CE over masked positions. logits float32 (B, T, V)."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    token_lp = jnp.take_along_axis(
        logprobs, targets[..., None], axis=-1
    )[..., 0]
    losses = -token_lp * mask.astype(logits.dtype)
    num_valid = jnp.maximum(mask.sum(), 1)
    return losses.sum() / num_valid


def compute_loss(
    params,
    cfg: WhisperConfig,
    mel,
    tokens,
    eot: int,
    *,
    audio_features=None,
    freeze_encoder: bool = True,
    dtype=jnp.float32,
    remat: bool = False,
    blockwise: bool = False,
    bf16_head: bool = False,
):
    """CE loss for a batch (reference compute_loss surface).

    mel: (B, 3000, n_mels); tokens: (B, S) with SOT sequence + IPA + EOT
    padding. When freeze_encoder (the reference's decoder-only regime), the
    encoder runs under stop_gradient so no encoder grads are materialized.
    """
    if audio_features is None:
        audio_features = encode(
            params, cfg, mel, dtype=dtype,
            remat=remat and not freeze_encoder,
        )
        if freeze_encoder:
            audio_features = jax.lax.stop_gradient(audio_features)

    decoder_input = tokens[:, :-1]
    target_tokens = tokens[:, 1:]
    mask = eot_loss_mask(target_tokens, eot)

    if blockwise:
        # memory-efficient path: never materializes (B, T, V) logits
        from ..models.whisper import decoder_hidden
        from ..ops.blockwise_ce import blockwise_cross_entropy

        hidden = decoder_hidden(
            params, cfg, decoder_input, audio_features, dtype=dtype,
            remat=remat,
        )
        B, T, d = hidden.shape
        return blockwise_cross_entropy(
            hidden.astype(jnp.float32).reshape(B * T, d),
            params["decoder"]["token_embedding"],
            target_tokens.reshape(B * T),
            mask.reshape(B * T),
        )

    logits = decoder_logits(
        params, cfg, decoder_input, audio_features, dtype=dtype,
        remat=remat, bf16_head=bf16_head,
    )
    return masked_cross_entropy(logits, target_tokens, mask)
