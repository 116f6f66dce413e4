"""Batched beam-search decoding under a single jitted while_loop.

Standard batched beam search with in-graph KV-cache reordering (gather over
the beam axis each step) — the TPU-friendly formulation of the reference's
beam decoder (mlx_whisper BeamSearchDecoder). Finished beams are frozen
(forced-EOT continuations at zero cost) rather than moved to a side pool;
final ranking uses the same GNMT length penalty as the reference
(length_penalty option, reference scripts/train_whisper_ipa.py:342).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..models.whisper import DecoderCache, decode_step, init_cache
from .decoding import (
    DecodingOptions,
    DecodingResult,
    compression_ratio,
    sequence_score,
)


@partial(
    jax.jit,
    static_argnames=("cfg", "n_prefix", "sample_len", "beam_size"),
)
def _beam_decode_jit(
    params,
    cfg: WhisperConfig,
    audio_features,  # (B, 1500, d)
    prefix_tokens,  # (B, n_prefix)
    suppress_mask,
    blank_mask,
    eot: int,
    n_prefix: int,
    sample_len: int,
    beam_size: int,
):
    B = audio_features.shape[0]
    K = beam_size
    max_len = n_prefix + sample_len

    # prefix pass at batch B, then tile cache across beams -> batch B*K
    cache = init_cache(params, cfg, audio_features, max_len=max_len)
    prefix_logits, cache = decode_step(params, cfg, prefix_tokens, cache, 0)

    def tile_beams(x):  # (L, B, ...) -> (L, B*K, ...)
        reps = (1, K) + (1,) * (x.ndim - 2)
        return jnp.repeat(x, K, axis=1)

    cache = DecoderCache(*[tile_beams(x) for x in cache])

    # first expansion: top-K tokens from the prefix logits
    logits0 = prefix_logits[:, -1] + suppress_mask + blank_mask  # (B, V)
    logprobs0 = jax.nn.log_softmax(logits0, axis=-1)
    top_lp, top_tok = jax.lax.top_k(logprobs0, K)  # (B, K)

    tokens_buf = jnp.full((B, K, max_len), eot, jnp.int32)
    tokens_buf = jax.lax.dynamic_update_slice(
        tokens_buf,
        jnp.tile(prefix_tokens[:, None, :], (1, K, 1)).astype(jnp.int32),
        (0, 0, 0),
    )
    tokens_buf = jax.lax.dynamic_update_slice(
        tokens_buf, top_tok[:, :, None].astype(jnp.int32), (0, 0, n_prefix)
    )
    sum_logprobs = top_lp  # (B, K)
    finished = top_tok == eot
    lengths = jnp.ones((B, K), jnp.int32)  # tokens emitted per beam

    flat_tok = top_tok.reshape(B * K, 1).astype(jnp.int32)
    logits, cache = decode_step(params, cfg, flat_tok, cache, n_prefix)
    logits = logits[:, 0].reshape(B, K, -1)

    V = cfg.n_vocab
    neg_inf = jnp.float32(-jnp.inf)

    def body(state):
        step, tokens_buf, cache, logits, finished, sum_logprobs, lengths = state
        lp = jax.nn.log_softmax(logits + suppress_mask, axis=-1)  # (B,K,V)

        # finished beams: only EOT continuation, at zero added cost
        eot_onehot = jnp.where(
            jnp.arange(V)[None, None, :] == eot, 0.0, neg_inf
        )
        lp = jnp.where(finished[:, :, None], eot_onehot, lp)

        # two-stage top-k: per-beam top-K over the vocab first (the only
        # candidates that can survive), then top-K over the K*K pool —
        # avoids sorting a K*V=260k-wide tensor every step
        cand_lp, cand_tok = jax.lax.top_k(lp, K)  # (B, K, K)
        scores = sum_logprobs[:, :, None] + cand_lp
        flat = scores.reshape(B, K * K)
        top_scores, top_idx = jax.lax.top_k(flat, K)  # (B, K)
        beam_idx = top_idx // K  # (B, K)
        tok_idx = jnp.take_along_axis(
            cand_tok.reshape(B, K * K), top_idx, axis=1
        ).astype(jnp.int32)

        # beam reordering as one-hot matmuls: XLA gathers with 5-D operands
        # compile pathologically slowly on TPU; a (B, Knew, Kold) selection
        # matrix turns every reorder into a plain dot. K*K is tiny and
        # float32 einsum is exact for token ids (< 2^24).
        onehot = jax.nn.one_hot(beam_idx, K, dtype=jnp.float32)  # (B,Kn,Ko)

        tokens_buf = (
            jnp.einsum(
                "bjk,bkl->bjl", onehot, tokens_buf.astype(jnp.float32)
            )
            .astype(jnp.int32)
        )
        finished = (
            jnp.einsum("bjk,bk->bj", onehot, finished.astype(jnp.float32))
            > 0.5
        )
        lengths = jnp.einsum(
            "bjk,bk->bj", onehot, lengths.astype(jnp.float32)
        ).astype(jnp.int32)

        def gather_cache(x):  # (L, B*K, ...) -> reorder beams
            L = x.shape[0]
            xs = x.reshape((L, B, K) + x.shape[2:])
            xs = jnp.einsum(
                "bjk,lbkcd->lbjcd", onehot.astype(x.dtype), xs
            )
            return xs.reshape(x.shape)

        cache = DecoderCache(*[gather_cache(x) for x in cache])

        sum_logprobs = top_scores
        pos = n_prefix + step + 1
        tokens_buf = jax.lax.dynamic_update_slice(
            tokens_buf, tok_idx[:, :, None], (0, 0, pos)
        )
        lengths = lengths + jnp.where(finished, 0, 1)
        finished = finished | (tok_idx == eot)

        flat_tok = tok_idx.reshape(B * K, 1)
        new_logits, cache = decode_step(params, cfg, flat_tok, cache, pos)
        new_logits = new_logits[:, 0].reshape(B, K, V)
        return (
            step + 1,
            tokens_buf,
            cache,
            new_logits,
            finished,
            sum_logprobs,
            lengths,
        )

    def cond(state):
        step, _, _, _, finished, _, _ = state
        return (step < sample_len - 1) & ~jnp.all(finished)

    state = (
        jnp.array(0, jnp.int32),
        tokens_buf,
        cache,
        logits,
        finished,
        sum_logprobs,
        lengths,
    )
    _, tokens_buf, _, _, finished, sum_logprobs, lengths = jax.lax.while_loop(
        cond, body, state
    )
    return tokens_buf, sum_logprobs, lengths


def beam_decode(
    params,
    cfg: WhisperConfig,
    audio_features,
    prefix: List[int],
    options: DecodingOptions,
    tokenizer,
    suppress_mask,
    blank_mask,
    prefix_tokens=None,
) -> List[DecodingResult]:
    B = audio_features.shape[0]
    n_prefix = len(prefix)
    sample_len = options.sample_len or (cfg.n_text_ctx // 2)
    sample_len = min(sample_len, cfg.n_text_ctx - n_prefix)
    if prefix_tokens is None:
        prefix_tokens = jnp.tile(
            jnp.asarray(prefix, jnp.int32)[None, :], (B, 1)
        )

    blank = (
        blank_mask
        if options.suppress_blank
        else jnp.zeros_like(suppress_mask)
    )
    tokens_buf, sum_logprobs, lengths = _beam_decode_jit(
        params,
        cfg,
        audio_features,
        prefix_tokens,
        suppress_mask,
        blank,
        tokenizer.eot,
        n_prefix,
        int(sample_len),
        int(options.beam_size),
    )

    tokens_np = np.asarray(tokens_buf)
    lp_np = np.asarray(sum_logprobs)
    results = []
    for b in range(B):
        best_score = -np.inf
        best = None
        for k in range(options.beam_size):
            seq = tokens_np[b, k, n_prefix:]
            eot_pos = np.nonzero(seq == tokenizer.eot)[0]
            end = int(eot_pos[0]) if len(eot_pos) else len(seq)
            score = sequence_score(
                float(lp_np[b, k]), end, options.length_penalty
            )
            if score > best_score:
                best_score = score
                best = (seq[:end].tolist(), float(lp_np[b, k]), end)
        out_tokens, total_lp, length = best
        text = tokenizer.decode_text(out_tokens).strip()
        results.append(
            DecodingResult(
                tokens=out_tokens,
                text=text,
                avg_logprob=total_lp / (length + 1),
                no_speech_prob=0.0,
                temperature=options.temperature,
                compression_ratio=compression_ratio(text),
                language=options.language or tokenizer.language,
            )
        )
    return results
