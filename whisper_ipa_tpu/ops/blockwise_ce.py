"""Blockwise (memory-efficient) cross-entropy over a large vocabulary.

The training loss materializes a (B, T, 51865) float32 logits tensor plus
its softmax — the largest activation in decoder-only fine-tuning. This
implementation streams the tied-embedding matmul over vocabulary blocks
with an online logsumexp (flash-softmax along the vocab axis) and a custom
VJP that recomputes blocks in the backward pass: peak memory drops from
O(N*V) to O(N*block + V_block*d), enabling bigger batches / longer
sequences for the same HBM.

Used by train/loss.py when blockwise=True (recommended for large models).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

VOCAB_BLOCK = 8192


def _num_blocks(V: int) -> int:
    return -(-V // VOCAB_BLOCK)


def _pad_vocab(emb):
    V = emb.shape[0]
    Vp = _num_blocks(V) * VOCAB_BLOCK
    if Vp != V:
        emb = jnp.pad(emb, ((0, Vp - V), (0, 0)))
    return emb, V, Vp


def _forward_stats(x, emb_padded, V: int):
    """Online logsumexp over vocab blocks. x: (N, d). Returns (m, lse)."""
    N = x.shape[0]
    nb = emb_padded.shape[0] // VOCAB_BLOCK
    emb_blocks = emb_padded.reshape(nb, VOCAB_BLOCK, -1)
    block_ids = jnp.arange(nb) * VOCAB_BLOCK

    def body(carry, inp):
        m, s = carry
        eb, start = inp
        logits = x @ eb.T  # (N, VOCAB_BLOCK) fp32
        col = start + jnp.arange(VOCAB_BLOCK)
        logits = jnp.where(col[None, :] < V, logits, -jnp.inf)
        bm = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, bm)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1
        )
        return (m_new, s), None

    init = (jnp.full((N,), -jnp.inf, jnp.float32), jnp.zeros((N,), jnp.float32))
    (m, s), _ = jax.lax.scan(body, init, (emb_blocks, block_ids))
    return m, jnp.log(s) + m  # (max, logsumexp)


@partial(jax.custom_vjp, nondiff_argnums=())
def blockwise_cross_entropy(x, emb, targets, mask):
    """Mean masked CE of logits = x @ emb.T without materializing them.

    x: (N, d) float32; emb: (V, d); targets: (N,) int32; mask: (N,) bool.
    """
    loss, _ = _ce_fwd(x, emb, targets, mask)
    return loss


def _ce_fwd(x, emb, targets, mask):
    x = x.astype(jnp.float32)
    embf = emb.astype(jnp.float32)
    emb_padded, V, _ = _pad_vocab(embf)
    _, lse = _forward_stats(x, emb_padded, V)
    target_logit = jnp.sum(x * embf[targets], axis=-1)
    per_token = (lse - target_logit) * mask.astype(jnp.float32)
    num_valid = jnp.maximum(mask.sum(), 1).astype(jnp.float32)
    loss = per_token.sum() / num_valid
    return loss, (x, embf, targets, mask, lse, num_valid)


def _ce_bwd(res, g):
    x, embf, targets, mask, lse, num_valid = res
    N, d = x.shape
    emb_padded, V, Vp = _pad_vocab(embf)
    nb = Vp // VOCAB_BLOCK
    emb_blocks = emb_padded.reshape(nb, VOCAB_BLOCK, d)
    block_ids = jnp.arange(nb) * VOCAB_BLOCK

    coeff = (g / num_valid) * mask.astype(jnp.float32)  # (N,)

    def body(dx, inp):
        eb, start = inp
        logits = x @ eb.T
        col = start + jnp.arange(VOCAB_BLOCK)
        valid = col[None, :] < V
        p = jnp.where(valid, jnp.exp(logits - lse[:, None]), 0.0)
        # softmax part of dlogits (onehot handled outside the scan)
        dl = p * coeff[:, None]
        dx = dx + dl @ eb  # (N, d)
        de_block = dl.T @ x  # (VOCAB_BLOCK, d)
        return dx, de_block

    dx, de_blocks = jax.lax.scan(
        body, jnp.zeros_like(x), (emb_blocks, block_ids)
    )
    demb = de_blocks.reshape(Vp, d)[:V]

    # onehot corrections: -coeff at the target rows
    dx = dx - coeff[:, None] * embf[targets]
    demb = demb.at[targets].add(-coeff[:, None] * x)

    return dx, demb.astype(embf.dtype), None, None


blockwise_cross_entropy.defvjp(_ce_fwd, _ce_bwd)
