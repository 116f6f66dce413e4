"""Optimizer: per-tensor gradient clipping + AdamW, with frozen-encoder
partitioning.

Matches the reference regime (scripts/train_whisper_ipa.py:287-306): each
gradient tensor is independently clipped to L2 norm <= 1.0, then AdamW
(betas 0.9/0.999, eps 1e-8, weight_decay 0.01 — the MLX defaults) updates
only the decoder; the encoder is frozen via optax.set_to_zero masking, so
no optimizer state is allocated for it.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def clip_by_per_tensor_norm(max_norm: float = 1.0) -> optax.GradientTransformation:
    """Clip every gradient tensor independently to L2 norm <= max_norm.

    (The reference clips per tensor, not globally:
    scripts/train_whisper_ipa.py:287-303.)
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(g * g))
            coef = jnp.minimum(max_norm / (norm + 1e-6), 1.0)
            return g * coef

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def decoder_only_mask(params) -> Any:
    """Pytree of bools: True for decoder params (trainable)."""
    return {
        "encoder": jax.tree.map(lambda _: False, params["encoder"]),
        "decoder": jax.tree.map(lambda _: True, params["decoder"]),
    }


def make_schedule(
    learning_rate: float,
    warmup_steps: int = 0,
    decay: str = "constant",
    total_steps: int = 10000,
):
    """LR schedule: linear warmup + {constant, linear, cosine} decay."""
    if warmup_steps <= 0 and decay == "constant":
        return learning_rate
    if decay == "constant":
        after = optax.constant_schedule(learning_rate)
    elif decay == "linear":
        after = optax.linear_schedule(
            learning_rate, 0.0, max(total_steps - warmup_steps, 1)
        )
    elif decay == "cosine":
        after = optax.cosine_decay_schedule(
            learning_rate, max(total_steps - warmup_steps, 1)
        )
    else:
        raise ValueError(f"unknown decay: {decay!r}")
    if warmup_steps <= 0:
        return after
    warmup = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    return optax.join_schedules([warmup, after], [warmup_steps])


def make_optimizer(
    learning_rate: float = 1e-5,
    max_grad_norm: float = 1.0,
    weight_decay: float = 0.01,
    freeze_encoder: bool = True,
    schedule: Optional[Callable] = None,
    accum_steps: int = 1,
    mu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """Per-tensor clip + AdamW (+ optional gradient accumulation).

    accum_steps > 1 wraps the chain in optax.MultiSteps: gradients from N
    consecutive train_step calls are averaged before one AdamW update —
    large effective batches without the HBM for them.

    mu_dtype="bfloat16" halves the first-moment memory (the variance stays
    float32) — together with bf16 frozen-encoder storage this is what lets
    large-v3 decoder fine-tuning fit a single 16 GB chip.
    """
    lr = schedule if schedule is not None else learning_rate
    inner = optax.chain(
        clip_by_per_tensor_norm(max_grad_norm),
        optax.adamw(
            lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay,
            mu_dtype=mu_dtype,
        ),
    )
    if freeze_encoder:
        inner = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()},
            lambda params: jax.tree.map(
                lambda is_dec: "train" if is_dec else "freeze",
                decoder_only_mask(params),
            ),
        )
    if accum_steps > 1:
        inner = optax.MultiSteps(inner, every_k_schedule=accum_steps)
    return inner
