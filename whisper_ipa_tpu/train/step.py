"""TrainState and the jitted training step.

One XLA program per step: encoder forward (stop-gradient), decoder forward +
backward, per-tensor clip, AdamW update — with buffer donation so parameters
and optimizer state update in place on device. Data-parallel execution comes
from sharding the batch over the mesh 'data' axis (see parallel/); XLA
inserts the gradient all-reduce automatically because parameters are
replicated.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import WhisperConfig
from .loss import compute_loss
from .optimizer import make_optimizer


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(
    params,
    learning_rate: float = 1e-5,
    max_grad_norm: float = 1.0,
    freeze_encoder: bool = True,
    schedule=None,
    accum_steps: int = 1,
    mu_dtype=None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(
        learning_rate=learning_rate,
        max_grad_norm=max_grad_norm,
        freeze_encoder=freeze_encoder,
        schedule=schedule,
        accum_steps=accum_steps,
        mu_dtype=mu_dtype,
    )
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        ),
        tx,
    )


def _apply_update(
    state: TrainState,
    mel,
    tokens,
    cfg: WhisperConfig,
    tx: optax.GradientTransformation,
    eot: int,
    freeze_encoder: bool,
    dtype_name: str,
    remat: bool,
    blockwise: bool,
    inputs_are_features: bool,
    bf16_head: bool,
) -> Tuple[TrainState, jax.Array]:
    """Traced body shared by train_step (one dispatch per step) and
    train_chunk (one dispatch per C steps)."""

    def loss_fn(params):
        return compute_loss(
            params,
            cfg,
            mel if not inputs_are_features else None,
            tokens,
            eot,
            audio_features=mel if inputs_are_features else None,
            freeze_encoder=freeze_encoder,
            dtype=jnp.dtype(dtype_name),
            remat=remat,
            blockwise=blockwise,
            bf16_head=bf16_head,
        )

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        ),
        loss,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "tx", "eot", "freeze_encoder", "dtype_name", "remat",
        "blockwise", "inputs_are_features", "bf16_head",
    ),
    donate_argnames=("state",),
)
def train_step(
    state: TrainState,
    mel,
    tokens,
    cfg: WhisperConfig,
    tx: optax.GradientTransformation,
    eot: int,
    freeze_encoder: bool = True,
    dtype_name: str = "float32",
    remat: bool = False,
    blockwise: bool = False,
    inputs_are_features: bool = False,
    bf16_head: bool = False,
) -> Tuple[TrainState, jax.Array]:
    """One optimization step. Returns (new_state, loss).

    dtype_name: activation compute dtype — "float32" for the reference's
    numerical regime, "bfloat16" for ~2x MXU throughput (params, optimizer
    state, and the loss/logit head stay float32 either way;
    bf16_head=True opts the logits GEMM's multiplicands into bfloat16
    with float32 accumulation — see models.whisper.decoder_logits).

    inputs_are_features: ``mel`` already holds precomputed encoder outputs
    (B, n_audio_ctx, d) — the frozen encoder's activations are constant per
    sample, so caching them removes ~2/3 of the step's FLOPs (the encoder
    forward). See train(cache_encoder=True).
    """
    return _apply_update(
        state, mel, tokens, cfg, tx, eot, freeze_encoder, dtype_name,
        remat, blockwise, inputs_are_features, bf16_head,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "tx", "eot", "freeze_encoder", "dtype_name", "remat",
        "blockwise", "inputs_are_features", "bf16_head",
    ),
    donate_argnames=("state",),
)
def train_chunk(
    state: TrainState,
    mels,
    tokens,
    cfg: WhisperConfig,
    tx: optax.GradientTransformation,
    eot: int,
    freeze_encoder: bool = True,
    dtype_name: str = "float32",
    remat: bool = False,
    blockwise: bool = False,
    inputs_are_features: bool = False,
    bf16_head: bool = False,
) -> Tuple[TrainState, jax.Array]:
    """C optimization steps in ONE dispatch. Returns (new_state, losses).

    mels: (C, B, 3000, n_mels) — or (C, B, n_audio_ctx, d) features;
    tokens: (C, B, S). lax.scan over the leading axis runs the exact
    train_step body C times, so the result is numerically identical to C
    sequential train_step calls (tests/test_train.py asserts bitwise
    equality) — but the host pays ONE transfer + ONE dispatch instead of
    C. On remote-tunnel transports (axon: ~0.1-0.4 s per device call,
    ~100 MB/s uploads serialized per call) per-call overhead dominates
    the 60 ms device step, so chunking is a 3-10x wall-clock lever; on
    local hosts it still amortizes dispatch. Trailing-EOT token padding
    is loss-exact (eot_loss_mask keeps only the first EOT; pad positions
    are causal-masked), so batches of different bucketed widths stack
    into one chunk by padding to the chunk max.
    """

    def body(st, xs):
        mel_i, tok_i = xs
        return _apply_update(
            st, mel_i, tok_i, cfg, tx, eot, freeze_encoder, dtype_name,
            remat, blockwise, inputs_are_features, bf16_head,
        )

    return jax.lax.scan(body, state, (mels, tokens))
