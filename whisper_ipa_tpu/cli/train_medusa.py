"""Train Medusa draft heads on a fine-tuned model's own data.

The base model stays FROZEN: each step teacher-forces one batch through
the decoder once, then fits the K residual heads (models/medusa.py) to
predict tokens k+2 positions ahead from the final hidden states. The
heads land in their own safetensors file, consumed by
`cli.serve --draft-model medusa --medusa-weights <file>` — the base
checkpoint format (reference scripts/train_whisper_ipa.py:410-443) is
untouched.

Usage:
  python -m whisper_ipa_tpu.cli.train_medusa \
      --model small --checkpoint checkpoints/best-checkpoint \
      --train-data data/train_ipa.json --steps 2000 \
      --n-heads 4 --output medusa_heads.safetensors
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Train Medusa speculative-decoding heads "
        "(frozen base model)"
    )
    p.add_argument("--model", default="small")
    p.add_argument("--checkpoint", default=None)
    p.add_argument(
        "--full-checkpoint", action="store_true",
        help="overlay ALL tensors from --checkpoint (encoder included) "
        "instead of the decoder-only reference contract — required for "
        "checkpoints from full fine-tunes (train --unfreeze-encoder), "
        "else the heads fit hidden states from a random encoder",
    )
    p.add_argument("--weights", default=None)
    p.add_argument("--train-data", required=True)
    p.add_argument("--output", default="medusa_heads.safetensors")
    p.add_argument("--n-heads", type=int, default=4)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--language", default="en")
    p.add_argument("--mel-cache-dir", default=None)
    p.add_argument("--log-every", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..config import get_config
    from ..data.dataset import create_data_loader
    from ..models import load_checkpoint_model
    from ..models.medusa import (
        init_medusa_params,
        save_medusa,
        train_medusa_step,
    )
    from ..models.whisper import decoder_hidden, encode
    from ..train.loop import load_or_init_params

    cfg = get_config(args.model)
    params = load_or_init_params(args.model, cfg, args.weights)
    if args.checkpoint:
        params, n = load_checkpoint_model(
            args.checkpoint, params, full=args.full_checkpoint
        )
        scope = "model" if args.full_checkpoint else "decoder"
        print(f"Loaded {n} {scope} tensors from {args.checkpoint}")

    dataset = create_data_loader(
        args.train_data,
        multilingual=cfg.multilingual,
        n_mels=cfg.n_mels,
        language=args.language,
        mel_cache_dir=args.mel_cache_dir,
    )
    print(f"{len(dataset)} training samples")

    medusa = init_medusa_params(cfg, n_heads=args.n_heads, seed=args.seed)
    tx = optax.adam(args.learning_rate)
    opt_state = tx.init(medusa)
    eot = dataset.tokenizer.eot

    # one frozen-model forward per batch; heads fit on the hidden states
    hidden_fn = jax.jit(
        lambda p, mel, tok: decoder_hidden(
            p, cfg, tok, encode(p, cfg, mel, dtype=jnp.bfloat16),
            dtype=jnp.bfloat16,
        )
    )
    step_fn = jax.jit(
        lambda mp, os, h, t: train_medusa_step(
            mp, os, tx, params, cfg, h, t, eot
        )
    )

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        idx = rng.choice(len(dataset), args.batch_size, replace=True)
        batch = dataset.get_batch(idx)
        mel = jnp.asarray(batch["mel_features"])
        tokens = jnp.asarray(batch["tokens"])
        hidden = hidden_fn(params, mel, tokens)
        medusa, opt_state, loss = step_fn(medusa, opt_state, hidden, tokens)
        if step % args.log_every == 0 or step == 1:
            print(
                f"step {step}/{args.steps}: head loss {float(loss):.4f} "
                f"({(time.time() - t0) / step:.2f} s/step)",
                flush=True,
            )

    save_medusa(args.output, medusa)
    print(f"saved {args.n_heads} heads -> {args.output}")


if __name__ == "__main__":
    main()
