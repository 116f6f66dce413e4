"""CLI: model-size benchmarks — params, throughput, memory estimates.

(reference scripts/experimental/benchmark_models.py /
benchmark_models_simple.py: reference-measured whisper-small decoder
153,580,800 trainable params, ~17 samples/s train throughput on M3 Ultra.)
"""

import argparse
import time

import numpy as np


def analyze_model(name: str, measure: bool = False, batch_size: int = 8):
    import jax
    import jax.numpy as jnp

    from ..config import get_config
    from ..models import init_params
    from ..models.whisper import count_parameters
    from ..train import create_train_state, train_step

    cfg = get_config(name)
    params = init_params(cfg, seed=0)
    n_enc = count_parameters(params["encoder"])
    n_dec = count_parameters(params["decoder"])
    report = {
        "model": name,
        "n_mels": cfg.n_mels,
        "d_model": cfg.n_audio_state,
        "layers": cfg.n_audio_layer,
        "encoder_params": n_enc,
        "decoder_params": n_dec,
        "total_params": n_enc + n_dec,
        "fp32_weights_mb": (n_enc + n_dec) * 4 / 1e6,
    }
    print(
        f"{name:>10}: enc {n_enc:>12,}  dec {n_dec:>12,}  "
        f"total {n_enc + n_dec:>12,}  ({report['fp32_weights_mb']:.0f} MB fp32)"
    )

    if measure:
        rng = np.random.default_rng(0)
        mel = jnp.asarray(
            rng.standard_normal((batch_size, 3000, cfg.n_mels)).astype(
                np.float32
            )
        )
        eot = 50257
        tokens = jnp.asarray(
            np.tile(
                [[50258, 50259, 50359, 50363] + [100] * 27 + [eot]],
                (batch_size, 1),
            ).astype(np.int32)
        )
        state, tx = create_train_state(params, learning_rate=1e-5)
        state, loss = train_step(state, mel, tokens, cfg, tx, eot)  # compile
        float(loss)  # host transfer: the only reliable sync on all backends
        iters = 5
        t0 = time.time()
        for _ in range(iters):
            state, loss = train_step(state, mel, tokens, cfg, tx, eot)
        float(loss)
        dt = (time.time() - t0) / iters
        report["train_step_sec"] = dt
        report["train_samples_per_sec"] = batch_size / dt

        from ..utils.flops import peak_flops, train_step_flops

        flops = train_step_flops(cfg, tokens.shape[1]) * batch_size
        peak = peak_flops(jax.devices()[0].device_kind)
        mfu_str = ""
        if peak:
            report["train_mfu"] = flops / dt / peak
            mfu_str = f", MFU {100 * report['train_mfu']:.1f}%"
        print(
            f"{'':>10}  train step {dt * 1e3:.1f} ms -> "
            f"{batch_size / dt:.1f} samples/s (batch {batch_size}{mfu_str})"
        )
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description="Model family benchmarks")
    p.add_argument(
        "--models",
        nargs="+",
        default=["tiny", "base", "small", "medium"],
    )
    p.add_argument(
        "--measure", action="store_true", help="Measure train-step throughput"
    )
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args(argv)
    for name in args.models:
        analyze_model(name, measure=args.measure, batch_size=args.batch_size)


if __name__ == "__main__":
    main()
