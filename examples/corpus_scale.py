"""Corpus-scale learning on the reference's REAL IPA transcriptions.

Every earlier learning/acceptance number lived in a 26-phone toy regime
(examples/generalization.py). This experiment scales to the closest
offline proxy of the actual task: the reference's v2_filtered corpus —
6999 train / 700 test utterances across 7 languages (ja, pl, mt, hu,
fi, el, ta) with the FULL multilingual IPA inventory (reference
data/v2_filtered/combined_{train,test}_ipa.json; the feature table
covers >=99.9% of exactly this inventory, tests/test_reference_data.py).
The audio the corpus references (CommonVoice clips) cannot exist in a
zero-egress image, so each transcription is realized with the repo's
formant synthesizer — per-speaker f0 and per-utterance phone duration
give acoustic variety; the held-out test split uses disjoint utterances
AND disjoint synthesis seeds.

Stages (each skipped if its output already exists, so the script is
resumable):
  1. synth  — write WAVs + pipeline-schema JSONs for train/test
  2. train  — full fine-tune from random init via the production train()
  3. score  — held-out PER/PFER on the 700-sample test split through the
              real validate() path, plus the random-model floor

Run:
  python examples/corpus_scale.py --model tiny --steps 4000 \
      --batch-size 32 --out /tmp/corpus
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_DIR = "/root/reference/data/v2_filtered"


def _speaker_f0(speaker_id: str) -> float:
    """Deterministic per-speaker pitch in 90-180 Hz."""
    h = int(hashlib.sha1(speaker_id.encode()).hexdigest()[:8], 16)
    return 90.0 + (h % 9000) / 100.0


def synth_split(ref_json: str, out_dir: str, out_json: str, seed0: int):
    """Reference corpus JSON -> synthesized WAVs + pipeline-schema JSON."""
    from whisper_ipa_tpu.audio import write_wav
    from whisper_ipa_tpu.data.synth import synthesize_ipa

    with open(ref_json) as f:
        data = json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    entries = []
    t0 = time.time()
    for i, e in enumerate(data):
        ipa = e["ipa_transcription"]
        spk = e.get("speaker_id", str(i))
        rng = np.random.default_rng(seed0 + i)
        dur = float(rng.uniform(0.10, 0.14))  # per-utterance speech rate
        audio = synthesize_ipa(
            ipa, duration=dur, f0=_speaker_f0(spk), seed=seed0 + i
        )
        path = os.path.join(out_dir, f"utt{i}.wav")
        write_wav(path, audio)
        entries.append(
            {
                "audio_path": path,
                "ipa_transcription": ipa,
                "speaker_id": spk,
                "dataset_source": e.get("dataset_source", "commonvoice"),
                "locale": e.get("locale"),
            }
        )
        if (i + 1) % 500 == 0:
            rate = (i + 1) / (time.time() - t0)
            print(
                f"  {i + 1}/{len(data)} synthesized "
                f"({rate:.1f} utt/s, eta {(len(data) - i - 1) / rate:.0f}s)",
                flush=True,
            )
    with open(out_json, "w") as f:
        json.dump(entries, f, ensure_ascii=False)
    print(f"wrote {out_json} ({len(entries)} entries)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--out", default="/tmp/corpus")
    p.add_argument("--ref-dir", default=REF_DIR)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--accum-steps", type=int, default=1)
    p.add_argument("--val-samples", type=int, default=700)
    p.add_argument(
        "--synth-only", action="store_true",
        help="stage 1 only (background-friendly: no device work)",
    )
    p.add_argument(
        "--skip-floor", action="store_true",
        help="skip the random-model floor validate (saves one compile)",
    )
    p.add_argument(
        "--freeze-encoder", action="store_true",
        help="decoder-only fine-tune (random frozen encoder: ablation)",
    )
    p.add_argument(
        "--validate-every", type=int, default=None,
        help="in-loop validation interval (default steps//4); each "
        "validation greedy-decodes 100 held-out samples, which is "
        "minutes on the CPU backend — space them out there",
    )
    p.add_argument(
        "--save-every", type=int, default=None,
        help="checkpoint interval (default: min(steps//8, 250) — a wedged "
        "tunnel should cost minutes of progress, not the whole run)",
    )
    p.add_argument(
        "--steps-per-call", type=int, default=8,
        help="optimizer steps per device dispatch (train_chunk); host "
        "dispatch+transfer dominates the tunnel-bound step time",
    )
    p.add_argument(
        "--fixed-token-len", type=int, default=None,
        help="pin every training batch to one token width (one XLA "
        "program instead of one per pow2 bucket; compiles are minutes "
        "each through the tunnel and worse on CPU). 128 covers p99 of "
        "the reference corpus (measured p99=123, max 175; the 1% tail "
        "truncates, final EOT preserved)",
    )
    p.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the axon site hook overrides "
        "JAX_PLATFORMS, so this must be a post-import config update) — "
        "for micro-model runs when the TPU tunnel is unavailable",
    )
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # unlike axon, the CPU backend DOES hit the persistent compile
        # cache — a restarted run skips its ~minutes-long recompiles
        cache = os.path.expanduser("~/.cache/whisper_ipa_tpu_xla")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    data_root = os.path.join(args.out, "data")
    train_json = os.path.join(data_root, "train.json")
    test_json = os.path.join(data_root, "test.json")

    # -- stage 1: synthesize ------------------------------------------------
    for split, out_json, seed0 in (
        ("train", train_json, 0),
        ("test", test_json, 10_000_000),
    ):
        if os.path.exists(out_json):
            print(f"{out_json} exists, skipping synthesis")
            continue
        print(f"Synthesizing {split} split...")
        synth_split(
            os.path.join(args.ref_dir, f"combined_{split}_ipa.json"),
            os.path.join(data_root, split),
            out_json,
            seed0,
        )
    if args.synth_only:
        return

    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.data.dataset import create_data_loader
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.train.loop import train, validate

    out_dir = os.path.join(args.out, f"run_{args.model}")
    cfg = get_config(args.model)

    floor = None
    if not args.skip_floor:
        test_ds = create_data_loader(
            test_json,
            n_mels=cfg.n_mels,
            mel_cache_dir=os.path.join(args.out, "melcache"),
        )
        floor = validate(
            init_params(cfg, seed=1),
            cfg,
            test_ds,
            test_ds.tokenizer,
            num_samples=32,
        )
        print(
            f"\nRandom-model floor (held-out): PER {floor['per']:.2f}% "
            f"PFER {floor['pfer']:.2f}%"
        )

    # -- stage 2: train ------------------------------------------------------
    summary = train(
        model_name=args.model,
        train_data_path=train_json,
        test_data_path=test_json,
        output_dir=out_dir,
        num_steps=args.steps,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        validate_every=(
            args.validate_every if args.validate_every is not None
            else max(args.steps // 4, 1)
        ),
        save_every=args.save_every or max(min(args.steps // 8, 250), 1),
        steps_per_call=args.steps_per_call,
        freeze_encoder=args.freeze_encoder,
        warmup_steps=min(200, args.steps // 10),
        lr_decay="cosine",
        compute_dtype="bfloat16" if args.bf16 else "float32",
        remat=args.remat,
        accum_steps=args.accum_steps,
        final_validate=True,
        final_validate_samples=args.val_samples,
        mel_cache_dir=os.path.join(args.out, "melcache"),
        resume=True,
        fixed_token_len=args.fixed_token_len,
    )
    if "final_per" not in summary:
        raise SystemExit(f"training stopped early: {summary}")

    # -- stage 3: report -----------------------------------------------------
    result = {
        "model": args.model,
        "steps": args.steps,
        "batch_size": args.batch_size,
        "n_train": 6999,
        "n_heldout_scored": args.val_samples,
        "floor_per": floor["per"] if floor else None,
        "floor_pfer": floor["pfer"] if floor else None,
        "heldout_per": summary["final_per"],
        "heldout_pfer": summary["final_pfer"],
        "final_loss": summary["final_loss"],
    }
    with open(os.path.join(out_dir, "corpus_scale.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("\nCORPUS_SCALE " + json.dumps(result))


if __name__ == "__main__":
    main()
