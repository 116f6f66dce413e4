"""Benchmark: whisper-small batched inference real-time factor on one chip.

Measures the full on-device pipeline — log-mel frontend (matmul-DFT), encoder
forward, and a KV-cached greedy decode of 64 tokens per 30 s utterance, in
bfloat16 — and reports audio-seconds processed per wall-clock second per chip,
plus MFU (achieved FLOP/s over the chip's bf16 peak) from the analytic FLOP
model in whisper_ipa_tpu/utils/flops.py.

Weights are random-init (no pretrained weights are available offline): token
QUALITY is meaningless here, but RTF/MFU are exact — the compute graph is
identical to a trained checkpoint's and EOT is suppressed so every utterance
decodes the full 64 tokens (worst-case, no early-exit inflation).

Baseline: the driver-set north star of 10x real-time per chip for
whisper-small inference (BASELINE.md "North-star"); vs_baseline = RTF / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu", ...}.
Usage: python bench.py [--batch N] [--sweep] [--sample-len N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# Reboot-proof artifact root: /tmp is wiped on every VM restart (it took
# the round-4 corpus checkpoints and the AOT executable cache with it),
# so trained runs, medusa sidecars, and serialized executables live in a
# gitignored directory inside the repo and survive across sessions.
ARTIFACTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts")

# Tracked results dir: every successful headline run records its JSON
# here so the driver's end-of-round bench can ALWAYS print a parsed
# numeric headline — even when the chip is busy with a measurement
# queue or the tunnel is down (round-4 lesson: BENCH_r04.json came back
# empty because bench.py waited 4 h behind the builder's own queue).
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results")


def _record_headline(payload):
    """Persist the just-measured headline for future recorded fallbacks."""
    try:
        os.makedirs(RESULTS, exist_ok=True)
        rec = dict(payload)
        rec["recorded_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime())
        with open(os.path.join(RESULTS, "bench_latest.json"), "w") as f:
            json.dump(rec, f, indent=1)
    except Exception as e:  # recording must never break the bench
        print(f"# headline record failed: {e}", file=sys.stderr)


def _recorded_headline():
    """Newest recorded headline payload, or None."""
    path = os.path.join(RESULTS, "bench_latest.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def _emit_recorded_fallback(reason):
    """Print a parsed numeric headline from the recorded results and
    exit 0; only exits nonzero when no recorded result exists at all."""
    rec = _recorded_headline()
    if rec is not None:
        rec = dict(rec)
        rec["note"] = (
            f"RECORDED result from {rec.get('recorded_at', 'unknown')} "
            f"({reason}); " + str(rec.get("note", ""))
        )
        print(json.dumps(rec))
        sys.exit(0)
    print(json.dumps({
        "metric": "whisper-small inference RTF (audio-sec/sec/chip)",
        "value": None, "unit": "x realtime", "vs_baseline": None,
        "note": f"{reason}; no recorded headline available either",
    }))
    sys.exit(2)

# best single-chip RTF point from the batch sweep (see docs/PERF.md), r2:
# 16: 1426x, 32: 1666x, 64: 1925x, 128: 2868x, 160: 2968x, 192: 3068x,
# 256: 3046x (flat past 192; the T-minor KV layout halved the padded
# cache so batches >128 fit). 192 keeps ~1 GB of headroom vs 256.
HEADLINE_BATCH = 192
SAMPLE_LEN = 64
# int8 cross-attn KV cache (T-minor layout): 2380x RTF at batch 128 vs
# 1253x fp bf16; exact token agreement at tiny scale, ~0.1% logit err
KV_INT8_DEFAULT = True


def bench_point(batch, sample_len, iters=5, kv_int8=False,
                model="small", kv_int4=False):
    import jax
    import jax.numpy as jnp

    from whisper_ipa_tpu.audio import N_SAMPLES
    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.decode import DecodingOptions, decode
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.ops import log_mel_spectrogram_pallas
    from whisper_ipa_tpu.tokenizer import get_tokenizer
    from whisper_ipa_tpu.utils.flops import inference_flops, peak_flops

    cfg = get_config(model)
    params = init_params(cfg, seed=0)
    tokenizer = get_tokenizer(
        multilingual=True, num_languages=cfg.num_languages, language="en"
    )

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, N_SAMPLES)).astype(np.float32) * 0.1
    audio = jnp.asarray(audio)

    options = DecodingOptions(
        language="en",
        without_timestamps=True,
        sample_len=sample_len,
        suppress_tokens=[-1, tokenizer.eot],  # force full-length decode
        fp16=True,  # bfloat16 compute on TPU
        kv_int8=kv_int8 and not kv_int4,  # int8 cross-attention K/V cache
        kv_int4=kv_int4,  # nibble-packed int4 cross-KV (quarter bytes)
    )

    # fused Pallas frontend (framing+window+DFT+power+mel+log in one kernel)
    mel_fn = jax.jit(
        lambda a: log_mel_spectrogram_pallas(a, n_mels=cfg.n_mels)
    )

    def run():
        mel = mel_fn(audio)
        return decode(params, cfg, mel, options, tokenizer=tokenizer)

    t0 = time.time()
    run()
    compile_time = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        run()
    elapsed = time.time() - t0

    audio_seconds = batch * 30.0 * iters
    rtf = audio_seconds / elapsed

    flops = inference_flops(cfg, sample_len) * batch * iters
    achieved = flops / elapsed
    peak = peak_flops(jax.devices()[0].device_kind)
    mfu = achieved / peak if peak else None

    return {
        "rtf": rtf,
        "mfu": mfu,
        "achieved_tflops": achieved / 1e12,
        "elapsed": elapsed,
        "compile_time": compile_time,
        "batch": batch,
        "device": jax.devices()[0].device_kind,
    }


def bench_speculative(batch=8, draft_k=4, sample_len=64, iters=3,
                      model="small", draft="tiny"):
    """Speculative-decode economics on the real chip.

    Random weights make draft/target AGREEMENT meaningless, so the honest
    measurements are the two ends of the acceptance spectrum plus the cost
    components, from which speedup at any real acceptance rate follows:
      - t_base:  plain greedy (the production single-step loop)
      - t_self:  speculative with the target drafting for itself — full
                 acceptance, isolates the cost of (K+1)-query verification
      - t_worst: speculative with an unrelated random draft — near-zero
                 acceptance, the overhead floor
      - t_tiny:  the tiny draft model's own greedy loop (per-token cost)
    Projected speedup at acceptance a:
      (1 + a*K) * t_tok_base / ((K+1) * t_tok_tiny + t_verify_round)
    (trained tiny->small Whisper pairs typically accept 0.7-0.9).
    """
    import jax
    import jax.numpy as jnp

    from whisper_ipa_tpu.audio import N_SAMPLES
    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.decode import (
        DecodingOptions,
        decode,
        speculative_decode,
    )
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.ops import log_mel_spectrogram_pallas
    from whisper_ipa_tpu.tokenizer import get_tokenizer

    cfg = get_config(model)
    if draft == "ngram":
        return _bench_ngram(cfg, batch, draft_k, sample_len, iters)
    draft_cfg = get_config(draft)
    if draft_cfg.n_vocab != cfg.n_vocab:
        # e.g. tiny (51865) drafting large-v3 (51866): a real deployment
        # would distill a draft sharing the target's vocab; random-init
        # benching only needs the draft's SHAPE, so align the vocab
        from dataclasses import replace as _replace

        draft_cfg = _replace(draft_cfg, n_vocab=cfg.n_vocab)
    params = init_params(cfg, seed=0)
    draft_params = init_params(draft_cfg, seed=7)
    tokenizer = get_tokenizer(
        multilingual=True, num_languages=cfg.num_languages, language="en"
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, N_SAMPLES)).astype(np.float32) * 0.1
    )
    mel = jax.jit(lambda a: log_mel_spectrogram_pallas(a, n_mels=cfg.n_mels))(
        audio
    )
    draft_mel = (
        None
        if draft_cfg.n_mels == cfg.n_mels
        else jax.jit(
            lambda a: log_mel_spectrogram_pallas(a, n_mels=draft_cfg.n_mels)
        )(audio)
    )
    options = DecodingOptions(
        language="en",
        without_timestamps=True,
        sample_len=sample_len,
        suppress_tokens=[-1, tokenizer.eot],  # full-length decode
        fp16=True,
    )

    def timed(fn):
        t0 = time.time()
        fn()
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            fn()
        return (time.time() - t0) / iters, compile_s

    t_base, c1 = timed(
        lambda: decode(params, cfg, mel, options, tokenizer=tokenizer)
    )
    t_tiny, c2 = timed(
        lambda: decode(
            draft_params,
            draft_cfg,
            draft_mel if draft_mel is not None else mel,
            options,
            tokenizer=tokenizer,
        )
    )
    t_self, c3 = timed(
        lambda: speculative_decode(
            params, cfg, params, cfg, mel, options,
            draft_k=draft_k, tokenizer=tokenizer,
        )
    )
    t_worst, c4 = timed(
        lambda: speculative_decode(
            params, cfg, draft_params, draft_cfg, mel, options,
            draft_k=draft_k, tokenizer=tokenizer, draft_mel=draft_mel,
        )
    )
    _, stats_self = speculative_decode(
        params, cfg, params, cfg, mel, options,
        draft_k=draft_k, tokenizer=tokenizer, return_stats=True,
    )
    _, stats_worst = speculative_decode(
        params, cfg, draft_params, draft_cfg, mel, options,
        draft_k=draft_k, tokenizer=tokenizer, return_stats=True,
        draft_mel=draft_mel,
    )

    # decompose: self-draft rounds each run K+1 target single-steps (the
    # draft IS the target) plus one (K+1)-query verification forward
    K = draft_k
    tok_base = t_base / sample_len  # per-token target single-step
    tok_tiny = t_tiny / sample_len  # per-token draft single-step
    rounds_self = max(stats_self.rounds, 1)
    t_verify = max(t_self / rounds_self - (K + 1) * tok_base, 0.0)

    def projected(a):
        round_cost = (K + 1) * tok_tiny + t_verify
        return (1 + a * K) * tok_base / round_cost

    return {
        "t_base": t_base,
        "t_tiny": t_tiny,
        "t_self": t_self,
        "t_worst": t_worst,
        "t_verify_round": t_verify,
        "tok_base_ms": 1000 * tok_base,
        "tok_tiny_ms": 1000 * tok_tiny,
        "rounds_self": stats_self.rounds,
        "tokens_per_round_self": stats_self.tokens_per_round,
        "tokens_per_round_worst": stats_worst.tokens_per_round,
        "proj_speedup": {a: projected(a) for a in (0.6, 0.8, 0.9, 1.0)},
        "compiles": [c1, c2, c3, c4],
        "batch": batch,
        "draft_k": K,
        "device": jax.devices()[0].device_kind,
    }


def _bench_ngram(cfg, batch, draft_k, sample_len, iters):
    """Model-free n-gram speculation: speedup is MEASURED, not projected —
    bigram-continuation acceptance is real even on random weights (their
    output is highly repetitive)."""
    import jax
    import jax.numpy as jnp

    from whisper_ipa_tpu.audio import N_SAMPLES
    from whisper_ipa_tpu.decode import (
        DecodingOptions,
        decode,
        speculative_decode,
    )
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.ops import log_mel_spectrogram_pallas
    from whisper_ipa_tpu.tokenizer import get_tokenizer

    params = init_params(cfg, seed=0)
    tokenizer = get_tokenizer(
        multilingual=True, num_languages=cfg.num_languages, language="en"
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, N_SAMPLES)).astype(np.float32) * 0.1
    )
    mel = jax.jit(lambda a: log_mel_spectrogram_pallas(a, n_mels=cfg.n_mels))(
        audio
    )
    options = DecodingOptions(
        language="en",
        without_timestamps=True,
        sample_len=sample_len,
        suppress_tokens=[-1, tokenizer.eot],
        fp16=True,
    )

    def timed(fn):
        t0 = time.time()
        fn()
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            fn()
        return (time.time() - t0) / iters, compile_s

    t_base, c1 = timed(
        lambda: decode(params, cfg, mel, options, tokenizer=tokenizer)
    )
    t_spec, c2 = timed(
        lambda: speculative_decode(
            params, cfg, None, None, mel, options,
            draft_k=draft_k, tokenizer=tokenizer,
        )
    )
    _, stats = speculative_decode(
        params, cfg, None, None, mel, options,
        draft_k=draft_k, tokenizer=tokenizer, return_stats=True,
    )
    return {
        "t_base": t_base,
        "t_tiny": 0.0,
        "t_self": t_spec,
        "t_worst": t_spec,
        "t_verify_round": t_spec / max(stats.rounds, 1),
        "tok_base_ms": 1000 * t_base / sample_len,
        "tok_tiny_ms": 0.0,
        "rounds_self": stats.rounds,
        "tokens_per_round_self": stats.tokens_per_round,
        "tokens_per_round_worst": stats.tokens_per_round,
        "proj_speedup": {"measured": t_base / t_spec},
        "compiles": [c1, c2],
        "batch": batch,
        "draft_k": draft_k,
        "device": jax.devices()[0].device_kind,
    }


def bench_spec_measured(checkpoint, data_json, model="tiny",
                        medusa_weights=None, draft_checkpoint=None,
                        draft="tiny", batch=16, sample_len=32, iters=3,
                        mel_cache_dir=None, draft_k=4, tree=False):
    """MEASURED speculative acceptance on trained models + real audio.

    Unlike bench_speculative (random weights -> projected speedups),
    this loads a TRAINED checkpoint, decodes audio drawn from a real
    dataset JSON, and reports actual tokens/round and end-to-end
    speedup vs the plain greedy loop. Draft source is either trained
    Medusa heads (--medusa-weights) or a trained draft model
    (--draft-checkpoint). EOT is NOT suppressed: acceptance and early
    stopping behave exactly as in production serving.
    """
    import jax
    import jax.numpy as jnp

    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.data.dataset import create_data_loader
    from whisper_ipa_tpu.decode import (
        DecodingOptions,
        decode,
        speculative_decode,
    )
    from whisper_ipa_tpu.models import load_checkpoint_model
    from whisper_ipa_tpu.train.loop import load_or_init_params

    cfg = get_config(model)
    params = load_or_init_params(model, cfg, None)
    # full=True: synth-trained checkpoints carry a TRAINED encoder; the
    # decoder-only reference overlay would leave a random one beneath it
    params, n = load_checkpoint_model(checkpoint, params, full=True)
    print(f"# target checkpoint: {n} tensors", file=sys.stderr)

    medusa_params = None
    draft_params = draft_cfg = None
    if draft == "ngram" and not (medusa_weights or draft_checkpoint):
        pass  # model-free prompt-lookup drafts: nothing to load
    elif medusa_weights:
        from whisper_ipa_tpu.models.medusa import load_medusa

        medusa_params = load_medusa(medusa_weights)
        draft_k = len(medusa_params["heads"])
    elif draft_checkpoint:
        draft_cfg = get_config(draft)
        draft_params = load_or_init_params(draft, draft_cfg, None)
        # full=True (like the target + engine loads above): a draft
        # trained from scratch carries a TRAINED encoder; the decoder-
        # only overlay would run its decoder on a RANDOM encoder and
        # floor the measured acceptance (r3's model-draft 1.06 t/r ran
        # through this path — re-measure queued, docs/R4_TPU_QUEUE.md)
        draft_params, _ = load_checkpoint_model(
            draft_checkpoint, draft_params, full=True
        )
    else:
        raise ValueError(
            "bench_spec_measured needs --medusa-weights, "
            "--draft-checkpoint, or --draft ngram"
        )

    ds = create_data_loader(
        data_json, n_mels=cfg.n_mels, mel_cache_dir=mel_cache_dir
    )
    batch = min(batch, len(ds))
    mel = jnp.asarray(ds.get_batch(list(range(batch)))["mel_features"])
    tokenizer = ds.tokenizer

    options = DecodingOptions(
        language="en", without_timestamps=True,
        sample_len=sample_len, fp16=True,
    )

    def timed(fn):
        t0 = time.time()
        fn()
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            fn()
        return (time.time() - t0) / iters, compile_s

    t_base, c1 = timed(
        lambda: decode(params, cfg, mel, options, tokenizer=tokenizer)
    )
    if tree:
        if medusa_params is None:
            raise ValueError("--medusa-tree needs --medusa-weights")
        from whisper_ipa_tpu.decode.medusa_tree import (
            medusa_tree_decode,
            tree_for_heads,
        )

        chosen = tree_for_heads(medusa_weights)
        print(f"# tree: {chosen}", file=sys.stderr)
        spec = lambda **kw: medusa_tree_decode(
            params, cfg, medusa_params, mel, options,
            tree=chosen, tokenizer=tokenizer, **kw
        )
    else:
        spec = lambda **kw: speculative_decode(
            params, cfg, draft_params, draft_cfg, mel, options,
            draft_k=draft_k, tokenizer=tokenizer,
            medusa_params=medusa_params, **kw
        )
    t_spec, c2 = timed(spec)
    results_spec, stats = spec(return_stats=True)
    draft_k = stats.draft_k  # tree runs: the tree depth, not head count
    results_base = decode(params, cfg, mel, options, tokenizer=tokenizer)
    # exactness check: speculation must not change the greedy output
    match = sum(
        rs.tokens == rb.tokens
        for rs, rb in zip(results_spec, results_base)
    )
    return {
        "t_base": t_base,
        "t_spec": t_spec,
        "speedup": t_base / t_spec,
        "tokens_per_round": stats.tokens_per_round,
        "rounds": stats.rounds,
        "emitted_tokens": stats.emitted_tokens,
        "exact_match": f"{match}/{batch}",
        "compiles": [c1, c2],
        "batch": batch,
        "draft_k": draft_k,
        "source": (
            "medusa-tree" if tree
            else "medusa" if medusa_params else f"{draft}-draft"
        ),
        "device": jax.devices()[0].device_kind,
    }


def discover_trained():
    """Find a trained checkpoint + held-out data for the default bench.

    Order: WHISPER_IPA_TPU_BENCH_CKPT/_DATA env vars, then the corpus-
    scale runs (examples/corpus_scale.py), then the r3 generalization
    run. Returns (ckpt_dir, data_json, model_name) or None.
    """
    import os

    env_ckpt = os.environ.get("WHISPER_IPA_TPU_BENCH_CKPT")
    env_data = os.environ.get("WHISPER_IPA_TPU_BENCH_DATA")
    candidates = []
    if env_ckpt and env_data:
        candidates.append((env_ckpt, env_data))
    art_data = os.path.join(ARTIFACTS, "corpus", "data", "test.json")
    for run_dir, data in (
        (os.path.join(ARTIFACTS, "corpus", "run_small"), art_data),
        (os.path.join(ARTIFACTS, "corpus", "run_tiny"), art_data),
        ("/tmp/corpus/run_small", "/tmp/corpus/data/test.json"),
        ("/tmp/corpus/run_tiny", "/tmp/corpus/data/test.json"),
        ("/tmp/corpus_cputiny/run_tiny", "/tmp/corpus/data/test.json"),
        ("/tmp/gen_small/run", "/tmp/gen_small/data/heldout.json"),
    ):
        best = os.path.join(run_dir, "best-checkpoint")
        if os.path.isdir(best):
            candidates.append((best, data))
        else:
            from whisper_ipa_tpu.train.checkpoints import latest_checkpoint

            latest = latest_checkpoint(run_dir)
            if latest:
                candidates.append((latest, data))
    for ckpt, data in candidates:
        if not (
            os.path.isfile(os.path.join(ckpt, "model.safetensors"))
            and os.path.isfile(data)
        ):
            continue
        cfg_path = os.path.join(os.path.dirname(ckpt), "training_config.json")
        model = "small"
        if os.path.isfile(cfg_path):
            try:
                with open(cfg_path) as f:
                    model = json.load(f)["training_args"].get(
                        "model_name", "small"
                    )
            except Exception as e:  # malformed/legacy config: keep looking
                print(f"# discover_trained: bad {cfg_path}: {e}",
                      file=sys.stderr)
                continue
        return ckpt, data, model
    return None


def bench_trained(checkpoint, data_json, model, batch=32, sample_len=224,
                  iters=2, kv_int8=True):
    """Real-audio trained-checkpoint row: RTF with EOT live + PER/PFER.

    Unlike the forced-length headline (random weights, EOT suppressed),
    this decodes held-out audio with a TRAINED model exactly as serving
    would — tokens are meaningful, early stopping is real, and the
    quality metrics come from the same evaluate_batch the reference
    uses (reference scripts/evaluate_model.py:127-232).
    """
    import jax
    import jax.numpy as jnp

    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.data.dataset import create_data_loader
    from whisper_ipa_tpu.decode import DecodingOptions, decode
    from whisper_ipa_tpu.metrics.evaluate import evaluate_batch
    from whisper_ipa_tpu.models import load_checkpoint_model
    from whisper_ipa_tpu.train.loop import load_or_init_params

    cfg = get_config(model)
    params = load_or_init_params(model, cfg, None)
    params, _ = load_checkpoint_model(checkpoint, params, full=True)

    ds = create_data_loader(data_json, n_mels=cfg.n_mels)
    batch = min(batch, len(ds))
    got = ds.get_batch(list(range(batch)))
    mel = jnp.asarray(got["mel_features"])
    refs = [t.strip() for t in got["ipa_texts"]]

    options = DecodingOptions(
        language="en", without_timestamps=True,
        sample_len=sample_len, fp16=True, kv_int8=kv_int8,
    )

    t0 = time.time()
    results = decode(params, cfg, mel, options, tokenizer=ds.tokenizer)
    compile_time = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        results = decode(params, cfg, mel, options, tokenizer=ds.tokenizer)
    elapsed = (time.time() - t0) / iters

    hyps = [r.text.strip() for r in results]
    metrics = evaluate_batch(refs, hyps)
    return {
        "rtf_30s": batch * 30.0 / elapsed,
        "per": metrics["per"],
        "pfer": metrics["pfer"],
        "batch": batch,
        "elapsed": elapsed,
        "compile_time": compile_time,
        "checkpoint": checkpoint,
        "model": model,
    }


def bench_continuous(slots=8, n_requests=32, sample_len=48,
                     steps_per_sync=4, model="small", draft_k=0,
                     checkpoint=None, draft_checkpoint=None,
                     draft="tiny", data_json=None, medusa_weights=None,
                     medusa_tree=False, join_fast_sync=True,
                     adaptive_sync=False):
    """Continuous-batching engine under staggered load on the real chip.

    Submits n_requests with small arrival jitter and reports end-to-end
    token throughput, median/p90 request latency, and queue (join) delay.
    Default mode (random weights, synthetic audio): EOT is suppressed so
    every request decodes the full sample_len budget (worst case).
    Trained mode (checkpoint + data_json [+ draft_checkpoint for
    in-flight MODEL-draft speculation]): real audio, EOT live —
    acceptance and early stopping are MEASURED, not synthetic.
    """
    import jax.numpy as jnp

    from whisper_ipa_tpu.audio import N_SAMPLES, load_audio
    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.models import init_params, load_checkpoint_model
    from whisper_ipa_tpu.serve_continuous import ContinuousBatcher
    from whisper_ipa_tpu.tokenizer import get_tokenizer

    cfg = get_config(model)
    if checkpoint:
        from whisper_ipa_tpu.train.loop import load_or_init_params

        params = load_or_init_params(model, cfg, None)
        params, _ = load_checkpoint_model(checkpoint, params, full=True)
    else:
        params = init_params(cfg, seed=0)
    draft_params = draft_cfg = medusa_params = None
    if medusa_weights:
        from whisper_ipa_tpu.models.medusa import load_medusa

        medusa_params = load_medusa(medusa_weights)
    elif draft_checkpoint:
        from whisper_ipa_tpu.train.loop import load_or_init_params

        draft_cfg = get_config(draft)
        draft_params = load_or_init_params(draft, draft_cfg, None)
        draft_params, _ = load_checkpoint_model(
            draft_checkpoint, draft_params, full=True
        )
    tokenizer = get_tokenizer(
        multilingual=True, num_languages=cfg.num_languages, language="en"
    )
    tree = None
    if medusa_tree and medusa_params is not None:
        from whisper_ipa_tpu.decode.medusa_tree import tree_for_heads

        tree = tree_for_heads(medusa_weights)
    eng = ContinuousBatcher(
        params, cfg, slots=slots, max_new_tokens=sample_len,
        steps_per_sync=steps_per_sync, language="en", bf16=True,
        draft_k=draft_k, draft_params=draft_params, draft_cfg=draft_cfg,
        medusa_params=medusa_params, medusa_tree=tree, tokenizer=tokenizer,
        join_fast_sync=join_fast_sync,
        adaptive_sync=adaptive_sync,
    )
    if data_json:
        import json as _json

        with open(data_json) as f:
            entries = _json.load(f)
        audios = [
            load_audio(entries[i % len(entries)]["audio_path"])
            for i in range(n_requests)
        ]
    else:
        # suppress EOT so every request runs the full budget (worst case)
        eng.suppress = eng.suppress.at[tokenizer.eot].set(-np.inf)
        rng = np.random.default_rng(0)
        audios = [
            rng.standard_normal(N_SAMPLES).astype(np.float32) * 0.1
            for _ in range(n_requests)
        ]
    # warmup: compile encode/join/chunk programs
    eng.transcribe(audios[0], timeout=3000)

    t0 = time.time()
    futs = []
    for a in audios:
        futs.append(eng.submit(a))
        time.sleep(0.01)  # staggered arrivals
    results = [f.result(timeout=3000) for f in futs]
    elapsed = time.time() - t0
    eng.close()

    tokens = sum(len(r["tokens"]) for r in results)
    lats = sorted(r["latency_sec"] for r in results)
    queues = sorted(r["queue_sec"] for r in results)
    ttfts = sorted(
        r["ttft_sec"] for r in results if r.get("ttft_sec") is not None
    )
    import jax

    st = eng.stats()
    return {
        "tokens_per_sec": tokens / elapsed,
        "requests_per_sec": n_requests / elapsed,
        "latency_p50": lats[len(lats) // 2],
        "latency_p90": lats[int(len(lats) * 0.9)],
        "queue_p50": queues[len(queues) // 2],
        "ttft_p50": ttfts[len(ttfts) // 2] if ttfts else None,
        "ttft_p90": ttfts[int(len(ttfts) * 0.9)] if ttfts else None,
        "elapsed": elapsed,
        "slots": slots,
        "n_requests": n_requests,
        "sample_len": sample_len,
        "draft_k": draft_k,
        "tokens_per_round": (
            st["spec_emitted"] / st["spec_rounds"]
            if st.get("spec_rounds") else None
        ),
        "device": jax.devices()[0].device_kind,
    }


def bench_train(batch, token_len=48, iters=20, dtype="bfloat16",
                cached_features=False, blockwise=False, remat=False,
                unfreeze=False, bf16_head=False):
    """Train-step throughput + MFU (decoder fine-tune, frozen encoder).

    cached_features: train on precomputed encoder outputs (the frozen
    encoder's activations are constant per sample — train(cache_encoder=
    True) removes ~2/3 of each step's FLOPs).

    unfreeze: full fine-tune (encoder gradients too) — the regime where
    the Pallas flash BACKWARD kernel matters: the encoder self-attention
    backward otherwise materializes (B, H, 1500, 1500) probabilities per
    layer in HBM.
    """
    import jax
    import jax.numpy as jnp

    from whisper_ipa_tpu.config import get_config
    from whisper_ipa_tpu.models import init_params
    from whisper_ipa_tpu.models.whisper import encode
    from whisper_ipa_tpu.train import create_train_state, train_step
    from whisper_ipa_tpu.utils.flops import (
        encoder_flops,
        peak_flops,
        train_step_flops,
    )

    if unfreeze and cached_features:
        raise SystemExit("--unfreeze needs mel input (no --cached-features)")

    cfg = get_config("small")
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((batch, 3000, cfg.n_mels)).astype(np.float32)
    )
    if cached_features:
        mel = jax.jit(
            lambda p, m: encode(p, cfg, m, dtype=jnp.dtype(dtype))
        )(params, mel)
    state, tx = create_train_state(params, learning_rate=1e-5,
                                   freeze_encoder=not unfreeze)
    eot = 50257
    tok = np.full((batch, token_len), 300, np.int32)
    tok[:, :4] = [50258, 50259, 50359, 50363]
    tok[:, -1] = eot
    tokens = jnp.asarray(tok)

    def step(state):
        return train_step(state, mel, tokens, cfg, tx, eot,
                          freeze_encoder=not unfreeze, dtype_name=dtype,
                          inputs_are_features=cached_features,
                          blockwise=blockwise, remat=remat,
                          bf16_head=bf16_head)

    t0 = time.time()
    state, loss = step(state)
    compile_time = time.time() - t0
    float(loss)

    t0 = time.time()
    for _ in range(iters):
        state, loss = step(state)
    float(loss)  # host fetch = sync point
    elapsed = time.time() - t0

    flops = (
        train_step_flops(cfg, token_len, freeze_encoder=not unfreeze)
        * batch * iters
    )
    if cached_features:
        flops -= encoder_flops(cfg) * batch * iters
    peak = peak_flops(jax.devices()[0].device_kind)
    mfu = flops / elapsed / peak if peak else None
    return {
        "samples_per_sec": batch * iters / elapsed,
        "step_ms": 1000 * elapsed / iters,
        "mfu": mfu,
        "achieved_tflops": flops / elapsed / 1e12,
        "batch": batch,
        "compile_time": compile_time,
        "device": jax.devices()[0].device_kind,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=HEADLINE_BATCH)
    ap.add_argument("--sample-len", type=int, default=SAMPLE_LEN)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--sweep", action="store_true",
        help="sweep batch sizes and report each point (stderr)",
    )
    ap.add_argument(
        "--train", action="store_true",
        help="benchmark the train step instead of inference",
    )
    ap.add_argument(
        "--speculative", action="store_true",
        help="measure speculative-decode economics (tiny drafting small)",
    )
    ap.add_argument(
        "--continuous", action="store_true",
        help="measure the in-flight batching engine under staggered load",
    )
    ap.add_argument("--draft-k", type=int, default=4)
    ap.add_argument("--draft", default="tiny",
                    help="draft model for --speculative")
    ap.add_argument(
        "--medusa", action="store_true",
        help="MEASURED medusa acceptance: trained checkpoint + heads + "
        "real audio (needs --checkpoint, --medusa-weights, --spec-data)",
    )
    ap.add_argument("--checkpoint", default=None,
                    help="trained base checkpoint for --medusa/--measured")
    ap.add_argument("--medusa-weights", default=None)
    ap.add_argument(
        "--medusa-tree", action="store_true",
        help="tree-structured medusa verification (decode/medusa_tree.py)"
        " for the --medusa measurement",
    )
    ap.add_argument(
        "--draft-checkpoint", default=None,
        help="trained draft-model checkpoint: MEASURED model-draft "
        "speculation (with --checkpoint and --spec-data)",
    )
    ap.add_argument("--spec-data", default=None,
                    help="dataset JSON providing real audio for "
                    "--medusa/--draft-checkpoint measurement")
    ap.add_argument("--mel-cache-dir", default=None)
    ap.add_argument(
        "--kv-int8", action="store_true", default=KV_INT8_DEFAULT,
        help="int8 cross-attention KV cache in the decode loop",
    )
    ap.add_argument(
        "--no-kv-int8", dest="kv_int8", action="store_false",
    )
    ap.add_argument(
        "--kv-int4", action="store_true",
        help="nibble-packed int4 cross-KV cache (quarter of bf16 bytes)",
    )
    ap.add_argument("--model", default="small")
    ap.add_argument(
        "--trained-row", action="store_true", default=True,
        help="append a trained-checkpoint real-audio measurement to the "
        "default bench when one is discoverable (see discover_trained)",
    )
    ap.add_argument(
        "--adaptive-sync", action="store_true",
        help="engine bench: long chunks when no joins are pending "
        "(steps_per_sync x4, on-device early exit) — trades join "
        "latency for fewer host syncs",
    )
    ap.add_argument(
        "--no-join-fast-sync", dest="join_fast_sync",
        action="store_false", default=True,
        help="--continuous: disable the 1-round chunk after a join "
        "(TTFT fast path); for A/B measurement")
    ap.add_argument(
        "--no-trained-row", dest="trained_row", action="store_false",
    )
    ap.add_argument(
        "--cached-features", action="store_true",
        help="train-step bench on precomputed encoder outputs",
    )
    ap.add_argument(
        "--blockwise", action="store_true",
        help="train-step bench with blockwise (chunked-vocab) CE loss",
    )
    ap.add_argument(
        "--remat", action="store_true",
        help="train-step bench with per-layer rematerialization (the "
        "backward recomputes activations instead of saving them; fits "
        "batches that otherwise OOM, e.g. cached-features batch >= 128)",
    )
    ap.add_argument(
        "--unfreeze", action="store_true",
        help="train-step bench with encoder gradients (full fine-tune; "
        "exercises the Pallas flash-backward encoder attention kernel)",
    )
    ap.add_argument(
        "--bf16-head", action="store_true",
        help="train-step bench with bfloat16 logits-GEMM operands "
        "(float32 accumulation; the f32 head is ~7%% of credited FLOPs "
        "but runs at a fraction of MXU peak)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (post-import config update; the axon "
        "site hook overrides JAX_PLATFORMS). Timings are then NOT TPU "
        "numbers — useful for hardware-independent measurements like "
        "speculative ACCEPTANCE (tokens/round) when the tunnel is down",
    )
    args = ap.parse_args()

    import os

    # ONE TPU process at a time (CLAUDE.md): a second JAX client beside
    # a running one can wedge the tunnel permanently — even the probe
    # below counts. If a measurement-queue runner (perf/run_tpu_queue*)
    # is alive and we are NOT one of its descendants, WAIT for it to
    # drain instead of racing it; the driver's end-of-round bench run
    # lands here when a queue is still executing.
    if not args.cpu and os.environ.get("WHISPER_IPA_TPU_NO_QUEUE_WAIT") != "1":
        import glob as _glob
        import time as _time

        def _ancestors():
            pids, p = set(), os.getpid()
            while p > 1:
                try:
                    with open(f"/proc/{p}/stat") as f:
                        p = int(f.read().rsplit(")", 1)[1].split()[1])
                except Exception:
                    break
                pids.add(p)
            return pids

        def _live_queue_pids():
            live = []
            for pf in _glob.glob("/tmp/queue*.pid"):
                try:
                    qpid = int(open(pf).read().strip())
                    os.kill(qpid, 0)
                    live.append(qpid)
                except Exception:
                    continue
            return live

        def _proc_table():
            """pid -> (ppid, comm) for every live process."""
            table = {}
            for d in os.listdir("/proc"):
                if not d.isdigit():
                    continue
                try:
                    with open(f"/proc/{d}/stat") as f:
                        raw = f.read()
                    comm = raw[raw.index("(") + 1: raw.rindex(")")]
                    ppid = int(raw.rsplit(")", 1)[1].split()[1])
                    table[int(d)] = (ppid, comm)
                except Exception:
                    continue
            return table

        def _queue_busy(anc):
            """True if a queue runner we are NOT part of has a live
            python descendant (an item actively holding the TPU).
            Chain waiters with no running item don't block."""
            qpids = [q for q in _live_queue_pids() if q not in anc]
            if not qpids:
                return False
            table = _proc_table()
            for pid, (ppid, comm) in table.items():
                if "python" not in comm:
                    continue
                p = pid
                seen = 0
                while p > 1 and seen < 64:
                    if p in qpids:
                        if pid not in anc and pid != os.getpid():
                            return True
                        break
                    p = table.get(p, (0, ""))[0]
                    seen += 1
            return False

        anc = _ancestors()
        waited = 0
        while _queue_busy(anc):
            # require two clear checks before proceeding (item-to-item
            # gaps in the queue are sub-second; don't race into one)
            if waited == 0:
                print(
                    "# measurement queue active; waiting for it to "
                    "drain before touching the TPU (override: "
                    "WHISPER_IPA_TPU_NO_QUEUE_WAIT=1)",
                    flush=True,
                )
            if waited >= 600:
                # Do NOT race the queue onto the TPU (a second client
                # beside a running one can wedge the tunnel — CLAUDE.md);
                # surface the newest recorded headline instead so the
                # driver still gets a parsed numeric line (r4 lesson).
                print(
                    "# queue still active after 10 min — emitting the "
                    "newest RECORDED headline instead of racing it",
                    flush=True,
                )
                _emit_recorded_fallback(
                    "chip busy with a live measurement queue")
            _time.sleep(60)
            waited += 60
            if not _queue_busy(anc):
                _time.sleep(15)

    # the axon tunnel can wedge in a way that blocks jax.devices()
    # FOREVER (connect-retry loop, no timeout — observed r4); probe in a
    # subprocess first so a dead tunnel yields an honest line instead of
    # hanging the recorded bench run
    import subprocess

    reachable = True
    if args.cpu:
        pass  # CPU backend: no tunnel involved
    elif os.environ.get("WHISPER_IPA_TPU_SKIP_PROBE") != "1":
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=180, env=dict(os.environ),
            )
            reachable = probe.returncode == 0
        except subprocess.TimeoutExpired:
            reachable = False
    if not reachable:
        out = {
            "metric": "whisper-small inference RTF "
            "(audio-sec/sec/chip)",
            "value": None,
            "unit": "x realtime",
            "vs_baseline": None,
            "note": "DEVICE UNREACHABLE: the accelerator backend "
            "failed to initialize within 180s (axon tunnel down); "
            "RTF not measurable",
        }
        # Salvage what IS measurable with the tunnel down: speculative
        # ACCEPTANCE is a model property (CPU reproduced the r3 TPU
        # measurement exactly — docs/PERF.md r4 chain-vs-tree), so when a
        # trained checkpoint + medusa heads exist, record tokens/round
        # from the CPU backend instead of nothing.
        spec = None
        if os.environ.get("WHISPER_IPA_TPU_BENCH_NO_CPU_FALLBACK") != "1":
            _art_corpus = os.path.join(ARTIFACTS, "corpus")
            for heads, ckpt, data, mc, mdl in (
                (os.path.join(_art_corpus, "medusa_small.safetensors"),
                 os.path.join(_art_corpus, "run_small/best-checkpoint"),
                 os.path.join(_art_corpus, "data/test.json"),
                 os.path.join(_art_corpus, "melcache"),
                 "small"),
                ("/tmp/corpus/medusa_small.safetensors",
                 "/tmp/corpus/run_small/best-checkpoint",
                 "/tmp/corpus/data/test.json", "/tmp/corpus/melcache",
                 "small"),
                ("/tmp/corpus_cputiny/medusa_tiny.safetensors",
                 "/tmp/corpus_cputiny/run_tiny/best-checkpoint",
                 "/tmp/corpus/data/test.json", "/tmp/corpus/melcache",
                 "tiny"),
                ("/tmp/gen_exp/medusa_heads.safetensors",
                 "/tmp/gen_exp/run/best-checkpoint",
                 "/tmp/gen_exp/data/heldout.json", "/tmp/gen_exp/melcache",
                 "tiny"),
            ):
                if (
                    os.path.isfile(heads)
                    and os.path.isfile(os.path.join(
                        ckpt, "model.safetensors"))
                    and os.path.isfile(data)
                ):
                    spec = (heads, ckpt, data, mc, mdl)
                    break
        if spec is not None:
            heads, ckpt, data, mc, mdl = spec
            import jax

            jax.config.update("jax_platforms", "cpu")
            try:
                r = bench_spec_measured(
                    ckpt, data, model=mdl, medusa_weights=heads,
                    batch=8, sample_len=32, iters=1, mel_cache_dir=mc,
                    tree=os.path.isfile(heads + ".accuracy.json"),
                )
                out["cpu_acceptance"] = {
                    "tokens_per_round": round(r["tokens_per_round"], 3),
                    "rounds": r["rounds"],
                    "emitted_tokens": r["emitted_tokens"],
                    "exact_match": r["exact_match"],
                    "source": r["source"],
                    "model": mdl,
                    "batch": r["batch"],
                }
                out["note"] += (
                    "; speculative acceptance (hardware-independent) "
                    "measured on the CPU backend instead"
                )
            except Exception as e:
                out["cpu_fallback_error"] = repr(e)[:300]
        # Held-out corpus-scale learning results (PER/PFER through the
        # real validate() path) are likewise hardware-independent —
        # surface the newest corpus_scale.json so the recorded bench
        # carries the learning evidence even with the tunnel down.
        found = []
        for run_dir in (
            os.path.join(ARTIFACTS, "corpus", "run_small"),
            os.path.join(ARTIFACTS, "corpus", "run_tiny"),
            "/tmp/corpus/run_small",
            "/tmp/corpus/run_tiny",
            "/tmp/corpus_cputiny/run_tiny",
        ):
            cs = os.path.join(run_dir, "corpus_scale.json")
            if os.path.isfile(cs):
                found.append((os.path.getmtime(cs), cs))
        if found:
            try:
                with open(max(found)[1]) as f:
                    out["corpus_scale"] = json.load(f)
            except Exception:
                pass
        # Prefer a parsed numeric headline: overlay the newest recorded
        # run's RTF on the unreachable note so the driver's record is
        # never value=null when a measured number exists on disk.
        rec = _recorded_headline()
        if rec is not None:
            for k in ("metric", "value", "unit", "vs_baseline", "mfu",
                      "achieved_tflops", "batch", "trained"):
                if k in rec:
                    out[k] = rec[k]
            out["note"] = (
                f"RECORDED result from {rec.get('recorded_at', 'unknown')} "
                "(device unreachable now); " + str(out.get("note", ""))
            )
            print(json.dumps(out))
            sys.exit(0)
        print(json.dumps(out))
        sys.exit(2)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # persistent compilation cache: later runs skip the long XLA compiles
    cache_dir = os.path.expanduser("~/.cache/whisper_ipa_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    # serialized-executable cache (utils/aot_cache): the XLA persistent
    # cache never hits through the axon tunnel, but compiled executables
    # round-trip fine (docs/PERF.md serve-start table) — default it to
    # the repo-local artifacts dir so repeat bench runs skip the
    # minutes-long remote compiles and the cache survives reboots.
    if not os.environ.get("WHISPER_IPA_TPU_AOT_CACHE"):
        os.environ["WHISPER_IPA_TPU_AOT_CACHE"] = os.path.join(
            ARTIFACTS, "aotcache")
        # pre-trace keys skip the 70-100 s of warm-start tracing too;
        # safe to default on: the fast-disk path only engages for jitted
        # programs vetted with aot_cache.fast_disk_vetted (per-function
        # allowlist), so an unvetted future call site keeps the exact
        # StableHLO key regardless of this var
        os.environ.setdefault("WHISPER_IPA_TPU_AOT_FAST_DISK", "1")

    if args.continuous:
        slots = args.batch if args.batch != HEADLINE_BATCH else 8
        draft_k = (
            args.draft_k
            if (args.draft == "ngram" or args.draft_checkpoint)
            else 0
        )
        r = bench_continuous(
            slots=slots,
            sample_len=args.sample_len if args.sample_len != SAMPLE_LEN
            else 48,
            model=args.model,
            draft_k=draft_k,
            checkpoint=args.checkpoint,
            draft_checkpoint=args.draft_checkpoint,
            draft=args.draft,
            data_json=args.spec_data,
            medusa_weights=args.medusa_weights,
            medusa_tree=args.medusa_tree,
            join_fast_sync=args.join_fast_sync,
            adaptive_sync=args.adaptive_sync,
        )
        print(
            json.dumps(
                {
                    "metric": "continuous batching token throughput "
                    f"(whisper-{args.model}, {r['slots']} slots"
                    + (f", ngram draft K={draft_k}" if draft_k else "")
                    + ")",
                    "value": round(r["tokens_per_sec"], 1),
                    "unit": "tokens/s",
                    "vs_baseline": None,
                    "latency_p50_s": round(r["latency_p50"], 3),
                    "latency_p90_s": round(r["latency_p90"], 3),
                    "queue_p50_s": round(r["queue_p50"], 3),
                    "ttft_p50_s": (
                        round(r["ttft_p50"], 3)
                        if r["ttft_p50"] is not None else None
                    ),
                    "ttft_p90_s": (
                        round(r["ttft_p90"], 3)
                        if r["ttft_p90"] is not None else None
                    ),
                    "requests_per_sec": round(r["requests_per_sec"], 2),
                    "sample_len": r["sample_len"],
                    "tokens_per_round_batchwide": (
                        round(r["tokens_per_round"], 2)
                        if r["tokens_per_round"] else None
                    ),
                    "note": "staggered arrivals join a running batch; "
                    + (
                        "trained checkpoint + real audio, EOT live "
                        "(requests early-stop)"
                        if args.checkpoint
                        else "EOT suppressed (full-length worst case)"
                    ),
                }
            )
        )
        print(
            f"# elapsed={r['elapsed']:.2f}s n={r['n_requests']} "
            f"device={r['device']}",
            file=sys.stderr,
        )
        return

    if args.medusa or args.draft_checkpoint or (
        args.checkpoint and args.draft == "ngram"
    ):
        if not (args.checkpoint and args.spec_data):
            ap.error("--medusa/--draft-checkpoint need --checkpoint "
                     "and --spec-data")
        batch = args.batch if args.batch != HEADLINE_BATCH else 16
        r = bench_spec_measured(
            checkpoint=args.checkpoint,
            data_json=args.spec_data,
            model=args.model,
            medusa_weights=args.medusa_weights,
            draft_checkpoint=args.draft_checkpoint,
            draft=args.draft,
            batch=batch,
            sample_len=args.sample_len if args.sample_len != SAMPLE_LEN
            else 32,
            iters=max(args.iters, 1 if args.cpu else 3),
            mel_cache_dir=args.mel_cache_dir,
            draft_k=args.draft_k,
            tree=args.medusa_tree,
        )
        print(
            json.dumps(
                {
                    "metric": "speculative decode MEASURED speedup "
                    f"({r['source']}->{args.model}, trained, real audio)",
                    "value": round(r["speedup"], 3),
                    "unit": "x vs single-step greedy",
                    "vs_baseline": round(r["speedup"], 3),
                    "tokens_per_round": round(r["tokens_per_round"], 2),
                    "rounds": r["rounds"],
                    "emitted_tokens": r["emitted_tokens"],
                    "exact_match": r["exact_match"],
                    "batch": r["batch"],
                    "draft_k": r["draft_k"],
                    "t_base_s": round(r["t_base"], 3),
                    "t_spec_s": round(r["t_spec"], 3),
                }
            )
        )
        print(
            f"# compiles={[round(c) for c in r['compiles']]}s "
            f"device={r['device']}",
            file=sys.stderr,
        )
        return

    if args.speculative:
        batch = args.batch if args.batch != HEADLINE_BATCH else 8
        r = bench_speculative(
            batch=batch, draft_k=args.draft_k,
            sample_len=args.sample_len, iters=max(args.iters, 3),
            model=args.model, draft=args.draft,
        )
        headline = r["proj_speedup"].get(
            0.8, r["proj_speedup"].get("measured")
        )
        metric = (
            f"speculative decode measured speedup (ngram->{args.model})"
            if args.draft == "ngram"
            else "speculative decode projected speedup "
            f"({args.draft}->{args.model}, acceptance 0.8)"
        )
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(headline, 3),
                    "unit": "x vs single-step greedy",
                    "vs_baseline": round(headline, 3),
                    "tok_base_ms": round(r["tok_base_ms"], 3),
                    "tok_tiny_ms": round(r["tok_tiny_ms"], 3),
                    "t_verify_round_ms": round(
                        1000 * r["t_verify_round"], 3
                    ),
                    "tokens_per_round_self": round(
                        r["tokens_per_round_self"], 2
                    ),
                    "tokens_per_round_worst": round(
                        r["tokens_per_round_worst"], 2
                    ),
                    "batch": r["batch"],
                    "draft_k": r["draft_k"],
                    "note": "random weights: acceptance synthetic; "
                    "self-draft=1.0, unrelated draft~=0",
                }
            )
        )
        print(
            f"# t_base={r['t_base']:.3f}s t_tiny={r['t_tiny']:.3f}s "
            f"t_self={r['t_self']:.3f}s t_worst={r['t_worst']:.3f}s "
            f"rounds_self={r['rounds_self']} "
            f"proj={{{', '.join(f'{a}: {s:.2f}x' for a, s in r['proj_speedup'].items())}}} "
            f"compiles={[round(c) for c in r['compiles']]}s "
            f"device={r['device']}",
            file=sys.stderr,
        )
        return

    if args.train:
        batch = args.batch if args.batch != HEADLINE_BATCH else 12
        r = bench_train(batch, iters=args.iters if args.iters != 5 else 20,
                        cached_features=args.cached_features,
                        blockwise=args.blockwise, remat=args.remat,
                        unfreeze=args.unfreeze, bf16_head=args.bf16_head)
        print(
            json.dumps(
                {
                    "metric": "whisper-small train step (samples/sec/chip)",
                    "value": round(r["samples_per_sec"], 2),
                    "unit": "samples/s",
                    "vs_baseline": round(r["samples_per_sec"] / 17.0, 3),
                    "mfu": round(r["mfu"], 4) if r["mfu"] else None,
                    "achieved_tflops": round(r["achieved_tflops"], 2),
                    "batch": r["batch"],
                    "note": "device-resident batch; baseline 17 samples/s "
                    "(reference M3 Ultra)",
                }
            )
        )
        print(
            f"# step={r['step_ms']:.1f}ms compile={r['compile_time']:.0f}s "
            f"device={r['device']}",
            file=sys.stderr,
        )
        return

    if args.sweep:
        best = None
        for batch in (16, 32, 64, 128):
            r = bench_point(batch, args.sample_len, args.iters,
                            kv_int8=args.kv_int8)
            print(
                f"# batch={batch}: RTF={r['rtf']:.1f}x "
                f"MFU={100 * (r['mfu'] or 0):.1f}% "
                f"({r['achieved_tflops']:.1f} TFLOP/s) "
                f"elapsed={r['elapsed']:.2f}s compile={r['compile_time']:.0f}s",
                file=sys.stderr,
            )
            if best is None or r["rtf"] > best["rtf"]:
                best = r
        r = best
    else:
        r = bench_point(args.batch, args.sample_len, args.iters,
                        kv_int8=args.kv_int8, model=args.model,
                        kv_int4=args.kv_int4)

    # trained-checkpoint real-audio row (EOT live, quality measured):
    # runs alongside the forced-length headline whenever a trained
    # checkpoint is discoverable, so the recorded bench is no longer
    # random-weights-only
    trained = None
    note = "random-init weights: RTF/MFU exact, tokens meaningless"
    if args.trained_row:
        found = discover_trained()
        if found:
            try:
                ckpt, data, model = found
                tr = bench_trained(ckpt, data, model)
                trained = {
                    "model": tr["model"],
                    "rtf_30s_windows": round(tr["rtf_30s"], 1),
                    "heldout_per_pct": round(tr["per"], 2),
                    "heldout_pfer_pct": round(tr["pfer"], 2),
                    "num_samples": tr["batch"],
                    "batch": tr["batch"],
                    "checkpoint": tr["checkpoint"],
                }
                note = (
                    "headline: random-init forced-length (RTF/MFU exact); "
                    "trained: real held-out audio, EOT live, quality on "
                    f"the first {tr['batch']} test utterances (full-split "
                    "numbers in docs/PERF.md)"
                )
                print(
                    f"# trained row: compile={tr['compile_time']:.0f}s "
                    f"elapsed={tr['elapsed']:.2f}s ckpt={ckpt}",
                    file=sys.stderr,
                )
            except Exception as e:  # never break the headline bench
                print(f"# trained row failed: {e}", file=sys.stderr)

    payload = {
        "metric": (
            f"whisper-{args.model} inference RTF (audio-sec/sec/chip)"
            if args.model != "small"
            else "whisper-small inference RTF (audio-sec/sec/chip)"
        ),
        "value": round(r["rtf"], 2),
        "unit": "x realtime",
        "vs_baseline": round(r["rtf"] / 10.0, 3),
        "mfu": round(r["mfu"], 4) if r["mfu"] is not None else None,
        "achieved_tflops": round(r["achieved_tflops"], 2),
        "batch": r["batch"],
        "note": note,
    }
    if trained:
        payload["trained"] = trained
    if not args.sweep and args.batch == HEADLINE_BATCH and not args.cpu:
        _record_headline(payload)  # driver-flow runs feed the fallback
    print(json.dumps(payload))
    print(
        f"# batch={r['batch']} sample_len={args.sample_len} "
        f"iters={args.iters} elapsed={r['elapsed']:.2f}s "
        f"compile={r['compile_time']:.1f}s device={r['device']}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
