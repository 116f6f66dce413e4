"""Microbench: single-query decode_step vs (K+1)-query decode_step_multipos.

The speculative verify round's cost multiple over a plain greedy step
determines whether measured acceptance (1.80 tokens/round medusa) can
clear break-even. In the bandwidth-bound regime the verify forward
streams the SAME weights and KV cache as a single step, so the multiple
should be ~1.1x, not the ~2.5x the r3 end-to-end numbers imply.
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from whisper_ipa_tpu.config import get_config
from whisper_ipa_tpu.models import init_params
from whisper_ipa_tpu.models.whisper import (
    decode_step,
    decode_step_multipos,
    encode,
    init_cache,
)

MODEL = "small"
B = 8
ITERS = 64
cfg = get_config(MODEL)
dtype = jnp.bfloat16


@partial(jax.jit, static_argnames=("S", "iters", "multipos", "with_softmax"))
def run(params, feats, S, iters, multipos, with_softmax=False):
    cache = init_cache(
        params, cfg, feats, max_len=448, dtype=dtype, cross_kv_int8=True
    )
    tok0 = jnp.full((B, S), 100, jnp.int32)

    def body(carry, i):
        cache, tok = carry
        if multipos:
            pos = jnp.full((B,), 4, jnp.int32) + i
            logits, cache = decode_step_multipos(
                params, cfg, tok, cache, pos, dtype=dtype
            )
        else:
            logits, cache = decode_step(
                params, cfg, tok, cache, 4 + i, dtype=dtype
            )
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        extra = 0.0
        if with_softmax:
            extra = jax.nn.log_softmax(logits, axis=-1).mean()
        tok = jnp.broadcast_to(nxt[:, None], (B, S))
        return (cache, tok), nxt[0].astype(jnp.float32) + extra

    (_, _), ys = jax.lax.scan(body, (cache, tok0), jnp.arange(iters))
    return ys.sum()


def bench(label, **kw):
    params = init_params(cfg, seed=0)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (B, 3000, cfg.n_mels), jnp.float32)
    feats = jax.jit(encode, static_argnames=("cfg", "dtype"))(
        params, cfg, mel, dtype=dtype
    )
    t0 = time.time()
    float(run(params, feats, iters=ITERS, **kw))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        float(run(params, feats, iters=ITERS, **kw))
        times.append(time.time() - t0)
    per_round = min(times) / ITERS * 1000
    print(
        f"{label:40s} {per_round:7.3f} ms/round  "
        f"(compile {compile_s:.0f}s, runs {[f'{t:.3f}' for t in times]})",
        flush=True,
    )
    return per_round


if __name__ == "__main__":
    print(f"model={MODEL} batch={B} iters={ITERS} device={jax.devices()[0]}")
    base = bench("decode_step S=1 (greedy baseline)", S=1, multipos=False)
    m1 = bench("multipos S=1", S=1, multipos=True)
    m5 = bench("multipos S=5 (K=4 verify)", S=5, multipos=True)
    m9 = bench("multipos S=9 (K=8 verify)", S=9, multipos=True)
    m5s = bench("multipos S=5 + full log_softmax", S=5, multipos=True,
                with_softmax=True)
    print(f"\nmultiples vs greedy step: S=1 {m1/base:.2f}x  S=5 {m5/base:.2f}x"
          f"  S=9 {m9/base:.2f}x  S=5+softmax {m5s/base:.2f}x")
