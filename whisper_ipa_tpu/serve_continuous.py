"""Continuous (in-flight) batching: requests join a RUNNING decode batch.

The micro-batching service (serve.py) coalesces requests into fixed
batches — a request arriving mid-batch waits for the whole batch to
finish. This engine instead keeps one persistent decode state of
``slots`` sequences and lets new requests claim finished/empty slots
between steps, the pattern production LLM servers use (Orca-style
in-flight batching), rebuilt TPU-native:

- every slot has its own length, so steps run through
  ``models.whisper.decode_step_multipos`` (per-element positions, causal
  masks, and KV writes) — one fixed-shape XLA program regardless of
  which slots are active;
- a JOIN feeds the new slot's SOT prefix at position 0 while every other
  slot re-feeds its latest token at its own frontier — rewriting a
  cached position with the same token recomputes identical K/V, so
  active slots are undisturbed (same invariant speculative decoding
  relies on); stale data in a reclaimed slot is never visible because
  the causal mask hides indices past each slot's frontier and writes
  land before reads;
- per-slot cross-attention K/V is scattered into the persistent cache
  when a request joins (one encoder forward per request);
- steps run in chunks of ``steps_per_sync`` under ``lax.scan`` between
  host syncs: the sync reads the emitted tokens to detect EOT and admit
  joiners, and doubles as token-level streaming (``on_token``).

Trade-off vs serve.py: continuous batching pays one small device->host
fetch per chunk for zero queue-to-start latency and per-token streaming;
the micro-batch service keeps the whole decode in one while_loop program
for maximum throughput. The reference has neither (batch-1 scripts,
reference scripts/evaluate_model.py:179).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .audio import N_SAMPLES, load_audio, log_mel_spectrogram, pad_or_trim
from .config import WhisperConfig
from .decode.decoding import (
    DecodingOptions,
    build_blank_mask,
    build_suppress_mask,
    initial_tokens,
)
from .models.whisper import (
    DecoderCache,
    decode_step_multipos,
    encode,
    init_cache,
)
from .tokenizer import WhisperTokenizer, get_tokenizer


@partial(jax.jit, static_argnames=("cfg", "dtype_name"))
def _encode_one(params, cfg: WhisperConfig, mel, dtype_name="float32"):
    return encode(params, cfg, mel, dtype=jnp.dtype(dtype_name))


@partial(jax.jit, static_argnames=("cfg", "dtype_name", "cross_kv_int8"))
def _cross_kv_one(params, cfg: WhisperConfig, features, n_ctx: int = 8,
                  dtype_name="float32", cross_kv_int8=False):
    """Cross K/V (+ empty self buffers) for one utterance's features."""
    return init_cache(
        params, cfg, features, max_len=n_ctx,
        dtype=jnp.dtype(dtype_name), cross_kv_int8=cross_kv_int8,
    )


@partial(jax.jit, donate_argnames=("cache",))
def _scatter_slot(cache: DecoderCache, one: DecoderCache, slot):
    """Install one request's cross-K/V into batch slot `slot`."""

    def put(big, small):
        if big is None:
            return None
        return big.at[:, slot].set(small[:, 0])

    return DecoderCache(
        self_k=cache.self_k,
        self_v=cache.self_v,
        cross_k=put(cache.cross_k, one.cross_k),
        cross_v=put(cache.cross_v, one.cross_v),
        cross_k_scale=put(cache.cross_k_scale, one.cross_k_scale),
        cross_v_scale=put(cache.cross_v_scale, one.cross_v_scale),
    )


@partial(
    jax.jit, static_argnames=("cfg", "dtype_name"),
    donate_argnames=("cache",),
)
def _join_step(
    params,
    cfg: WhisperConfig,
    cache: DecoderCache,
    tokens,  # (B, n_prefix): joiners get their prefix, others re-feed
    pos,  # (B,): 0 for joiners, lens - n_prefix for active slots
    dtype_name="float32",
):
    """Consume the SOT prefix for joining slots; re-feed everyone else."""
    _, cache = decode_step_multipos(
        params, cfg, tokens, cache, pos, dtype=jnp.dtype(dtype_name)
    )
    return cache


@partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "n_prefix", "dtype_name"),
    donate_argnames=("cache",),
)
def _decode_chunk(
    params,
    cfg: WhisperConfig,
    cache: DecoderCache,
    last_tok,  # (B,)
    lens,  # (B,)
    finished,  # (B,) bool
    suppress_mask,
    blank_mask,
    eot: int,
    n_steps: int,
    n_prefix: int,
    dtype_name="float32",
):
    """Advance every slot by up to n_steps tokens (frozen once finished).

    Each step re-feeds the slot's latest token at its frontier (an
    identical-KV rewrite) and samples the next greedily. Returns the
    (n_steps, B) emitted tokens for the host to inspect.
    """
    dtype = jnp.dtype(dtype_name)

    def body(carry, _):
        cache, last_tok, lens, finished = carry
        logits, cache = decode_step_multipos(
            params, cfg, last_tok[:, None], cache, lens - 1, dtype=dtype
        )
        lg = logits[:, 0] + suppress_mask
        lg = jnp.where((lens == n_prefix)[:, None], lg + blank_mask, lg)
        nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, eot, nxt)
        lens = jnp.where(finished, lens, lens + 1)
        finished = finished | (nxt == eot)
        last_tok = jnp.where(nxt == eot, last_tok, nxt)
        return (cache, last_tok, lens, finished), nxt

    (cache, last_tok, lens, finished), toks = jax.lax.scan(
        body, (cache, last_tok, lens, finished), None, length=n_steps
    )
    return cache, last_tok, lens, finished, toks


@partial(
    jax.jit,
    static_argnames=("cfg", "n_prefix", "dtype_name"),
    donate_argnames=("cache",),
)
def _verify_chunk(
    params,
    cfg: WhisperConfig,
    cache: DecoderCache,
    tok_block,  # (B, K+1): [frontier token, draft_1..draft_K] per slot
    pos,  # (B,): frontier position (lens - 1)
    lens,  # (B,): for blank-mask placement
    suppress_mask,
    blank_mask,
    n_prefix: int,
    dtype_name="float32",
):
    """One speculative verification pass over the persistent batch.

    Feeds each slot's frontier token plus K drafted continuations in a
    single (K+1)-query forward and returns the greedy next token at every
    position. Position j's logits are valid iff drafts[0..j-1] all
    matched — the host accepts the longest such run (plus the correction
    token), exactly the contract of decode/speculative.py. Rejected
    positions leave stale K/V in the cache, which the next round's
    frontier re-feed overwrites before anything can attend to it (the
    causal mask hides indices past each slot's accepted length).
    """
    dtype = jnp.dtype(dtype_name)
    logits, cache = decode_step_multipos(
        params, cfg, tok_block, cache, pos, dtype=dtype
    )
    lg = logits + suppress_mask  # (B, K+1, V)
    # position j outputs token index lens + j; blank suppression applies
    # to the first content token (index n_prefix) only
    out_idx = lens[:, None] + jnp.arange(tok_block.shape[1])[None, :]
    lg = jnp.where((out_idx == n_prefix)[..., None], lg + blank_mask, lg)
    greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
    return cache, greedy


def _ngram_draft_host(hist: List[int], K: int) -> List[int]:
    """Model-free prompt-lookup draft (host-side mirror of
    decode.speculative._ngram_drafts): continue the most recent earlier
    occurrence of the current bigram; repeat the last token when the
    bigram is novel. Verification makes any draft source exact."""
    n = len(hist)
    if n >= 2:
        b0, b1 = hist[-2], hist[-1]
        for j in range(n - 3, -1, -1):
            if hist[j] == b0 and hist[j + 1] == b1:
                cont = hist[j + 2 : j + 2 + K]
                if cont:
                    return (cont + [hist[-1]] * K)[:K]
                break
    return [hist[-1]] * K


@dataclass
class _Slot:
    future: Optional[Future] = None
    tokens: List[int] = field(default_factory=list)  # current window
    window_tokens: List[List[int]] = field(default_factory=list)
    windows: List[np.ndarray] = field(default_factory=list)  # remaining
    truncated: bool = False
    submitted_at: float = 0.0
    started_at: float = 0.0
    on_token: Optional[Callable[[dict], None]] = None

    def all_tokens(self) -> List[int]:
        out: List[int] = []
        for w in self.window_tokens:
            out.extend(w)
        out.extend(self.tokens)
        return out


class ContinuousBatcher:
    """In-flight batching greedy transcription engine (single 30 s window).

    slots: persistent batch width. max_new_tokens: per-request budget.
    steps_per_sync: decode steps between host syncs (latency knob: a new
    request waits at most one chunk before joining).
    """

    def __init__(
        self,
        params,
        cfg: WhisperConfig,
        *,
        slots: int = 8,
        max_new_tokens: int = 128,
        steps_per_sync: int = 4,
        language: str = "en",
        bf16: bool = False,
        kv_int8: bool = False,
        draft_k: int = 0,
        tokenizer: Optional[WhisperTokenizer] = None,
    ):
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.max_new = max_new_tokens
        self.steps_per_sync = steps_per_sync
        self.draft_k = draft_k
        self.dtype_name = "bfloat16" if bf16 else "float32"
        self.kv_int8 = kv_int8
        self.tokenizer = tokenizer or get_tokenizer(
            multilingual=cfg.multilingual,
            num_languages=cfg.num_languages,
            language=language,
        )
        options = DecodingOptions(
            language=language, without_timestamps=True
        )
        self.prefix = initial_tokens(self.tokenizer, options)
        self.n_prefix = len(self.prefix)
        # draft_k > 0 needs K cache/position headroom past the frontier
        # for the (K+1)-wide verification block
        self.n_ctx = min(
            self.n_prefix + self.max_new + 1,
            cfg.n_text_ctx - draft_k,
        )
        self.max_new = self.n_ctx - self.n_prefix - 1
        self._cache_len = self.n_ctx + draft_k
        self.suppress = jnp.asarray(
            build_suppress_mask(self.tokenizer, options, cfg.n_vocab)
        )
        self.blank = jnp.asarray(
            build_blank_mask(self.tokenizer, cfg.n_vocab)
        )
        self.eot = self.tokenizer.eot

        # persistent device state: an all-empty batch
        dummy = jnp.zeros(
            (slots, cfg.n_audio_ctx, cfg.n_audio_state),
            jnp.dtype(self.dtype_name),
        )
        self.cache = init_cache(
            params, cfg, dummy, max_len=self._cache_len,
            dtype=jnp.dtype(self.dtype_name), cross_kv_int8=kv_int8,
        )
        self.last_tok = jnp.full((slots,), self.eot, jnp.int32)
        self.lens = jnp.full((slots,), self.n_prefix, jnp.int32)
        self.finished = jnp.ones((slots,), bool)
        self._prefix_row = np.asarray(self.prefix, np.int32)

        self._slots: List[Optional[_Slot]] = [None] * slots
        self._queue: "queue.Queue" = queue.Queue()  # (slot, audio) pairs
        # finished-window requests waiting to rejoin for their next window
        self._continuations: List[tuple] = []
        self._stop = threading.Event()
        self._stats = {
            "requests": 0, "joins": 0, "chunks": 0,
            "spec_rounds": 0, "spec_emitted": 0,
        }
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client API -------------------------------------------------------

    def submit(
        self,
        audio,
        on_token: Optional[Callable[[dict], None]] = None,
        on_partial: Optional[Callable[[dict], None]] = None,
    ) -> Future:
        """Submit one utterance (path or waveform, first 30 s window).

        on_token: called from the engine thread with
        {"token", "text_so_far"} per decoded token (token streaming).
        on_partial is an alias accepted for interface parity with
        serve.TranscriptionService (the HTTP stream handler uses it).
        """
        on_token = on_token or on_partial
        if isinstance(audio, str):
            audio = load_audio(audio)
        audio = np.asarray(audio, np.float32)
        windows = [
            pad_or_trim(audio[s : s + N_SAMPLES])
            for s in range(0, max(len(audio), 1), N_SAMPLES)
        ]
        fut: Future = Future()
        slot = _Slot(
            future=fut,
            windows=windows[1:],
            submitted_at=time.time(),
            on_token=on_token,
        )
        self._queue.put((slot, windows[0]))
        self._stats["requests"] += 1
        return fut

    def transcribe(self, audio, timeout: Optional[float] = None) -> dict:
        return self.submit(audio).result(timeout=timeout)

    def stats(self) -> dict:
        return dict(self._stats)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=30)

    # -- engine -----------------------------------------------------------

    def _free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self._slots) if s is None]

    def _admit(self) -> bool:
        """Join queued requests into free slots. Returns True if any.

        Window continuations (long audio) are admitted before new
        requests so an in-progress utterance never starves behind
        fresh arrivals.
        """
        free = self._free_slots()
        joiners = []
        while free and (self._continuations or not self._queue.empty()):
            if self._continuations:
                slot_state, audio = self._continuations.pop(0)
            else:
                try:
                    slot_state, audio = self._queue.get_nowait()
                except queue.Empty:
                    break
            i = free.pop(0)
            mel = log_mel_spectrogram(audio, n_mels=self.cfg.n_mels)
            feats = _encode_one(
                self.params, self.cfg, jnp.asarray(mel)[None],
                dtype_name=self.dtype_name,
            )
            one = _cross_kv_one(
                self.params, self.cfg, feats,
                dtype_name=self.dtype_name, cross_kv_int8=self.kv_int8,
            )
            self.cache = _scatter_slot(self.cache, one, i)
            if not slot_state.started_at:
                slot_state.started_at = time.time()
            self._slots[i] = slot_state
            joiners.append(i)

        if not joiners:
            return False
        # one batched prefix pass: joiners consume the SOT prefix at pos 0,
        # every other slot re-feeds its latest n_prefix tokens in place
        B, P = self.slots, self.n_prefix
        lens_np = np.asarray(self.lens)
        tok_rows = np.tile(self._prefix_row, (B, 1))
        pos = np.maximum(lens_np - P, 0).astype(np.int32)
        # active slots re-feed: their last P tokens (prefix tail + emitted)
        for b in range(B):
            if b in joiners:
                pos[b] = 0
                continue
            hist = list(self.prefix) + (
                self._slots[b].tokens if self._slots[b] else []
            )
            tail = hist[pos[b] : pos[b] + P]
            tok_rows[b, : len(tail)] = tail
        self.cache = _join_step(
            self.params, self.cfg, self.cache,
            jnp.asarray(tok_rows), jnp.asarray(pos),
            dtype_name=self.dtype_name,
        )
        join_mask = np.zeros(B, bool)
        join_mask[joiners] = True
        self.last_tok = jnp.where(
            jnp.asarray(join_mask),
            jnp.int32(self.prefix[-1]),
            self.last_tok,
        )
        self.lens = jnp.where(
            jnp.asarray(join_mask), jnp.int32(P), self.lens
        )
        self.finished = jnp.where(
            jnp.asarray(join_mask), False, self.finished
        )
        self._stats["joins"] += len(joiners)
        return True

    def _retire(self, i: int, budget_hit: bool):
        """Finish the current window; chain the next or resolve."""
        s = self._slots[i]
        if s is None:
            return
        s.truncated = s.truncated or budget_hit
        s.window_tokens.append(list(s.tokens))
        s.tokens = []
        self._slots[i] = None
        if s.windows:
            # long audio: requeue this request for its next 30 s window
            # (the slot is freed — another request may use it meanwhile)
            self._continuations.append((s, s.windows.pop(0)))
            return
        tokens = s.all_tokens()
        text = self.tokenizer.decode_text(tokens).strip()
        s.future.set_result(
            {
                "text": text,
                "tokens": tokens,
                "n_windows": len(s.window_tokens),
                "latency_sec": time.time() - s.submitted_at,
                "queue_sec": s.started_at - s.submitted_at,
                "truncated": s.truncated,
            }
        )

    def _spec_round(self, active: List[int]):
        """One speculative verification round (draft_k > 0).

        Each slot's bigram prompt-lookup draft rides along with its
        frontier re-feed in a single (K+1)-query device call; the host
        accepts the longest matching run plus the correction token —
        output is token-identical to the plain greedy engine, 1..K+1
        tokens per round per slot instead of always 1.
        """
        K = self.draft_k
        B = self.slots
        lens_np = np.asarray(self.lens).copy()
        last_np = np.asarray(self.last_tok).copy()
        tok_block = np.repeat(last_np[:, None], K + 1, axis=1).astype(
            np.int32
        )
        drafts = np.zeros((B, K), np.int32)
        for b in active:
            hist = list(self.prefix) + self._slots[b].tokens
            d = _ngram_draft_host(hist, K)
            drafts[b] = d
            tok_block[b, 1:] = d
        self.cache, greedy = _verify_chunk(
            self.params, self.cfg, self.cache,
            jnp.asarray(tok_block),
            jnp.asarray(np.maximum(lens_np - 1, 0).astype(np.int32)),
            jnp.asarray(lens_np),
            self.suppress, self.blank, self.n_prefix,
            dtype_name=self.dtype_name,
        )
        greedy_np = np.asarray(greedy)  # (B, K+1) — the host sync
        self._stats["chunks"] += 1
        self._stats["spec_rounds"] += 1
        for b in active:
            s = self._slots[b]
            emitted: List[int] = []
            done = False
            for j in range(K + 1):
                t = int(greedy_np[b, j])
                if t == self.eot:
                    done = True
                    break
                emitted.append(t)
                if j < K and int(drafts[b, j]) != t:
                    break  # t is the correction; later logits invalid
            room = self.max_new - (int(lens_np[b]) - self.n_prefix)
            budget_hit = False
            if len(emitted) >= room:
                emitted = emitted[:room]
                budget_hit = True
            self._stats["spec_emitted"] += len(emitted)
            for t in emitted:
                s.tokens.append(t)
                if s.on_token is not None:
                    try:
                        s.on_token(
                            {
                                "token": t,
                                "window": len(s.window_tokens),
                                "text_so_far": self.tokenizer
                                .decode_text(s.all_tokens()),
                            }
                        )
                    except Exception:
                        pass
            lens_np[b] += len(emitted)
            if emitted:
                last_np[b] = emitted[-1]
            if done or budget_hit:
                self._retire(b, budget_hit and not done)
        self.lens = jnp.asarray(lens_np)
        self.last_tok = jnp.asarray(last_np)
        self.finished = jnp.asarray(
            np.array([self._slots[i] is None for i in range(B)])
        )

    def _loop(self):
        while not self._stop.is_set():
            admitted = self._admit()
            active = [i for i, s in enumerate(self._slots) if s is not None]
            if not active:
                if not admitted:
                    time.sleep(0.002)
                continue

            if self.draft_k > 0:
                self._spec_round(active)
                continue

            (
                self.cache,
                self.last_tok,
                self.lens,
                self.finished,
                toks,
            ) = _decode_chunk(
                self.params,
                self.cfg,
                self.cache,
                self.last_tok,
                self.lens,
                self.finished,
                self.suppress,
                self.blank,
                self.eot,
                self.steps_per_sync,
                self.n_prefix,
                dtype_name=self.dtype_name,
            )
            toks_np = np.asarray(toks)  # (n_steps, B) — the host sync
            self._stats["chunks"] += 1
            lens_np = np.asarray(self.lens)
            for b in active:
                s = self._slots[b]
                done = False
                for t in toks_np[:, b].tolist():
                    if t == self.eot:
                        done = True
                        break
                    s.tokens.append(int(t))
                    if s.on_token is not None:
                        try:
                            s.on_token(
                                {
                                    "token": int(t),
                                    "window": len(s.window_tokens),
                                    "text_so_far": self.tokenizer
                                    .decode_text(s.all_tokens()),
                                }
                            )
                        except Exception:
                            pass
                budget_hit = lens_np[b] - self.n_prefix >= self.max_new
                if done or budget_hit:
                    self._retire(b, budget_hit and not done)
