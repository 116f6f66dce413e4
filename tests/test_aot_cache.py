"""Persistent compiled-executable cache (utils/aot_cache.py)."""

import os
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_ipa_tpu.utils import aot_cache
from whisper_ipa_tpu.utils.aot_cache import aot_call, fast_disk_vetted


@fast_disk_vetted
@partial(jax.jit, static_argnames=("n", "flag"))
def _toy(params, x, n, y, flag=False):
    out = x @ params["w"] + y
    for _ in range(n):
        out = jnp.tanh(out)
    return out * (2.0 if flag else 1.0)


@partial(jax.jit, static_argnames=("n",))
def _toy_unvetted(params, x, n, y):
    out = x @ params["w"] + y
    for _ in range(n):
        out = jnp.tanh(out)
    return out


@pytest.fixture
def cache_dir(tmp_path):
    aot_cache.set_cache_dir(str(tmp_path))
    aot_cache._fast.clear()
    for k in aot_cache._stats:
        aot_cache._stats[k] = 0
    yield str(tmp_path)
    aot_cache.set_cache_dir(None)
    aot_cache._fast.clear()


class TestAotCall:
    def test_disabled_passthrough(self):
        aot_cache.set_cache_dir("")
        try:
            params = {"w": jnp.eye(4)}
            x = jnp.ones((2, 4))
            y = jnp.zeros((2, 4))
            out = aot_call(_toy, params, x, 2, y)
            np.testing.assert_allclose(
                out, _toy(params, x, 2, y), rtol=1e-6
            )
        finally:
            aot_cache.set_cache_dir(None)

    def test_compile_then_fast_then_disk(self, cache_dir):
        params = {"w": jnp.eye(4)}
        x = jnp.ones((2, 4))
        y = jnp.zeros((2, 4))
        ref = _toy(params, x, 2, y, flag=True)

        out1 = aot_call(_toy, params, x, 2, y, flag=True)
        np.testing.assert_allclose(out1, ref, rtol=1e-6)
        assert aot_cache.stats()["compiles"] == 1
        files = [f for f in os.listdir(cache_dir) if f.endswith(".jaxexec")]
        assert len(files) == 1

        out2 = aot_call(_toy, params, x, 2, y, flag=True)
        np.testing.assert_allclose(out2, ref, rtol=1e-6)
        assert aot_cache.stats()["fast_hits"] == 1

        # fresh process simulation: drop the in-memory executables
        aot_cache._fast.clear()
        out3 = aot_call(_toy, params, x, 2, y, flag=True)
        np.testing.assert_allclose(out3, ref, rtol=1e-6)
        st = aot_cache.stats()
        assert st["disk_hits"] == 1 and st["compiles"] == 1

    def test_mixed_kwargs_and_statics(self, cache_dir):
        params = {"w": jnp.eye(4)}
        x = jnp.ones((2, 4))
        y = jnp.full((2, 4), 0.5)
        ref = _toy(params, x, 3, y)
        # same call through different positional/keyword mixes
        a = aot_call(_toy, params, x, 3, y)
        b = aot_call(_toy, params, x, y=y, n=3)
        c = aot_call(_toy, params, x=x, n=3, y=y)
        for out in (a, b, c):
            np.testing.assert_allclose(out, ref, rtol=1e-6)
        # one compile: the signature binding canonicalizes the call
        assert aot_cache.stats()["compiles"] == 1

    def test_distinct_statics_distinct_executables(self, cache_dir):
        params = {"w": jnp.eye(4)}
        x = jnp.ones((2, 4))
        y = jnp.zeros((2, 4))
        aot_call(_toy, params, x, 1, y)
        aot_call(_toy, params, x, 2, y)
        assert aot_cache.stats()["compiles"] == 2

    def test_engine_through_cache(self, cache_dir):
        """The continuous engine's jit programs route through aot_call:
        a fresh-process simulation must decode identically from disk
        hits alone."""
        from dataclasses import replace

        from whisper_ipa_tpu.config import CONFIGS
        from whisper_ipa_tpu.models import init_params
        from whisper_ipa_tpu.serve_continuous import ContinuousBatcher
        from whisper_ipa_tpu.tokenizer import get_tokenizer

        cfg = replace(
            CONFIGS["test-tiny"],
            n_audio_state=32, n_audio_head=2, n_audio_layer=1,
            n_text_state=32, n_text_head=2, n_text_layer=1, n_text_ctx=24,
        )
        params = init_params(cfg, seed=0)
        tok = get_tokenizer(multilingual=True, language="en")
        audio = (
            np.random.default_rng(0).standard_normal(16000)
            .astype(np.float32) * 0.1
        )

        def run():
            eng = ContinuousBatcher(
                params, cfg, slots=2, max_new_tokens=6,
                steps_per_sync=2, language="en", tokenizer=tok,
            )
            try:
                return eng.transcribe(audio, timeout=600)["tokens"]
            finally:
                eng.close()

        t1 = run()
        n_compiles = aot_cache.stats()["compiles"]
        assert n_compiles >= 3  # encode, cross-kv, scatter, join, chunk

        aot_cache._fast.clear()  # fresh-process simulation
        t2 = run()
        assert t2 == t1
        assert aot_cache.stats()["compiles"] == n_compiles  # disk only

    def test_fast_disk_serves_without_lowering(self, cache_dir):
        """WHISPER_IPA_TPU_AOT_FAST_DISK: a warm process must be served
        from the pre-trace key alone (fast_disk_hits increments only on
        the branch that returns BEFORE jitted.lower runs)."""
        params = {"w": jnp.eye(4)}
        x = jnp.ones((2, 4))
        y = jnp.zeros((2, 4))
        aot_cache.set_fast_disk(True)
        try:
            ref = _toy(params, x, 2, y)
            out1 = aot_call(_toy, params, x, 2, y)
            np.testing.assert_allclose(out1, ref, rtol=1e-6)
            files = sorted(os.listdir(cache_dir))
            # exact key + fk_ mirror (hardlinked)
            assert any(f.startswith("fk_") for f in files)
            assert sum(f.endswith(".jaxexec") for f in files) == 2

            aot_cache._fast.clear()  # fresh-process simulation
            out2 = aot_call(_toy, params, x, 2, y)
            np.testing.assert_allclose(out2, ref, rtol=1e-6)
            st = aot_cache.stats()
            assert st["fast_disk_hits"] == 1
            assert st["compiles"] == 1 and st["disk_hits"] == 0
        finally:
            aot_cache.set_fast_disk(None)

    def test_fast_disk_requires_vetting(self, cache_dir):
        """An UNVETTED jitted function never uses the pre-trace path even
        with fast-disk globally enabled: no fk_ files, no fast_disk_hits
        — the allowlist keeps a future closure-capturing call site from
        being served a stale signature-compatible executable (ADVICE r4)."""
        params = {"w": jnp.eye(4)}
        x = jnp.ones((2, 4))
        y = jnp.zeros((2, 4))
        aot_cache.set_fast_disk(True)
        try:
            ref = _toy_unvetted(params, x, 2, y)
            out1 = aot_call(_toy_unvetted, params, x, 2, y)
            np.testing.assert_allclose(out1, ref, rtol=1e-6)
            files = sorted(os.listdir(cache_dir))
            assert not any(f.startswith("fk_") for f in files)

            aot_cache._fast.clear()  # fresh-process simulation
            out2 = aot_call(_toy_unvetted, params, x, 2, y)
            np.testing.assert_allclose(out2, ref, rtol=1e-6)
            st = aot_cache.stats()
            assert st["fast_disk_hits"] == 0
            assert st["disk_hits"] == 1 and st["compiles"] == 1
        finally:
            aot_cache.set_fast_disk(None)

    def test_fast_disk_non_program_env_transfers(self, cache_dir,
                                                 monkeypatch):
        """Pre-trace keys warmed under driver/bench control env vars
        (e.g. WHISPER_IPA_TPU_NO_QUEUE_WAIT=1, set by the measurement
        queue) must HIT in a process without them — those vars shape no
        traced program (ADVICE r4)."""
        params = {"w": jnp.eye(4)}
        x = jnp.ones((2, 4))
        y = jnp.zeros((2, 4))
        aot_cache.set_fast_disk(True)
        try:
            monkeypatch.setenv("WHISPER_IPA_TPU_NO_QUEUE_WAIT", "1")
            aot_call(_toy, params, x, 2, y)  # warm under the queue env
            monkeypatch.delenv("WHISPER_IPA_TPU_NO_QUEUE_WAIT")

            aot_cache._fast.clear()  # fresh serve-process simulation
            aot_call(_toy, params, x, 2, y)
            st = aot_cache.stats()
            assert st["fast_disk_hits"] == 1 and st["compiles"] == 1
        finally:
            aot_cache.set_fast_disk(None)

    def test_fast_disk_key_tracks_env_and_policy(self, cache_dir,
                                                 monkeypatch):
        """Anything that can change the traced program must change the
        pre-trace key: WHISPER_IPA_TPU_* env vars and the programmatic
        kernel-policy setters both invalidate."""
        from whisper_ipa_tpu.models import layers

        params = {"w": jnp.eye(4)}
        x = jnp.ones((2, 4))
        y = jnp.zeros((2, 4))
        aot_cache.set_fast_disk(True)
        try:
            aot_call(_toy, params, x, 2, y)
            aot_cache._fast.clear()

            monkeypatch.setenv("WHISPER_IPA_TPU_TEST_KNOB", "on")
            aot_call(_toy, params, x, 2, y)
            st = aot_cache.stats()
            # env changed -> fast key missed -> exact disk key still hits
            assert st["fast_disk_hits"] == 0 and st["disk_hits"] == 1
            monkeypatch.delenv("WHISPER_IPA_TPU_TEST_KNOB")

            aot_cache._fast.clear()
            layers.use_merged_attention(True)
            try:
                aot_call(_toy, params, x, 2, y)
            finally:
                layers.use_merged_attention(False)
            st = aot_cache.stats()
            assert st["fast_disk_hits"] == 0 and st["disk_hits"] == 2
            assert st["compiles"] == 1  # never recompiled anything
        finally:
            aot_cache.set_fast_disk(None)

    def test_decode_through_cache(self, cache_dir):
        """End-to-end: the greedy decode path runs through aot_call."""
        from dataclasses import replace

        from whisper_ipa_tpu.config import CONFIGS
        from whisper_ipa_tpu.decode import DecodingOptions, decode
        from whisper_ipa_tpu.models import init_params
        from whisper_ipa_tpu.tokenizer import get_tokenizer

        cfg = replace(CONFIGS["test-tiny"], n_audio_ctx=32, n_text_ctx=32)
        params = init_params(cfg, seed=0)
        tok = get_tokenizer(multilingual=True, language="en")
        rng = np.random.default_rng(0)
        mel = jnp.asarray(
            rng.standard_normal((2, 64, cfg.n_mels)).astype(np.float32)
        )
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=4
        )
        r1 = decode(params, cfg, mel, opts, tokenizer=tok)
        assert aot_cache.stats()["compiles"] >= 1
        n_compiles = aot_cache.stats()["compiles"]

        aot_cache._fast.clear()  # fresh-process simulation
        r2 = decode(params, cfg, mel, opts, tokenizer=tok)
        assert [r.tokens for r in r1] == [r.tokens for r in r2]
        assert aot_cache.stats()["compiles"] == n_compiles  # disk hits only
