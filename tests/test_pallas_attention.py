"""Fused attention kernel: numerical equivalence vs the XLA path."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_ipa_tpu.ops.attention import fused_attention


def reference_attention(q, k, v):
    logits = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64)
    logits -= logits.max(axis=-1, keepdims=True)
    w = np.exp(logits)
    w /= w.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("tq,tk", [(128, 128), (256, 300), (130, 257)])
def test_matches_reference(tq, tk):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 3, tq, 64)).astype(np.float32) * 0.3
    k = rng.standard_normal((2, 3, tk, 64)).astype(np.float32) * 0.3
    v = rng.standard_normal((2, 3, tk, 64)).astype(np.float32)
    ref = reference_attention(q, k, v)
    out = np.asarray(
        fused_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True
        )
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-5


def test_padded_keys_ignored():
    """Output must not depend on positions beyond Tk (padding masked)."""
    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, 1, 128, 64)).astype(np.float32)
    k = rng.standard_normal((1, 1, 100, 64)).astype(np.float32)
    v = rng.standard_normal((1, 1, 100, 64)).astype(np.float32)
    out = np.asarray(
        fused_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True
        )
    )
    ref = reference_attention(q, k, v)
    assert np.max(np.abs(out - ref)) < 2e-5


class TestFusedAttentionVJP:
    def test_grad_matches_xla_path(self):
        """fused_attention is differentiable (custom VJP recomputes through
        XLA) — the bf16 train step hits this since fused became AUTO."""
        import jax
        import jax.numpy as jnp

        from whisper_ipa_tpu.ops.attention import (
            _xla_attention,
            fused_attention,
        )

        rng = np.random.default_rng(0)
        q, k, v = [
            jnp.asarray(rng.standard_normal((1, 2, 128, 8)).astype(np.float32))
            for _ in range(3)
        ]
        f = lambda q, k, v: jnp.sum(fused_attention(q, k, v, interpret=True) ** 2)  # noqa: E731
        g = lambda q, k, v: jnp.sum(_xla_attention(q, k, v) ** 2)  # noqa: E731
        ga = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gb = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(ga, gb):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-5

    @pytest.mark.parametrize(
        "tq,tk",
        [
            (130, 257),  # partial q block + padded keys
            (1100, 300),  # 3 q blocks: dk/dv accumulate across revisits
        ],
    )
    def test_flash_bwd_kernel_matches_xla(self, tq, tk):
        """The Pallas backward kernel (interpret) == the XLA VJP on
        partial blocks, padded keys, and multi-block accumulation."""
        import jax
        import jax.numpy as jnp

        from whisper_ipa_tpu.ops.attention import (
            _flash_attention_bwd_impl,
            _xla_attention,
        )

        rng = np.random.default_rng(3)
        q = jnp.asarray(
            rng.standard_normal((1, 2, tq, 8)).astype(np.float32) * 0.3
        )
        k = jnp.asarray(
            rng.standard_normal((1, 2, tk, 8)).astype(np.float32) * 0.3
        )
        v = jnp.asarray(rng.standard_normal((1, 2, tk, 8)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((1, 2, tq, 8)).astype(np.float32))

        scale = 8 ** -0.5
        got = _flash_attention_bwd_impl(q, k, v, g, scale, interpret=True)
        _, vjp = jax.vjp(
            lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v
        )
        want = vjp(g)
        for name, a, b in zip("qkv", got, want):
            err = float(jnp.max(jnp.abs(a - b)))
            ref = float(jnp.max(jnp.abs(b))) + 1e-6
            assert err / ref < 1e-5, (name, err, ref)

    def test_grad_under_stop_gradient(self):
        """stop_gradient over the fused output must not error (the frozen-
        encoder regime that broke on TPU before the custom VJP)."""
        import jax
        import jax.numpy as jnp

        from whisper_ipa_tpu.ops.attention import fused_attention

        rng = np.random.default_rng(1)
        q, k, v = [
            jnp.asarray(rng.standard_normal((1, 1, 128, 8)).astype(np.float32))
            for _ in range(3)
        ]

        def loss(q):
            out = jax.lax.stop_gradient(fused_attention(q, k, v, interpret=True))
            return jnp.sum(out * 0.0) + jnp.sum(q)

        g = jax.grad(loss)(q)
        assert g.shape == q.shape


class TestDecodeCrossAttentionKernel:
    def test_kernel_matches_xla_path(self):
        """T-minor Pallas decode kernel (interpret mode) == the XLA int8
        einsum path (models/layers.multi_head_attention_int8kv math)."""
        import jax
        import jax.numpy as jnp

        from whisper_ipa_tpu.ops.decode_attention import (
            decode_cross_attention_int8_tminor,
        )

        rng = np.random.default_rng(0)
        B, H, T, Dh = 2, 3, 256, 64
        q = jnp.asarray(
            rng.standard_normal((B, H, 1, Dh)).astype(np.float32)
        )
        k8 = jnp.asarray(rng.integers(-127, 128, (B, H, Dh, T)), jnp.int8)
        v8 = jnp.asarray(rng.integers(-127, 128, (B, H, Dh, T)), jnp.int8)
        ks = rng.uniform(0.001, 0.02, (B, H, T)).astype(np.float32)
        vs = rng.uniform(0.001, 0.02, (B, H, T)).astype(np.float32)
        # tile-padding positions carry scale 0 == masked
        ks[:, :, 200:] = 0.0
        ks, vs = jnp.asarray(ks), jnp.asarray(vs)

        got = decode_cross_attention_int8_tminor(
            q, k8, ks, v8, vs, interpret=True
        )

        logits = jnp.einsum(
            "bhsd,bhdt->bhst", q, k8.astype(jnp.float32)
        ).astype(jnp.float32)
        logits = jnp.where(
            ks[:, :, None, :] > 0.0, logits * ks[:, :, None, :], -jnp.inf
        )
        w = jax.nn.softmax(logits, axis=-1) * vs[:, :, None, :]
        want = jnp.einsum("bhst,bhdt->bhsd", w, v8.astype(jnp.float32))

        assert got.shape == (B, H, 1, Dh)
        assert float(jnp.max(jnp.abs(got - want))) < 1e-4

    def test_int4_kernel_matches_xla_path(self):
        """Fused int4 decode kernel (interpret mode) == the XLA
        nibble-plane path (_mha_int4kv) on the same packed cache."""
        import jax.numpy as jnp

        from whisper_ipa_tpu.models import layers
        from whisper_ipa_tpu.ops.decode_attention import (
            decode_cross_attention_int4_tminor,
        )

        rng = np.random.default_rng(2)
        B, H, T, Dh = 2, 3, 256, 16  # T2 = 128 (kernel minimum)
        qh = jnp.asarray(
            rng.standard_normal((B, H, 1, Dh)).astype(np.float32)
        )
        codes = rng.integers(-7, 8, (B, H, Dh, T)).astype(np.int8)
        lo, hi = codes[..., 0::2], codes[..., 1::2]
        packed = ((lo & 0xF) | (hi << 4)).astype(np.int8)
        k_p4 = jnp.asarray(packed)
        v_p4 = jnp.asarray(np.roll(packed, 1, axis=0))
        ks = rng.uniform(0.01, 0.2, (B, H, T)).astype(np.float32)
        vs = rng.uniform(0.01, 0.2, (B, H, T)).astype(np.float32)
        ks[:, :, 200:] = 0.0  # tile padding == masked
        ks, vs = jnp.asarray(ks), jnp.asarray(vs)

        got = decode_cross_attention_int4_tminor(
            qh, k_p4, ks, v_p4, vs, interpret=True
        )
        assert got.shape == (B, H, 1, Dh)
        got = layers._merge_heads(got)
        prev = layers._DECODE_KERNEL
        try:
            layers.use_decode_kernel(False)  # force the XLA plane path
            want = layers._mha_int4kv(qh, k_p4, ks, v_p4, vs)
        finally:
            layers._DECODE_KERNEL = prev
        assert got.shape == want.shape
        assert float(jnp.max(jnp.abs(got - want))) < 1e-4

    def test_layers_dispatch_matches_einsum(self):
        """multi_head_attention_int8kv with the kernel forced ON equals
        the einsum path on the same quantized cache."""
        import jax.numpy as jnp

        from whisper_ipa_tpu.models import layers

        rng = np.random.default_rng(1)
        B, H, T, Dh = 2, 2, 128, 8
        d = H * Dh
        q = jnp.asarray(rng.standard_normal((B, 1, d)).astype(np.float32))
        k8 = jnp.asarray(rng.integers(-127, 128, (B, H, Dh, T)), jnp.int8)
        v8 = jnp.asarray(rng.integers(-127, 128, (B, H, Dh, T)), jnp.int8)
        ks = jnp.asarray(
            rng.uniform(0.001, 0.02, (B, H, T)).astype(np.float32)
        )
        vs = jnp.asarray(
            rng.uniform(0.001, 0.02, (B, H, T)).astype(np.float32)
        )
        want = layers.multi_head_attention_int8kv(q, k8, ks, v8, vs, H)
        prev = layers._DECODE_KERNEL
        try:
            layers.use_decode_kernel(True)
            got = layers.multi_head_attention_int8kv(
                q, k8, ks, v8, vs, H, interpret=True
            )
        finally:
            layers._DECODE_KERNEL = prev
        assert float(jnp.max(jnp.abs(got - want))) < 1e-4


class TestMergedAttention:
    """Head-merged kernel I/O (fused_attention_merged): (B, T, d) in/out."""

    def _merged_ref(self, q, k, v, n_head, scale):
        b, tq, d = q.shape
        dh = d // n_head

        def split(x):
            return x.reshape(b, -1, n_head, dh).transpose(0, 2, 1, 3)

        ref = reference_attention(
            split(q * scale), split(k * scale), split(v)
        )
        return ref.transpose(0, 2, 1, 3).reshape(b, tq, d)

    @pytest.mark.parametrize("tq,tk,n_head", [(256, 256, 4), (130, 257, 2)])
    def test_matches_reference(self, tq, tk, n_head):
        from whisper_ipa_tpu.ops.attention import fused_attention_merged

        d = 64 * n_head
        rng = np.random.default_rng(2)
        q = rng.standard_normal((2, tq, d)).astype(np.float32) * 0.3
        k = rng.standard_normal((2, tk, d)).astype(np.float32) * 0.3
        v = rng.standard_normal((2, tk, d)).astype(np.float32)
        s4 = 64 ** -0.25  # per-operand scale, total dh**-0.5 on logits
        out = np.asarray(
            fused_attention_merged(
                jnp.asarray(q * s4), jnp.asarray(k * s4),
                jnp.asarray(v), n_head, interpret=True,
            )
        )
        ref = self._merged_ref(q, k, v, n_head, s4)
        assert out.shape == ref.shape
        assert np.max(np.abs(out - ref)) < 2e-5

    def test_in_kernel_scale(self):
        """scale folded into the kernel's q block == pre-scaled inputs."""
        from whisper_ipa_tpu.ops.attention import fused_attention_merged

        rng = np.random.default_rng(3)
        q = rng.standard_normal((1, 130, 128)).astype(np.float32)
        k = rng.standard_normal((1, 200, 128)).astype(np.float32)
        v = rng.standard_normal((1, 200, 128)).astype(np.float32)
        s = 64 ** -0.5
        a = np.asarray(
            fused_attention_merged(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 2,
                scale=s, interpret=True,
            )
        )
        b = np.asarray(
            fused_attention_merged(
                jnp.asarray(q * s), jnp.asarray(k), jnp.asarray(v), 2,
                interpret=True,
            )
        )
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_grad_matches_xla(self):
        """The custom VJP (flash backward on split heads) == XLA grads."""
        import jax

        from whisper_ipa_tpu.ops.attention import (
            _xla_attention,
            fused_attention_merged,
        )

        rng = np.random.default_rng(4)
        n_head, d = 2, 128
        q = jnp.asarray(rng.standard_normal((1, 136, d)), jnp.float32) * 0.3
        k = jnp.asarray(rng.standard_normal((1, 150, d)), jnp.float32) * 0.3
        v = jnp.asarray(rng.standard_normal((1, 150, d)), jnp.float32)

        def split(x):
            return x.reshape(1, -1, n_head, 64).transpose(0, 2, 1, 3)

        def merge(x):
            return x.transpose(0, 2, 1, 3).reshape(1, -1, d)

        def f_merged(q, k, v):
            return (
                fused_attention_merged(q, k, v, n_head, interpret=True)
                ** 2
            ).sum()

        def f_xla(q, k, v):
            return (
                merge(_xla_attention(split(q), split(k), split(v))) ** 2
            ).sum()

        g_m = jax.grad(f_merged, argnums=(0, 1, 2))(q, k, v)
        g_x = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_m, g_x):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4
            )

    def test_layers_dispatch(self, monkeypatch):
        """use_merged_attention routes multi_head_attention through the
        merged kernel with output matching the einsum core."""
        import whisper_ipa_tpu.models.layers as L

        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.float32)
        ref = np.asarray(L.multi_head_attention(q, k, v, 2))

        # force the merged path through interpret mode (CPU test env)
        from whisper_ipa_tpu.ops import attention as A

        orig = A.fused_attention_merged

        def merged_interpret(q, k, v, n_head, scale=1.0, interpret=False):
            return orig(q, k, v, n_head, scale, True)

        monkeypatch.setattr(A, "fused_attention_merged", merged_interpret)
        monkeypatch.setattr(L, "_fused_eligible", lambda q, mask: mask is None)
        L.use_merged_attention(True)
        try:
            out = np.asarray(L.multi_head_attention(q, k, v, 2))
        finally:
            L.use_merged_attention(False)
        assert np.max(np.abs(out - ref)) < 2e-5
