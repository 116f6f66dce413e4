"""Mesh/distributed helper tests on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_ipa_tpu.parallel import (
    batch_sharding,
    global_batch_from_local,
    local_shard_indices,
    make_mesh,
    param_shardings,
    process_info,
    replicate,
    shard_params,
    spec_for_param,
)
from jax.sharding import PartitionSpec as P


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh()
        assert mesh.shape == {"data": 8, "model": 1}
        mesh2 = make_mesh(model=2)
        assert mesh2.shape == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            make_mesh(model=3)

    def test_single_device_mesh_none(self):
        mesh = make_mesh(devices=jax.devices()[:1])
        assert mesh is None

    def test_tp_rules(self):
        assert spec_for_param("decoder.blocks.0.attn.query.w") == P(None, "model")
        assert spec_for_param("decoder.blocks.3.mlp2.w") == P("model", None)
        assert spec_for_param("decoder.blocks.0.attn_ln.g") == P()
        assert spec_for_param("encoder.conv1.w") == P()

    def test_replicate_and_shard(self):
        mesh = make_mesh()
        x = jnp.ones((8, 4))
        xs = jax.device_put(x, batch_sharding(mesh, 2))
        assert xs.sharding.spec == P("data", None)
        tree = {"a": jnp.ones((4, 4))}
        rt = replicate(mesh, tree)
        assert rt["a"].sharding.spec == P()

    def test_shard_params_tp(self):
        from dataclasses import replace

        from whisper_ipa_tpu.config import CONFIGS
        from whisper_ipa_tpu.models import init_params

        cfg = replace(CONFIGS["test-tiny"], n_audio_ctx=16, n_text_ctx=16)
        params = init_params(cfg, seed=0)
        mesh = make_mesh(model=2)
        sharded = shard_params(mesh, params, tensor_parallel=True)
        q = sharded["decoder"]["blocks"][0]["attn"]["query"]["w"]
        assert q.sharding.spec == P(None, "model")


class TestDistributed:
    def test_process_info_single(self):
        info = process_info()
        assert info["process_count"] == 1
        assert info["global_device_count"] == 8

    def test_local_shard_indices_single_host(self):
        idx = local_shard_indices(10)
        assert idx == list(range(10))

    def test_global_batch_from_local(self):
        mesh = make_mesh()
        local = np.arange(16, dtype=np.float32).reshape(8, 2)
        arr = global_batch_from_local(mesh, local)
        assert arr.shape == (8, 2)
        np.testing.assert_array_equal(np.asarray(arr), local)


class TestTensorParallelInference:
    def test_tp_sharded_decode(self):
        """Greedy decode with TP-sharded params over the virtual mesh."""
        from dataclasses import replace

        import jax.numpy as jnp

        from whisper_ipa_tpu.config import CONFIGS
        from whisper_ipa_tpu.decode import DecodingOptions, decode
        from whisper_ipa_tpu.models import init_params
        from whisper_ipa_tpu.tokenizer import get_tokenizer

        cfg = replace(CONFIGS["test-tiny"], n_audio_ctx=32, n_text_ctx=32)
        params = init_params(cfg, seed=0)
        mesh = make_mesh(model=2)
        sharded = shard_params(mesh, params, tensor_parallel=True)

        tok = get_tokenizer(multilingual=True, language="en")
        rng = np.random.default_rng(0)
        mel = jnp.asarray(
            rng.standard_normal((2, 64, cfg.n_mels)).astype(np.float32)
        )
        plain = decode(
            params,
            cfg,
            mel,
            DecodingOptions(
                language="en", without_timestamps=True, sample_len=4
            ),
            tokenizer=tok,
        )
        tp = decode(
            sharded,
            cfg,
            mel,
            DecodingOptions(
                language="en", without_timestamps=True, sample_len=4
            ),
            tokenizer=tok,
        )
        # TP-sharded execution must produce the same tokens
        assert [r.tokens for r in tp] == [r.tokens for r in plain]

    def test_tp_sharded_decode_int8_kv(self):
        """TP-sharded decode with the int8 head-split cross-KV cache: GSPMD
        must propagate the model-axis sharding through quantization and the
        head-split attention (multi-chip serving path)."""
        from dataclasses import replace

        import jax.numpy as jnp

        from whisper_ipa_tpu.config import CONFIGS
        from whisper_ipa_tpu.decode import DecodingOptions, decode
        from whisper_ipa_tpu.models import init_params
        from whisper_ipa_tpu.tokenizer import get_tokenizer

        cfg = replace(CONFIGS["test-tiny"], n_audio_ctx=32, n_text_ctx=32)
        params = init_params(cfg, seed=0)
        mesh = make_mesh(model=2)
        sharded = shard_params(mesh, params, tensor_parallel=True)

        tok = get_tokenizer(multilingual=True, language="en")
        rng = np.random.default_rng(0)
        mel = jnp.asarray(
            rng.standard_normal((2, 64, cfg.n_mels)).astype(np.float32)
        )
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=4,
            kv_int8=True,
        )
        plain = decode(params, cfg, mel, opts, tokenizer=tok)
        tp = decode(sharded, cfg, mel, opts, tokenizer=tok)
        assert [r.tokens for r in tp] == [r.tokens for r in plain]
