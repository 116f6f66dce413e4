from .convert import (
    flatten_params,
    load_checkpoint_model,
    load_safetensors_flat,
    overlay_decoder_weights,
    params_from_flat,
    save_safetensors,
    to_mlx_flat,
    unflatten_params,
)
from .whisper import (
    DecoderCache,
    count_parameters,
    decode_step,
    decoder_logits,
    embed_audio,
    encode,
    init_cache,
    init_params,
)

__all__ = [
    "DecoderCache",
    "count_parameters",
    "decode_step",
    "decoder_logits",
    "embed_audio",
    "encode",
    "flatten_params",
    "init_cache",
    "init_params",
    "load_checkpoint_model",
    "load_safetensors_flat",
    "overlay_decoder_weights",
    "params_from_flat",
    "save_safetensors",
    "to_mlx_flat",
    "unflatten_params",
]
