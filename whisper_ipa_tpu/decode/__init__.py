from .beam import beam_decode
from .decoding import (
    DecodingOptions,
    DecodingResult,
    build_blank_mask,
    build_suppress_mask,
    compression_ratio,
    decode,
    initial_tokens,
    sequence_score,
)
from .medusa_tree import medusa_tree_decode
from .speculative import SpeculativeStats, speculative_decode
from .transcribe import chunk_audio, transcribe
from .word_timestamps import phone_timestamps, token_alignment

__all__ = [
    "DecodingOptions",
    "DecodingResult",
    "beam_decode",
    "build_blank_mask",
    "build_suppress_mask",
    "chunk_audio",
    "compression_ratio",
    "decode",
    "initial_tokens",
    "sequence_score",
    "SpeculativeStats",
    "medusa_tree_decode",
    "speculative_decode",
    "transcribe",
    "phone_timestamps",
    "token_alignment",
]
