from .bpe import BPE, byte_level_ranks, load_tiktoken_ranks
from .whisper_tokenizer import (
    LANGUAGES,
    LANGUAGES_V3,
    WhisperTokenizer,
    get_tokenizer,
)

__all__ = [
    "BPE",
    "byte_level_ranks",
    "load_tiktoken_ranks",
    "LANGUAGES",
    "LANGUAGES_V3",
    "WhisperTokenizer",
    "get_tokenizer",
]
