"""tekken-tpu: a TPU-native Tekken multimodal tokenizer framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
reference Rust library (jorge-menjivar/tekken-rs): tiktoken-style byte-level
BPE text tokenization over the Tekken vocabulary plus audio tokenization, with
a vectorized device encode path, data-parallel multi-host scale-out over a
``jax.sharding.Mesh``, and a C++ native host engine for the input pipeline.

The public API mirrors the reference's re-export surface
(reference: src/lib.rs:115-127).
"""

from .audio import (
    Audio,
    AudioConfig,
    AudioEncoder,
    AudioEncoding,
    AudioSpectrogramConfig,
    hertz_to_mel,
    mel_filter_bank,
    mel_to_hertz,
)
from .config import (
    ImageConfig,
    ModelData,
    TekkenConfig,
    TokenInfo,
    TokenizerVersion,
)
from .errors import (
    AudioError,
    Base64Error,
    InvalidConfigError,
    IoError,
    JsonError,
    SpecialTokenPolicyError,
    TokenizerError,
    TokenizersError,
    TokenNotFoundError,
    UnsupportedFormatError,
)
from .oracle import TEKKEN_PATTERN
from .special_tokens import (
    SpecialTokenInfo,
    SpecialTokenPolicy,
    SpecialTokens,
    get_deprecated_special_tokens,
)
from .tekkenizer import Tekkenizer

__version__ = "0.1.0"

__all__ = [
    "Audio",
    "AudioConfig",
    "AudioEncoder",
    "AudioEncoding",
    "AudioSpectrogramConfig",
    "hertz_to_mel",
    "mel_filter_bank",
    "mel_to_hertz",
    "ImageConfig",
    "ModelData",
    "TekkenConfig",
    "TokenInfo",
    "TokenizerVersion",
    "AudioError",
    "Base64Error",
    "InvalidConfigError",
    "IoError",
    "JsonError",
    "SpecialTokenPolicyError",
    "TokenizerError",
    "TokenizersError",
    "TokenNotFoundError",
    "UnsupportedFormatError",
    "TEKKEN_PATTERN",
    "SpecialTokenInfo",
    "SpecialTokenPolicy",
    "SpecialTokens",
    "get_deprecated_special_tokens",
    "Tekkenizer",
]
