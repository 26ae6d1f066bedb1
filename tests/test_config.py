"""Config / model-file layer tests (reference schema: src/config.rs:73-82)."""

import base64

import pytest

from tekken_tpu import (
    InvalidConfigError,
    JsonError,
    ModelData,
    TokenizerVersion,
)
from tekken_tpu.config import parse_version
from tekken_tpu.models import build_synthetic_model_data
from tekken_tpu.vocab import reload_mergeable_ranks
from tekken_tpu.config import TokenInfo


def test_version_from_string():
    assert TokenizerVersion.from_string("v3") is TokenizerVersion.V3
    assert TokenizerVersion.from_string("v7") is TokenizerVersion.V7
    assert TokenizerVersion.from_string("v11") is TokenizerVersion.V11
    assert TokenizerVersion.from_string("v13") is TokenizerVersion.V13
    assert TokenizerVersion.from_string("invalid") is None
    assert TokenizerVersion.V7.as_str() == "v7"


def test_parse_version_raises_on_unknown():
    with pytest.raises(InvalidConfigError, match="Unknown version"):
        parse_version("v99")


def test_model_data_json_round_trip():
    md = build_synthetic_model_data(num_merges=10, with_audio=True,
                                    chunk_length_s=1.0)
    text = md.to_json()
    md2 = ModelData.from_json(text)
    assert len(md2.vocab) == len(md.vocab)
    assert md2.config.version == "v7"
    assert md2.special_tokens is not None
    assert md2.audio is not None
    assert md2.audio.sampling_rate == 16000
    assert md2.audio.chunk_length_s == 1.0


def test_model_data_missing_special_tokens_is_none():
    md = build_synthetic_model_data(num_merges=0)
    md.special_tokens = None
    md2 = ModelData.from_json(md.to_json())
    assert md2.special_tokens is None


def test_model_data_malformed_json():
    with pytest.raises(JsonError):
        ModelData.from_json("{not json")
    with pytest.raises(JsonError):
        ModelData.from_json('{"vocab": []}')  # missing config


def _tok(rank, data: bytes):
    return TokenInfo(rank=rank, token_bytes=base64.b64encode(data).decode(),
                     token_str=None)


def test_reload_mergeable_ranks_byte_identity():
    # rank < 256 must be the single byte [rank] (reference: src/tekkenizer.rs:792-798)
    vocab = [_tok(i, bytes([i])) for i in range(256)]
    vocab[5] = _tok(5, b"xx")
    with pytest.raises(InvalidConfigError, match="byte token"):
        reload_mergeable_ranks(vocab, 256)


def test_reload_mergeable_ranks_contiguity():
    # rank set must be exactly 0..len (reference: src/tekkenizer.rs:804-813)
    vocab = [_tok(i, bytes([i])) for i in range(256)]
    vocab.append(_tok(300, b"ab"))  # gap: rank 300 with only 257 entries
    with pytest.raises(InvalidConfigError, match="not contiguous"):
        reload_mergeable_ranks(vocab, 512)


def test_reload_mergeable_ranks_truncation():
    # vocab longer than max_vocab is silently truncated
    # (reference: src/tekkenizer.rs:780-784)
    vocab = [_tok(i, bytes([i])) for i in range(256)]
    vocab.append(_tok(256, b"ab"))
    ranks = reload_mergeable_ranks(vocab, 256)
    assert len(ranks) == 256
    assert b"ab" not in ranks
