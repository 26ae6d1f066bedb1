"""Edge-case semantics pinned by the reference implementation."""

import base64

import pytest

from tekken_tpu import (
    SpecialTokenPolicy,
    Tekkenizer,
    TokenizerVersion,
)
from tekken_tpu.config import TokenInfo
from tekken_tpu.special_tokens import SpecialTokenInfo


def _byte_vocab():
    return [TokenInfo(rank=i,
                      token_bytes=base64.b64encode(bytes([i])).decode(),
                      token_str=None)
            for i in range(256)]


def _specials(n=5):
    names = ["<unk>", "<s>", "</s>", "[INST]", "<pad>"]
    return [SpecialTokenInfo(rank=i, token_str=names[i], is_control=True)
            for i in range(n)]


def test_duplicate_token_bytes_rejected():
    # duplicate byte-strings collapse the rank map and break contiguity
    # (reference: src/tekkenizer.rs:804-813 then errors); note the "<?>"
    # vocab placeholder (src/tekkenizer.rs:152) is unreachable because the
    # size validation + contiguity check preclude missing ranks.
    from tekken_tpu import InvalidConfigError
    vocab = _byte_vocab()
    vocab.append(TokenInfo(rank=256,
                           token_bytes=base64.b64encode(b"ab").decode(),
                           token_str=None))
    vocab.append(TokenInfo(rank=257,
                           token_bytes=base64.b64encode(b"ab").decode(),
                           token_str=None))
    with pytest.raises(InvalidConfigError, match="not contiguous"):
        Tekkenizer(vocab=vocab, special_tokens=_specials(), pattern=".*",
                   vocab_size=268, num_special_tokens=10,
                   version=TokenizerVersion.V7)


def test_multibyte_char_split_across_tokens_decodes_lossy_per_run():
    # a 3-byte char's bytes as individual byte tokens still decode to the
    # char when in ONE run (bytes concatenated before UTF-8)
    tok = Tekkenizer(
        vocab=_byte_vocab(),
        special_tokens=_specials(),
        pattern=".*",
        vocab_size=266,
        num_special_tokens=10,
        version=TokenizerVersion.V7,
    )
    data = "中".encode("utf-8")
    ids = [10 + b for b in data]
    assert tok.decode(ids, SpecialTokenPolicy.IGNORE) == "中"
    # but split across runs by a special token, each run is lossy on its own
    # (run-wise decode -> U+FFFD replacements; reference decode_group joins
    # per run, src/tekkenizer.rs:546-557)
    ids2 = [ids[0], 1, ids[1], ids[2]]
    out = tok.decode(ids2, SpecialTokenPolicy.KEEP)
    assert "<s>" in out
    assert "中" not in out
    assert "�" in out


def test_non_control_special_token_allowed():
    sp = _specials() + [SpecialTokenInfo(rank=5, token_str="[SOFT]",
                                         is_control=False)]
    tok = Tekkenizer(
        vocab=_byte_vocab(),
        special_tokens=sp,
        pattern=".*",
        vocab_size=266,
        num_special_tokens=10,
        version=TokenizerVersion.V7,
    )
    assert tok.get_control_token("[SOFT]") == 5
    assert tok.decode([5], SpecialTokenPolicy.KEEP) == "[SOFT]"


def test_empty_token_list_decodes_empty():
    tok = Tekkenizer(
        vocab=_byte_vocab(), special_tokens=_specials(), pattern=".*",
        vocab_size=266, num_special_tokens=10,
        version=TokenizerVersion.V7)
    assert tok.decode([], SpecialTokenPolicy.RAISE) == ""
    assert tok.decode_all([], SpecialTokenPolicy.KEEP) == []


def test_utf8_structure_all_planes():
    import numpy as np
    from tekken_tpu.ops.pretokenize import byte_char_structure

    text = "aé中\U0001f600z߿￿\U0010ffff"
    data = text.encode("utf-8")
    buf = np.zeros(64, dtype=np.uint8)
    buf[:len(data)] = np.frombuffer(data, dtype=np.uint8)
    import jax.numpy as jnp
    is_lead, cp = byte_char_structure(jnp.asarray(buf), len(data))
    lead_cps = np.asarray(cp)[np.asarray(is_lead)]
    assert lead_cps.tolist() == [ord(c) for c in text]
