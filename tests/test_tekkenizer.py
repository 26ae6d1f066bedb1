"""Tokenizer core behavior (mirrors reference tests/test_small_vocab.rs,
test_tekken.rs, test_tokenizer_detailed.rs, test_integration.rs semantics,
run against synthetic vocabularies)."""

import pytest

from tekken_tpu import (
    InvalidConfigError,
    SpecialTokenPolicy,
    SpecialTokenPolicyError,
    TokenNotFoundError,
    Tekkenizer,
    TokenizerVersion,
)
from tekken_tpu.models import build_synthetic_model_data, build_synthetic_tokenizer
from tekken_tpu.special_tokens import SpecialTokenInfo
from tekken_tpu.config import parse_version


# --------------------------------------------------------------------- #
# constructor validation (reference: src/tekkenizer.rs:80-116)
# --------------------------------------------------------------------- #

def _base_kwargs(md):
    return dict(
        vocab=md.vocab,
        special_tokens=md.special_tokens,
        pattern=md.config.pattern,
        vocab_size=md.config.default_vocab_size,
        num_special_tokens=md.config.default_num_special_tokens,
        version=parse_version(md.config.version),
        audio_config=md.audio,
    )


def test_vocab_size_validation():
    md = build_synthetic_model_data(num_merges=0, num_special_tokens=10)
    kw = _base_kwargs(md)
    kw["vocab_size"] = len(md.vocab) + 10 + 1  # one too many
    with pytest.raises(InvalidConfigError, match="vocab_size"):
        Tekkenizer(**kw)


def test_duplicate_special_tokens_rejected():
    md = build_synthetic_model_data(num_merges=0, num_special_tokens=10)
    kw = _base_kwargs(md)
    kw["special_tokens"] = list(md.special_tokens) + [
        SpecialTokenInfo(rank=9, token_str="<s>", is_control=True)]
    with pytest.raises(InvalidConfigError, match="Duplicate special token"):
        Tekkenizer(**kw)


def test_too_many_special_tokens_rejected():
    md = build_synthetic_model_data(num_merges=0, num_special_tokens=10)
    kw = _base_kwargs(md)
    kw["num_special_tokens"] = 3  # fewer than the 6 named specials
    kw["vocab_size"] = len(md.vocab) + 3
    with pytest.raises(InvalidConfigError, match="special_tokens"):
        Tekkenizer(**kw)


def test_special_filler_tokens(small_tokenizer):
    # missing special slots filled with <SPECIAL_i>
    # (reference: src/tekkenizer.rs:108-116)
    vocab = small_tokenizer.vocab()
    assert vocab[6] == "<SPECIAL_6>"
    assert vocab[9] == "<SPECIAL_9>"
    assert small_tokenizer.get_control_token("<SPECIAL_7>") == 7


def test_metadata(small_tokenizer):
    assert small_tokenizer.vocab_size() == 256 + 10
    assert small_tokenizer.num_special_tokens() == 10
    assert small_tokenizer.version() is TokenizerVersion.V7


# --------------------------------------------------------------------- #
# control tokens (reference: src/tekkenizer.rs:286-341)
# --------------------------------------------------------------------- #

def test_control_token_ids(small_tokenizer):
    assert small_tokenizer.unk_id() == 0
    assert small_tokenizer.bos_id() == 1
    assert small_tokenizer.eos_id() == 2
    assert small_tokenizer.pad_id() == 5


def test_unknown_control_token_error_lists_available(small_tokenizer):
    with pytest.raises(TokenNotFoundError) as ei:
        small_tokenizer.get_control_token("<nope>")
    msg = str(ei.value)
    assert "Unknown control token: '<nope>'" in msg
    assert "Available special tokens" in msg
    assert "<s>" in msg


# --------------------------------------------------------------------- #
# encode/decode round trips (reference: tests/test_tekken.rs:14-38,89-156)
# --------------------------------------------------------------------- #

ROUND_TRIP_CASES = [
    "Hello, world!",
    "The quick brown fox jumps over the lazy dog.",
    "",
    "a",
    " ",
    "   whitespace   handling   ",
    "tab\there",
    "line1\nline2\r\nline3",
    "\n\n\n",
    "ASCII and 中文 and Русский and العربية",
    "emoji \U0001f600\U0001f680\U0001f30d test",
    "null\x00byte",
    "a" * 1000,
    "it's don't we've I'm they'll she'd",
    "123 4567 89 0",
    "mixed 123abc!@# éèê",
]


@pytest.mark.parametrize("text", ROUND_TRIP_CASES)
def test_round_trip(merged_tokenizer, text):
    tokens = merged_tokenizer.encode(text, False, False)
    decoded = merged_tokenizer.decode(tokens, SpecialTokenPolicy.IGNORE)
    assert decoded == text


@pytest.mark.parametrize("text", ROUND_TRIP_CASES)
def test_round_trip_byte_vocab(small_tokenizer, text):
    tokens = small_tokenizer.encode(text, False, False)
    decoded = small_tokenizer.decode(tokens, SpecialTokenPolicy.IGNORE)
    assert decoded == text


def test_bos_eos_placement(merged_tokenizer):
    # (reference: tests/test_tokenizer_detailed.rs:305-323)
    tokens = merged_tokenizer.encode("hello", True, True)
    assert tokens[0] == merged_tokenizer.bos_id()
    assert tokens[-1] == merged_tokenizer.eos_id()
    inner = merged_tokenizer.encode("hello", False, False)
    assert tokens == [merged_tokenizer.bos_id()] + inner + [merged_tokenizer.eos_id()]


def test_encode_shift(small_tokenizer):
    # every rank shifted up by num_special_tokens (reference: src/tekkenizer.rs:390-392)
    tokens = small_tokenizer.encode("A", False, False)
    assert tokens == [ord("A") + 10]


# --------------------------------------------------------------------- #
# policy semantics (reference: tests/test_tekken.rs:53-86)
# --------------------------------------------------------------------- #

def test_policy_keep(merged_tokenizer):
    tokens = merged_tokenizer.encode("hi", True, True)
    text = merged_tokenizer.decode(tokens, SpecialTokenPolicy.KEEP)
    assert text == "<s>hi</s>"


def test_policy_ignore(merged_tokenizer):
    tokens = merged_tokenizer.encode("hi", True, True)
    assert merged_tokenizer.decode(tokens, SpecialTokenPolicy.IGNORE) == "hi"


def test_policy_raise(merged_tokenizer):
    tokens = merged_tokenizer.encode("hi", True, False)
    with pytest.raises(SpecialTokenPolicyError, match="special tokens"):
        merged_tokenizer.decode(tokens, SpecialTokenPolicy.RAISE)
    # Raise only errors when specials are actually present
    plain = merged_tokenizer.encode("hi", False, False)
    assert merged_tokenizer.decode(plain, SpecialTokenPolicy.RAISE) == "hi"


def test_decode_all_grouping(merged_tokenizer):
    # one element per special token, one per non-special run
    # (reference: src/tekkenizer.rs:463-511,536-540)
    bos, eos = merged_tokenizer.bos_id(), merged_tokenizer.eos_id()
    inner = merged_tokenizer.encode("hello world", False, False)
    parts = merged_tokenizer.decode_all([bos, bos] + inner + [eos],
                                        SpecialTokenPolicy.KEEP)
    assert parts[0] == "<s>"
    assert parts[1] == "<s>"
    assert parts[2] == "hello world"
    assert parts[3] == "</s>"


# --------------------------------------------------------------------- #
# injection safety (reference: tests/test_integration.rs:259-291)
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("text", [
    "<s>", "</s>", "[INST] hi [/INST]", "<pad><unk>", "<SPECIAL_7>",
])
def test_special_token_injection_is_plain_text(merged_tokenizer, text):
    tokens = merged_tokenizer.encode(text, False, False)
    assert all(not merged_tokenizer.is_special_token(t) for t in tokens)
    assert merged_tokenizer.decode(tokens, SpecialTokenPolicy.RAISE) == text


# --------------------------------------------------------------------- #
# id helpers (reference: src/tekkenizer.rs:574-695)
# --------------------------------------------------------------------- #

def test_is_special_and_is_byte(small_tokenizer):
    assert small_tokenizer.is_special_token(0)
    assert small_tokenizer.is_special_token(9)
    assert not small_tokenizer.is_special_token(10)
    assert not small_tokenizer.is_byte(9)
    assert small_tokenizer.is_byte(10)
    assert small_tokenizer.is_byte(10 + 255)
    assert not small_tokenizer.is_byte(10 + 256)


def test_id_to_piece(small_tokenizer):
    assert small_tokenizer.id_to_piece(1) == "<s>"
    assert small_tokenizer.id_to_piece(10 + ord("A")) == "A"
    with pytest.raises(InvalidConfigError, match="out of vocabulary range"):
        small_tokenizer.id_to_piece(small_tokenizer.vocab_size())


def test_id_to_byte_piece_policies(small_tokenizer):
    # special + Keep -> str bytes; Raise -> error; Ignore -> empty
    # (reference: src/tekkenizer.rs:663-674)
    assert small_tokenizer.id_to_byte_piece(1, SpecialTokenPolicy.KEEP) == b"<s>"
    with pytest.raises(SpecialTokenPolicyError):
        small_tokenizer.id_to_byte_piece(1, SpecialTokenPolicy.RAISE)
    assert small_tokenizer.id_to_byte_piece(1, SpecialTokenPolicy.IGNORE) == b""
    assert small_tokenizer.id_to_byte_piece(
        10 + ord("A"), SpecialTokenPolicy.KEEP) == b"A"


def test_id_to_byte_piece_invalid_utf8_lossy_fallback(small_tokenizer):
    # a lone continuation byte (0x80) is invalid UTF-8; the reference falls
    # back to the lossy vocab-string bytes (U+FFFD) —
    # reference: src/tekkenizer.rs:680-694
    result = small_tokenizer.id_to_byte_piece(10 + 0x80, SpecialTokenPolicy.KEEP)
    assert result == "�".encode("utf-8")


def test_decode_group_vs_per_token(merged_tokenizer):
    # full decode equals join of per-token id_to_piece for non-special runs
    # (reference: tests/test_decode_fix.rs:22-46)
    tokens = merged_tokenizer.encode("the quick brown fox", False, False)
    full = merged_tokenizer.decode(tokens, SpecialTokenPolicy.KEEP)
    joined = "".join(merged_tokenizer.id_to_piece(t) for t in tokens)
    assert full == joined


def test_determinism(merged_tokenizer):
    # (reference: tests/test_tokenizer_detailed.rs:205-248)
    text = "Determinism check 123: ümläuts and \U0001f600."
    a = merged_tokenizer.encode(text, True, True)
    for _ in range(3):
        assert merged_tokenizer.encode(text, True, True) == a


# --------------------------------------------------------------------- #
# from_file (reference: src/tekkenizer.rs:222-248)
# --------------------------------------------------------------------- #

def test_from_file_round_trip(tmp_path):
    md = build_synthetic_model_data(num_merges=50, num_special_tokens=12)
    p = tmp_path / "tekken.json"
    p.write_text(md.to_json())
    tok = Tekkenizer.from_file(p)
    assert tok.vocab_size() == md.config.default_vocab_size
    assert tok.version() is TokenizerVersion.V7
    t = tok.encode("hello world", True, True)
    assert tok.decode(t, SpecialTokenPolicy.IGNORE) == "hello world"


def test_from_file_deprecated_specials_fallback(tmp_path):
    # missing special_tokens -> deprecated 20-token table
    # (reference: src/tekkenizer.rs:234-237)
    md = build_synthetic_model_data(num_merges=0, num_special_tokens=20)
    md.special_tokens = None
    p = tmp_path / "tekken.json"
    p.write_text(md.to_json())
    tok = Tekkenizer.from_file(p)
    assert tok.get_control_token("[TOOL_CONTENT]") == 19
    assert tok.bos_id() == 1
    assert tok.pad_id() == 11  # deprecated table has <pad> at rank 11
