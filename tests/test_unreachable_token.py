"""Whole-piece fast-path parity on a vocab with a merge-unreachable token.

The reference's engine returns a piece's own vocab rank before any merging;
a token with no two-token split (unreachable by lowest-rank-first merges)
makes this observable.  Every engine must agree.
"""

import base64

import pytest

from tekken_tpu import Tekkenizer, TokenizerVersion
from tekken_tpu.config import TokenInfo
from tekken_tpu.oracle import encode_ranks
from tekken_tpu.special_tokens import SpecialTokenInfo


@pytest.fixture(scope="module")
def tok():
    vocab = [TokenInfo(rank=i,
                       token_bytes=base64.b64encode(bytes([i])).decode(),
                       token_str=None)
             for i in range(256)]
    # "xyz" has no valid split ("xy"/"yz" absent) — unreachable by merges
    vocab.append(TokenInfo(rank=256,
                           token_bytes=base64.b64encode(b"xyz").decode(),
                           token_str=None))
    sp = [SpecialTokenInfo(rank=0, token_str="<unk>", is_control=True),
          SpecialTokenInfo(rank=1, token_str="<s>", is_control=True),
          SpecialTokenInfo(rank=2, token_str="</s>", is_control=True)]
    return Tekkenizer(vocab=vocab, special_tokens=sp, pattern=".*",
                      vocab_size=267, num_special_tokens=10,
                      version=TokenizerVersion.V7)


def test_oracle(tok):
    assert encode_ranks("xyz", tok.ranks) == [256]
    assert encode_ranks("wxyz", tok.ranks) == [ord("w"), ord("x"), ord("y"),
                                               ord("z")]


def test_device_packed(tok):
    assert tok.encode_batch(["xyz"]) == [[266]]  # +10 specials


def test_native(tok):
    try:
        from tekken_tpu.native import NativeEncoder
        ne = NativeEncoder(tok)
    except Exception:
        pytest.skip("native engine not built")
    assert ne.encode("xyz") == [256]


def test_device_flat(tok):
    from tekken_tpu.ops.flat import FlatEncoder
    enc = FlatEncoder(tok, rows=4, row_len=64)
    assert enc.encode_batch(["xyz", "wxyz"]) == [
        [256], [ord("w"), ord("x"), ord("y"), ord("z")]]


def test_word_map_probe(tok):
    # the packed kernel's whole-piece table must hold the unreachable token
    assert tok.word_map().lookup_host(b"xyz") == 256
