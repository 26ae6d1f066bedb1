"""Device decode op parity."""

import random
import string

import pytest

from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.oracle import decode_bytes, encode_ranks
from tekken_tpu.ops.decode import DeviceDecoder


@pytest.fixture(scope="module")
def tok():
    return build_synthetic_tokenizer(num_merges=300)


def test_device_decode_round_trip(tok):
    dd = DeviceDecoder(tok, capacity=4096)
    rng = random.Random(9)
    alpha = string.ascii_letters + " .,!'\n中é"
    for _ in range(25):
        t = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 150)))
        ranks = encode_ranks(t, tok.ranks)
        got = dd.decode_ranks(ranks)
        assert got == decode_bytes(ranks, tok.decode_table)
        assert got == t.encode("utf-8"), repr(t)


def test_device_decode_empty_and_capacity(tok):
    dd = DeviceDecoder(tok, capacity=64)
    assert dd.decode_ranks([]) == b""
    with pytest.raises(ValueError, match="exceed capacity"):
        dd.decode_ranks(list(range(100)))
