"""Device decode_batch vs the host per-token loop — including invalid
UTF-8 runs, policy semantics, and empty/edge cases."""

import random

import pytest

from tekken_tpu import SpecialTokenPolicy
from tekken_tpu.errors import SpecialTokenPolicyError, TokenizersError
from tekken_tpu.models import build_synthetic_tokenizer


@pytest.fixture(scope="module")
def tok():
    return build_synthetic_tokenizer(num_merges=300, num_special_tokens=20)


def host_decode(tok, ids, policy):
    return "".join(tok.decode_all(ids, policy))


def test_decode_batch_matches_host_loop(tok):
    rng = random.Random(11)
    ns = tok.num_special_tokens()
    vs = tok.vocab_size()
    lists = []
    for _ in range(32):
        n = rng.randint(0, 60)
        ids = [rng.randrange(0, vs) for _ in range(n)]
        lists.append(ids)
    lists += [[], [0], [ns], [vs - 1], [0, 0, ns, ns + 1, 0]]
    for policy in (SpecialTokenPolicy.KEEP, SpecialTokenPolicy.IGNORE):
        got = tok.decode_batch(lists, policy)
        want = [host_decode(tok, ids, policy) for ids in lists]
        assert got == want


def test_decode_batch_invalid_utf8_runs(tok):
    """Byte tokens that split multibyte chars must produce the same lossy
    U+FFFD output as the host path, per-run."""
    ns = tok.num_special_tokens()
    euro = "€".encode("utf-8")  # 3 bytes
    ids = [ns + b for b in euro[:2]]           # dangling prefix
    ids2 = [ns + euro[0], 1, ns + euro[1], ns + euro[2]]  # split by special
    for policy in (SpecialTokenPolicy.KEEP, SpecialTokenPolicy.IGNORE):
        got = tok.decode_batch([ids, ids2], policy)
        want = [host_decode(tok, ids, policy),
                host_decode(tok, ids2, policy)]
        assert got == want
        assert "�" in got[0]


def test_decode_batch_policy_raise(tok):
    ns = tok.num_special_tokens()
    with pytest.raises(SpecialTokenPolicyError):
        tok.decode_batch([[ns + 1], [0]], SpecialTokenPolicy.RAISE)
    # RAISE without specials present decodes fine
    got = tok.decode_batch([[ns + 65]], SpecialTokenPolicy.RAISE)
    assert got == [host_decode(tok, [ns + 65], SpecialTokenPolicy.RAISE)]


def test_decode_batch_invalid_id(tok):
    with pytest.raises(TokenizersError):
        tok.decode_batch([[tok.vocab_size() + 5]], SpecialTokenPolicy.KEEP)


def test_decode_batch_round_trip(tok):
    texts = ["hello world", "it's a test 123", "中文 mixed", "don't we've",
             "   whitespace   handling   "]
    ids = tok.encode_batch(texts)
    got = tok.decode_batch(ids, SpecialTokenPolicy.IGNORE)
    assert got == texts


def test_device_decoder_stream_chunks(tok):
    """decode_stream chunks exactly at capacity boundaries."""
    import numpy as np

    from tekken_tpu.ops.decode import DeviceDecoder
    from tekken_tpu.oracle import decode_bytes

    dec = DeviceDecoder(tok, capacity=64)
    rng = np.random.RandomState(3)
    ranks = rng.randint(0, len(tok.ranks), size=333).astype(np.int32)
    assert dec.decode_stream(ranks) == decode_bytes(ranks, tok.decode_table)
