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


def test_native_decode_ranks_matches_table():
    """Native tkn_decode concatenates exactly the decode-table spans and
    rejects out-of-range ranks."""
    import numpy as np
    import pytest
    from tekken_tpu.models import build_synthetic_tokenizer

    tok = build_synthetic_tokenizer(num_merges=80)
    ne = tok._get_native_encoder()
    if ne is None:
        pytest.skip("native engine unavailable")
    dt = tok.decode_table
    rng = np.random.default_rng(7)
    n_ranks = len(dt.offsets) - 1
    ranks = rng.integers(0, n_ranks, 500, dtype=np.int32)
    want = b"".join(dt.token_bytes(int(r)) for r in ranks)
    assert ne.decode_ranks(ranks) == want
    assert ne.decode_ranks(np.empty(0, np.int32)) == b""
    with pytest.raises(ValueError):
        ne.decode_ranks(np.asarray([n_ranks], np.int32))
    with pytest.raises(ValueError):
        ne.decode_ranks(np.asarray([-1], np.int32))


def test_decode_batch_engine_used_native():
    """decode_batch routes byte materialization to the native engine by
    default and records it in engine_used."""
    from tekken_tpu.models import build_synthetic_tokenizer
    from tekken_tpu.special_tokens import SpecialTokenPolicy

    tok = build_synthetic_tokenizer(num_merges=80)
    if tok._get_native_encoder() is None:
        import pytest
        pytest.skip("native engine unavailable")
    ids = tok.encode("hello world", False, False)
    out = tok.decode_batch([ids], SpecialTokenPolicy.IGNORE)
    assert out == ["hello world"]
    assert tok.engine_used == "native-decode"
