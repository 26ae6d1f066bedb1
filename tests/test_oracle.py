"""Oracle engine invariants: pretokenizer tiling, BPE merge correctness,
pair-table equivalence (the key lemma behind the device kernel)."""

import random
import string

import pytest

from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.oracle import byte_pair_merge, encode_ranks, pretokenize
from tekken_tpu.vocab import PairTable


def _random_texts(n, seed=0):
    rng = random.Random(seed)
    alphabets = [
        string.ascii_letters + string.digits + " .,!?'\n\r\t",
        "abc ABC 123 !?" + "éü中文ру",
        " \t\n\r" * 3 + "xy1!",
        "".join(chr(c) for c in range(0x20, 0x7f)),
    ]
    texts = []
    for i in range(n):
        alpha = alphabets[i % len(alphabets)]
        k = rng.randint(0, 60)
        texts.append("".join(rng.choice(alpha) for _ in range(k)))
    return texts


def test_pretokenize_tiles_input():
    # matches must tile the whole string (every char consumed exactly once)
    for text in _random_texts(200):
        assert "".join(pretokenize(text)) == text


def test_pretokenize_known_splits():
    # hand-derived from the pattern semantics (reference: src/tekkenizer.rs:123)
    assert pretokenize("Hello, world!") == ["Hello", ",", " world", "!"]
    assert pretokenize("  word") == [" ", " word"]
    assert pretokenize("   whitespace   handling   ") == [
        "  ", " whitespace", "  ", " handling", "   "]
    assert pretokenize("it's") == ["it", "'s"]
    assert pretokenize("you're") == ["you", "'re"]
    assert pretokenize("1234") == ["123", "4"]
    assert pretokenize("a\n\nb") == ["a", "\n\n", "b"]
    assert pretokenize("x!word") == ["x", "!word"]
    assert pretokenize("x!!word") == ["x", "!!", "word"]
    assert pretokenize(" !word") == [" !", "word"]


def _naive_merge(piece: bytes, ranks):
    """Independent reimplementation: explicit segment list, full rescan each
    step, leftmost-lowest-rank merge."""
    segs = [piece[i:i + 1] for i in range(len(piece))]
    if not segs:
        return []
    while True:
        best_rank, best_i = None, None
        for i in range(len(segs) - 1):
            cand = ranks.get(segs[i] + segs[i + 1])
            if cand is not None and (best_rank is None or cand < best_rank):
                best_rank, best_i = cand, i
        if best_i is None:
            break
        segs[best_i:best_i + 2] = [segs[best_i] + segs[best_i + 1]]
    return [ranks[s] for s in segs]


@pytest.fixture(scope="module")
def ranks():
    tok = build_synthetic_tokenizer(num_merges=400, num_special_tokens=20)
    return tok.ranks


def test_byte_pair_merge_matches_naive(ranks):
    rng = random.Random(42)
    words = ["hello", "world", "the", "tokenizer", "aaaaaaaa", "abababab",
             "international", "don't", "  ", "x"]
    for _ in range(300):
        k = rng.randint(1, 12)
        s = "".join(rng.choice("abcdehlortw 'n") for _ in range(k))
        words.append(s)
    for w in words:
        piece = w.encode("utf-8")
        assert byte_pair_merge(piece, ranks) == _naive_merge(piece, ranks), w


def test_merge_result_concatenation_invariant(ranks):
    # decoding the merge output must reproduce the piece bytes
    inv = {}
    for b, r in ranks.items():
        inv[r] = b
    for text in _random_texts(100, seed=7):
        for piece in pretokenize(text):
            pb = piece.encode("utf-8")
            out = byte_pair_merge(pb, ranks)
            assert b"".join(inv[r] for r in out) == pb


def test_pair_table_equivalence(ranks):
    """The key kernel lemma: rank-pair lookup == concatenated-bytes lookup
    for every pair of vocab tokens whose concat is a vocab token."""
    table = PairTable.build(ranks)
    inv = {r: b for b, r in ranks.items()}
    rng = random.Random(3)
    all_ranks = list(inv)
    # positive cases: every enumerated pair agrees with bytes lookup
    hits = 0
    for _ in range(5000):
        l = rng.choice(all_ranks)
        r = rng.choice(all_ranks)
        expected = ranks.get(inv[l] + inv[r], -1)
        got = table.lookup_host(l, r)
        assert got == expected, (l, r, inv[l], inv[r])
        hits += got >= 0
    # make sure the test actually exercised hits
    assert table.num_pairs > 0


def test_encode_ranks_smoke(ranks):
    out = encode_ranks("hello world", ranks)
    inv = {r: b for b, r in ranks.items()}
    assert b"".join(inv[r] for r in out) == b"hello world"
