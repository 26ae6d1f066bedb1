"""Device (XLA) encode path: vectorized pretokenizer + BPE merge kernel
parity against the scalar oracle."""

import base64
import random
import string

import numpy as np
import pytest

from tekken_tpu.config import TokenInfo
from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.oracle import encode_ranks, pretokenize
from tekken_tpu.ops.pretokenize import pretokenize_vec
from tekken_tpu.vocab import PairTable, reload_mergeable_ranks

PRETOK_CASES = [
    "Hello, world!", "  word", "   whitespace   handling   ", "it's",
    "you're", "1234", "a\n\nb", "x!word", "x!!word", " !word", "'s",
    "'step", "'rx", "don'tre", "IT'S", "'ſ", "a ' b", "!!\n!!", "a\r\nb",
    "\n\n   word", "x\t's", " 's", "a \n b", "1's", "'ll", "'llow", "'l",
    "'", "", "x", " ", "\n", "é中1a!", "!\n\n \nx", "a  12", "  123,456",
    "　full-width　space", " line seps", "mixed ſtuff",
]


@pytest.mark.parametrize("text", PRETOK_CASES)
def test_pretokenize_vec_matches_oracle(text):
    assert pretokenize_vec(text) == pretokenize(text)


def test_pretokenize_vec_fuzz():
    rng = random.Random(99)
    alpha = string.ascii_letters + string.digits + " .,!?'\n\r\t" + "é中ſ　"
    for _ in range(150):
        t = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
        assert pretokenize_vec(t) == pretokenize(t), repr(t)


@pytest.fixture(scope="module")
def tok():
    return build_synthetic_tokenizer(num_merges=400, num_special_tokens=20)


def test_encode_batch_matches_encode(tok):
    texts = ["hello world", "the tokenizer's test 123", "a" * 300,
             "  whitespace   handling   ", "", "don't we've 'ſ", "中文 test"]
    batched = tok.encode_batch(texts, add_beginning_of_sequence=True,
                               add_end_of_sequence=True)
    for t, b in zip(texts, batched):
        assert b == tok.encode(t, True, True), repr(t)


def test_encode_batch_fuzz(tok):
    rng = random.Random(5)
    alpha = "abcdehlortw '\n 123!?"
    texts = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 100)))
             for _ in range(120)]
    got = tok.encode_batch(texts)
    assert tok.engine_used == "packed-device"
    shift = tok.num_special_tokens()
    for t, g in zip(texts, got):
        assert g == [r + shift for r in encode_ranks(t, tok.ranks)], repr(t)


def test_probe_pairs_matches_host(tok):
    import jax.numpy as jnp
    from tekken_tpu.ops.bpe import probe_pairs, INF

    table = tok.pair_table()
    rng = random.Random(7)
    n_ranks = len(tok.ranks)
    lefts = np.array([rng.randrange(n_ranks) for _ in range(2000)],
                     dtype=np.int32)
    rights = np.array([rng.randrange(n_ranks) for _ in range(2000)],
                      dtype=np.int32)
    got = np.asarray(probe_pairs(
        jnp.asarray(lefts), jnp.asarray(rights),
        jnp.asarray(table.key_left), jnp.asarray(table.key_right),
        jnp.asarray(table.values), table.max_probes))
    for l, r, g in zip(lefts, rights, got):
        want = table.lookup_host(int(l), int(r))
        assert g == (want if want >= 0 else INF)


def _tok_info(rank, data: bytes):
    return TokenInfo(rank=rank, token_bytes=base64.b64encode(data).decode(),
                     token_str=None)


def test_merge_order_counterexample():
    """Regression for the merge-order subtlety: with vocab {"ab":258,
    "cd":256, "bcd":257}, "abcd" must encode [a, bcd] (lowest-rank-first),
    NOT [ab, cd] (what parallel local-minimum merging would produce)."""
    from tekken_tpu.ops.bpe import merge_bucket_fn
    import jax.numpy as jnp

    vocab = [_tok_info(i, bytes([i])) for i in range(256)]
    vocab.append(_tok_info(256, b"cd"))
    vocab.append(_tok_info(257, b"bcd"))
    vocab.append(_tok_info(258, b"ab"))
    ranks = reload_mergeable_ranks(vocab, 512)
    table = PairTable.build(ranks)

    piece = np.frombuffer(b"abcd", dtype=np.uint8).astype(np.int32)
    ranks0 = np.full((1, 16), 0, dtype=np.int32)
    ranks0[0, :4] = piece
    merge = merge_bucket_fn(16, table.max_probes)
    out, n = merge(jnp.asarray(ranks0), jnp.asarray([4], dtype=np.int32),
                   jnp.asarray(table.key_left), jnp.asarray(table.key_right),
                   jnp.asarray(table.values))
    got = np.asarray(out)[0, :int(n[0])].tolist()

    from tekken_tpu.oracle import byte_pair_merge
    want = byte_pair_merge(b"abcd", ranks)
    assert want == [ord("a"), 257]  # sequential semantics
    assert got == want


def test_byte_boundaries_direct_vs_chars():
    """The direct byte-level boundary formulation matches the char-
    compaction reference on multibyte-heavy inputs (incl. folded
    multi-byte letters like U+017F, multi-byte whitespace, non-ASCII
    digits)."""
    import functools
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tekken_tpu.ops.pretokenize import (byte_boundaries,
                                            byte_boundaries_via_chars)

    @functools.lru_cache(maxsize=8)
    def fns(L):
        return (jax.jit(byte_boundaries),
                jax.jit(byte_boundaries_via_chars))

    rng = random.Random(42)
    pool = ("abc DEF 123 45678  \t\n\r 中文漢字 ñé ſ ' 's 're 'll !?.,;:"
            "     \U0001F600 ٠١٢٣ ")
    cases = ["", "it's a test", "'ſ fold", "a'ſ b", "it'ſ x",
             "don't we've it'll they're", "٠١٢٣٤٥٦٧ nums",
             "a b", "  \n\n  x", "\r\n\r\n", "   "]
    for _ in range(60):
        cases.append("".join(rng.choice(pool)
                             for _ in range(rng.randint(1, 30))))
    for t in cases:
        d = t.encode("utf-8")
        L = 64
        while L < len(d) + 1:
            L <<= 1
        buf = np.zeros(L, np.uint8)
        buf[:len(d)] = np.frombuffer(d, np.uint8)
        fa, fb = fns(L)
        a = np.asarray(fa(jnp.asarray(buf), len(d)))
        b = np.asarray(fb(jnp.asarray(buf), len(d)))
        assert (a == b).all(), repr(t)
