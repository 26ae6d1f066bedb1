"""The scan-free simple boundary branch must agree with the oracle on
every qualifying input (no ws run > 1, no digit run > 3, ASCII), and the
packed kernel must pick it only then."""

import random
import string

import numpy as np
import pytest

from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.oracle import encode_ranks, pretokenize


def _simple(text: str) -> bool:
    import regex
    if any(ord(c) >= 0x80 for c in text):
        return False
    ws = [bool(regex.match(r"\s", c)) for c in text]
    dg = [c.isdigit() for c in text]
    if any(a and b for a, b in zip(ws, ws[1:])):
        return False
    runs = 0
    for d in dg:
        runs = runs + 1 if d else 0
        if runs > 3:
            return False
    return True


def _boundaries_simple(text: str) -> list[int]:
    import jax.numpy as jnp

    from tekken_tpu.ops.pretokenize import (ascii_packed_lookup,
                                            byte_boundaries_ascii_simple)

    data = text.encode("ascii")
    L = max(64, len(data))
    buf = np.zeros(L, dtype=np.uint8)
    buf[:len(data)] = np.frombuffer(data, dtype=np.uint8)
    b = jnp.asarray(buf)
    pk = ascii_packed_lookup(b)
    flags = np.asarray(byte_boundaries_ascii_simple(b, len(data), pk))
    return np.flatnonzero(flags[:len(data)]).tolist()


def _oracle_starts(text: str) -> list[int]:
    starts, pos = [], 0
    for p in pretokenize(text):
        starts.append(pos)
        pos += len(p.encode("utf-8"))
    return starts


CASES = [
    "hello world", "it's a test 123", "don't we've I'm you'll",
    "a1b2c3", "x!word", " !word", "123 456 789", "a\nb\nc", "w,x.y!z?",
    "'s 't 'll 'd", "end.", "a b c d", "Hello, World! 99 bottles",
    "tab\there", "semi;colon:colon", "9.99 price", "(paren) [brack]",
]


@pytest.mark.parametrize("text", CASES)
def test_simple_branch_matches_oracle(text):
    assert _simple(text), text
    assert _boundaries_simple(text) == _oracle_starts(text), text


def test_simple_branch_fuzz():
    rng = random.Random(41)
    alpha = string.ascii_letters + "019.,!?';:()" + " \t\n"
    checked = 0
    for _ in range(800):
        t = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 80)))
        if not _simple(t):
            continue
        checked += 1
        assert _boundaries_simple(t) == _oracle_starts(t), repr(t)
    assert checked > 150


def test_packed_kernel_takes_simple_branch_exactly(tok=None):
    """End-to-end: batches that qualify (and ones that don't) both encode
    exactly through encode_batch."""
    tok = build_synthetic_tokenizer(num_merges=300, num_special_tokens=20)
    from tekken_tpu.ops.packed import PackedEncoder

    enc = PackedEncoder(tok, rows=8, row_len=256)
    simple_batch = ["hello world 123", "it's fine.", "a,b,c and d!"]
    hard_batch = ["double  space", "12345 digits", "tabs\t\tdeep",
                  "trailing   "]
    for batch in (simple_batch, hard_batch, simple_batch + hard_batch):
        got = enc.encode_batch(batch)
        for t, g in zip(batch, got):
            assert g == encode_ranks(t, tok.ranks), repr(t)


def test_ascii_arith_classes_match_table():
    """The arithmetic ASCII class/fold computation must equal the
    regex-derived table for every byte < 128."""
    import numpy as np

    from tekken_tpu.ops.pretokenize import (ascii_classes_arith,
                                            unicode_packed_table)

    b = np.arange(128, dtype=np.uint8)
    got = np.asarray(ascii_classes_arith(b))
    want = unicode_packed_table()[:128]
    assert np.array_equal(got, want), np.flatnonzero(got != want)
