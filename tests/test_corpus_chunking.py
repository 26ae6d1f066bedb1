"""Oversize documents ride the device path via piece-safe chunking.

The load-bearing property: re-tokenizing a chunk that starts at a piece
start and ends at a piece end reproduces exactly the original pieces (the
regex's only forward-looking construct is the (?!\\S) lookahead, which
succeeds at end-of-chunk exactly when the chunk ends at a piece end).
Fuzzed here; CorpusEncoder correctness then follows from per-piece merge
independence.
"""

import random
import string

import pytest

from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.oracle import encode_ranks, pretokenize


@pytest.fixture(scope="module")
def tok():
    return build_synthetic_tokenizer(num_merges=300, num_special_tokens=20)


ALPHABETS = [
    string.ascii_letters + string.digits + " .,!?'\n\r\t",
    "the quick hello world 123  don't we've I'm ",
    "éü中文ру ſ'sß \U0001f600 ",
    " \t\n\r\x0b\x0c ab12!? ",
    "aaaa    bbbb\n\n\n cccc'''s",
]


import regex as _rx

_IS_WS = _rx.compile(r"\s").match


def _safe_cuts(pieces):
    """Piece boundaries whose preceding char is non-whitespace — the safe
    cut points the corpus splitter uses."""
    return [i for i in range(1, len(pieces))
            if not _IS_WS(pieces[i - 1][-1])]


def test_chunk_retokenization_stable():
    """Chunks cut at SAFE boundaries re-tokenize to exactly the original
    pieces (suffix side holds unconditionally; prefix side needs the
    non-whitespace rule)."""
    rng = random.Random(99)
    checked = 0
    for _ in range(300):
        a = ALPHABETS[rng.randrange(len(ALPHABETS))]
        doc = "".join(rng.choice(a) for _ in range(rng.randint(1, 400)))
        pieces = pretokenize(doc)
        safe = _safe_cuts(pieces)
        if not safe:
            continue
        cuts = sorted(rng.sample(safe, k=min(rng.randint(1, 5), len(safe))))
        bounds = [0] + cuts + [len(pieces)]
        for i in range(len(bounds) - 1):
            c = "".join(pieces[bounds[i]:bounds[i + 1]])
            got = pretokenize(c)
            assert got == pieces[bounds[i]:bounds[i + 1]], (doc, c, got)
            checked += 1
    assert checked > 200


def test_unsafe_cut_counterexample():
    """Cutting after a trailing-whitespace piece is NOT stable — the
    documented counterexample that forces the safe-cut rule."""
    doc = "a\x0c\r\x0c x"
    pieces = pretokenize(doc)
    # the whitespace run splits into tail pieces whose last char attaches
    # forward; re-tokenizing the prefix merges them differently
    for cut in range(1, len(pieces)):
        prefix = "".join(pieces[:cut])
        if _IS_WS(pieces[cut - 1][-1]):
            if pretokenize(prefix) != pieces[:cut]:
                return  # divergence demonstrated
    # at minimum the rule must never flag a divergent boundary as safe
    for cut in _safe_cuts(pieces):
        prefix = "".join(pieces[:cut])
        assert pretokenize(prefix) == pieces[:cut]


def test_chunk_encode_concatenation(tok):
    rng = random.Random(7)
    for _ in range(50):
        a = ALPHABETS[rng.randrange(len(ALPHABETS))]
        doc = "".join(rng.choice(a) for _ in range(rng.randint(50, 500)))
        pieces = pretokenize(doc)
        safe = _safe_cuts(pieces)
        if len(safe) < 2:
            continue
        cuts = sorted(rng.sample(safe, k=2))
        bounds = [0] + cuts + [len(pieces)]
        chunks = ["".join(pieces[bounds[i]:bounds[i + 1]])
                  for i in range(len(bounds) - 1)]
        cat = []
        for c in chunks:
            cat.extend(encode_ranks(c, tok.ranks))
        assert cat == encode_ranks(doc, tok.ranks), doc


def test_piece_safe_segments_exact(tok):
    """The splitter's segments re-encode to the document's exact ids, on
    whitespace-heavy adversarial docs included."""
    from tekken_tpu.oracle import byte_pair_merge
    from tekken_tpu.parallel.corpus import CorpusEncoder

    enc = CorpusEncoder.__new__(CorpusEncoder)  # only _row_len needed
    enc._row_len = 64

    rng = random.Random(21)
    docs = [
        " ".join("word%d" % i for i in range(200)),
        ("ab  " * 100) + ("\x0c\r\x0c " * 40) + "end",
        "  " * 300,                     # one giant whitespace run
        "z" * 500,                      # one giant letter piece
        "".join(rng.choice(" \t\n\r\x0bab12!?ü中ſ'") for _ in range(2000)),
    ]
    for doc in docs:
        segs = enc._piece_safe_segments(doc)
        cat = []
        for kind, val in segs:
            if kind == "d":
                assert len(val.encode("utf-8")) <= 64
                cat.extend(encode_ranks(val, tok.ranks))
            elif kind == "hp":
                for p in val:
                    cat.extend(byte_pair_merge(p.encode("utf-8"),
                                               tok.ranks))
            else:
                cat.extend(byte_pair_merge(val.encode("utf-8"), tok.ranks))
        assert cat == encode_ranks(doc, tok.ranks), doc[:50]


def test_corpus_encoder_oversize_device_path(tok):
    """100KB-scale documents never leave the device path (except a lone
    piece wider than a row) and match the oracle exactly, in order."""
    from tekken_tpu.parallel.corpus import CorpusEncoder

    rng = random.Random(5)
    words = ["".join(rng.choice(string.ascii_lowercase)
                     for _ in range(rng.randint(2, 9))) for _ in range(500)]

    def make_doc(n_bytes):
        parts = []
        size = 0
        while size < n_bytes:
            w = rng.choice(words)
            parts.append(w)
            size += len(w) + 1
        return " ".join(parts)

    docs = [make_doc(100_000), "small doc", make_doc(3_000),
            "x" * 2000,  # one giant letter-run piece: host fallback
            make_doc(50_000)]

    enc = CorpusEncoder(tok, rows=8, row_len=512)
    got: list[list[int]] = []
    stats = enc.encode_stream(docs, on_batch=got.extend,
                              add_special_shift=False)
    assert len(got) == len(docs)
    for d, g in zip(docs, got):
        assert g == encode_ranks(d, tok.ranks), d[:40]
    assert stats["documents"] == len(docs)
    assert stats["oversized_documents"] == 4
    assert stats["tokens"] == sum(len(g) for g in got)
    assert stats["bytes"] == sum(len(d.encode()) for d in docs)


def test_corpus_encoder_order_across_batch_boundaries(tok):
    """Mid-document flushes (a doc's chunks straddling device batches)
    keep output order and exactness."""
    from tekken_tpu.parallel.corpus import CorpusEncoder

    rng = random.Random(13)
    docs = []
    for i in range(20):
        n = rng.choice([10, 700, 1500, 40])
        docs.append(" ".join(f"w{i}x{j}" for j in range(n // 4)))

    enc = CorpusEncoder(tok, rows=8, row_len=256)
    got: list[list[int]] = []
    enc.encode_stream(docs, on_batch=got.extend, add_special_shift=False)
    assert len(got) == len(docs)
    for d, g in zip(docs, got):
        assert g == encode_ranks(d, tok.ranks), d[:40]
