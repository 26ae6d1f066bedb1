r"""Oracle-vs-reference regex gap pinning (docs/V7_CONFORMANCE.md).

The reference's engine interprets the hardcoded pattern with the Rust
regex crate; our oracle uses the Python ``regex`` module.  The V7 golden
asset is unavailable in this environment, so these tests execute the gap
analysis instead: every behavior that COULD diverge is asserted to match
the Rust semantics, and the one unfixable channel (Unicode table version
of \p{L}/\p{N}) is proven not to touch the golden corpus.
"""

import sys
import unicodedata

import regex

from tekken_tpu.oracle import TEKKEN_PATTERN, pretokenize

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def test_whitespace_class_matches_rust_semantics():
    """Rust regex defines \\s as exactly Unicode White_Space.  CPython re
    adds \\x1c-\\x1f; the regex module must NOT (and does not)."""
    for c in "\x1c\x1d\x1e\x1f​":
        assert not regex.match(r"\s", c), hex(ord(c))
    for c in " \t\n\r\x0b\x0c\x85\xa0  　":
        assert regex.match(r"\s", c), hex(ord(c))
    # and the consequence at the pattern level: \x1c is a punct run, not ws
    assert pretokenize("a\x1c\x1cb") == ["a", "\x1c\x1c", "b"]


def test_contraction_case_folding():
    """(?i:'s|...) under Rust = per-char SIMPLE case folding.  For the
    eight contraction letters the only non-ASCII simple-fold relative is
    U+017F (long s) -> s; full-folding-only forms must not match."""
    pat = regex.compile(r"(?i:'s|'t|'re|'ve|'m|'ll|'d)")
    assert pat.fullmatch("'s") and pat.fullmatch("'S")
    assert pat.fullmatch("'ſ")            # 'ſ simple-folds to 's
    assert pat.fullmatch("'RE") and pat.fullmatch("'Ve")
    assert not pat.match("'rℯ")           # ℯ does NOT simple-fold to e
    assert not pat.match("'ﬆ")            # ﬆ is a FULL folding of st
    # the oracle pre-tokenizer splits the long-s contraction like Rust
    assert pretokenize("it'ſ") == ["it", "'ſ"]


def test_lookahead_and_digit_runs():
    """(?!\\S) backtracking and \\p{N}{1,3} splits — pure logic, pinned."""
    assert pretokenize("   whitespace   handling   ") == [
        "  ", " whitespace", "  ", " handling", "   "]
    assert pretokenize("12345 6") == ["123", "45", " ", "6"]
    assert pretokenize("a\n\n  b") == ["a", "\n\n", " ", " b"]


def test_golden_corpus_codepoints_are_stable():
    """The Unicode-version skew (oracle's regex bundles >=16, the Rust
    crates of the reference era bundle 15.x) can only affect codepoints
    added/reclassified between versions.  Prove it cannot touch the golden
    corpus: every codepoint in every golden/round-trip string classifies
    identically under this image's Unicode 15.0 tables (unicodedata) and
    the oracle's newer tables."""
    from test_v7_golden import GOLDEN

    corpus = [t for t, _ in GOLDEN] + [
        "Hello world! This is a test.",
        "The quick brown fox jumps over the lazy dog.",
        "你好世界 Привет мир مرحبا بالعالم",
        "🚀 Emojis! 🎉 User@example.com #hashtag",
        "Mixed123Numbers456", "\n\t\r  spaces 　",
        "don't we've I'm you'll it'ſ",
    ]
    cats_letter = set("Lu Ll Lt Lm Lo".split())
    cats_number = set("Nd Nl No".split())
    for text in corpus:
        for ch in set(text):
            cat = unicodedata.category(ch)
            assert bool(regex.match(r"\p{L}", ch)) == (cat in cats_letter), \
                (hex(ord(ch)), cat)
            assert bool(regex.match(r"\p{N}", ch)) == (cat in cats_number), \
                (hex(ord(ch)), cat)


def test_device_class_tables_match_oracle_engine():
    """The vectorized path's class table is built FROM the regex module
    (tools/build_unicode_tables.py), so oracle and device agree by
    construction — spot-verified here across planes."""
    import numpy as np

    from tekken_tpu.ops.pretokenize import unicode_tables

    cls, fold = unicode_tables()
    rng = np.random.RandomState(7)
    cps = np.concatenate([
        rng.randint(0, 0x3000, 400), rng.randint(0x3000, 0x30000, 200),
        rng.randint(0x30000, 0x110000, 100),
        np.asarray([0x17F, 0x212F, 0x1C, 0x85, 0xA0, 0x10D40, 0x105C0])])
    for cp in cps:
        cp = int(cp)
        if 0xD800 <= cp < 0xE000:
            continue
        c = chr(cp)
        assert bool(cls[cp] & 1) == bool(regex.match(r"\p{L}", c)), hex(cp)
        assert bool(cls[cp] & 2) == bool(regex.match(r"\p{N}", c)), hex(cp)
        assert bool(cls[cp] & 4) == bool(regex.match(r"\s", c)), hex(cp)
