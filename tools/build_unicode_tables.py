"""Build the Unicode codepoint-class tables used by the device pretokenizer.

The tables are derived *from the regex module itself* (the same engine that
backs the scalar oracle), so the vectorized byte-class path and the oracle
agree on \\p{L}, \\p{N}, \\s membership and on the case-insensitive
contraction letters by construction.

Output: tekken_tpu/data/unicode_tables.npz
  cls[0x110000]  uint8 bitfield: 1=letter, 2=number, 4=whitespace
  fold[0x110000] uint8: 1..8 when the codepoint case-folds (full Unicode
                 folding, as regex (?i:) does) to one of s,t,r,e,v,m,l,d;
                 0 otherwise.

Run: python tools/build_unicode_tables.py
"""

import os
import sys

import numpy as np
import regex

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_CP = 0x110000
SURROGATE_LO, SURROGATE_HI = 0xD800, 0xE000

CONTRACTION_LETTERS = "strevmld"  # indices 1..8


def all_chars_string():
    cps = [c for c in range(MAX_CP) if not (SURROGATE_LO <= c < SURROGATE_HI)]
    return cps, "".join(map(chr, cps))


def member_mask(pattern: str, cps, text: str) -> np.ndarray:
    pat = regex.compile(pattern)
    mask = np.zeros(MAX_CP, dtype=bool)
    idx = np.asarray(cps)
    hit = np.zeros(len(cps), dtype=bool)
    for m in pat.finditer(text):
        s, e = m.span()
        if e == s + 1:
            hit[s] = True
    mask[idx[hit]] = True
    return mask


def main():
    cps, text = all_chars_string()
    print("classifying", len(cps), "codepoints...")

    letters = member_mask(r"\p{L}", cps, text)
    numbers = member_mask(r"\p{N}", cps, text)
    whitespace = member_mask(r"\s", cps, text)

    cls = np.zeros(MAX_CP, dtype=np.uint8)
    cls[letters] |= 1
    cls[numbers] |= 2
    cls[whitespace] |= 4

    fold = np.zeros(MAX_CP, dtype=np.uint8)
    for i, letter in enumerate(CONTRACTION_LETTERS, start=1):
        # single chars matching (?i:<letter>) under full case folding
        pat = regex.compile(rf"(?i:{letter})")
        for m in pat.finditer(text):
            s, e = m.span()
            if e == s + 1:
                fold[cps[s]] = i
    print("letters:", letters.sum(), "numbers:", numbers.sum(),
          "whitespace:", whitespace.sum(), "fold:", (fold > 0).sum())
    for c in range(MAX_CP):
        if fold[c]:
            ch = chr(c)
            if c > 127:
                print(f"  fold U+{c:04X} {ch!r} -> "
                      f"{CONTRACTION_LETTERS[fold[c]-1]}")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tekken_tpu", "data", "unicode_tables.npz")
    np.savez_compressed(out, cls=cls, fold=fold)
    print("wrote", out, os.path.getsize(out), "bytes")


if __name__ == "__main__":
    main()
