"""Encode/decode matrix over varied cases + token inspection + byte census
(mirrors reference: examples/detailed_test.rs).

Run: python examples/detailed_test.py [path/to/tekken.json]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tekken_tpu import SpecialTokenPolicy, Tekkenizer  # noqa: E402
from tekken_tpu.models import build_synthetic_tokenizer  # noqa: E402

CASES = [
    "Hello, world!",
    "The quick brown fox jumps over the lazy dog.",
    "123 456 789",
    "   spaces   everywhere   ",
    "unicode: 中文 émoji \U0001f600",
    "it's don't can't",
    "line1\nline2\r\nline3",
    "",
]


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tekken.json"
    tok = (Tekkenizer.from_file(path) if os.path.exists(path)
           else build_synthetic_tokenizer(num_merges=300))

    for text in CASES:
        ids = tok.encode(text, False, False)
        rt = tok.decode(ids, SpecialTokenPolicy.IGNORE)
        status = "OK " if rt == text else "FAIL"
        print(f"[{status}] {len(ids):3d} tokens  {text!r}")
        if rt != text:
            print("   round-trip mismatch:", repr(rt))

    # byte-token census (reference: detailed_test.rs byte-token section)
    ns = tok.num_special_tokens()
    byte_ids = [i for i in range(tok.vocab_size()) if tok.is_byte(i)]
    print(f"\nbyte tokens: {len(byte_ids)} "
          f"(ids {ns}..{ns + 255})")
    sample = tok.encode("abc", False, False)
    print("'abc' pieces:", [tok.id_to_byte_piece(t, SpecialTokenPolicy.KEEP)
                            for t in sample])


if __name__ == "__main__":
    main()
