"""Minimal load/encode/decode example
(mirrors reference: examples/basic_tokenizer_test.rs).

Run: python examples/basic_tokenizer_test.py [path/to/tekken.json]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tekken_tpu import SpecialTokenPolicy, Tekkenizer  # noqa: E402
from tekken_tpu.models import build_synthetic_tokenizer  # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else "tekken.json"
tok = (Tekkenizer.from_file(path) if os.path.exists(path)
       else build_synthetic_tokenizer())

text = "Hello world!"
ids = tok.encode(text, True, True)
print("tokens:", ids)
print("decoded:", tok.decode(ids, SpecialTokenPolicy.IGNORE))
assert tok.decode(ids, SpecialTokenPolicy.IGNORE) == text
print("ok")
