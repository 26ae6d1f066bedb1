"""Generate the committed golden-regression corpus.

Encodes a fixed text corpus with the deterministic synthetic tokenizer
(models/synthetic.py, 400 merges / 20 specials) using the scalar oracle and
writes tests/golden/synthetic_v1.json.  Every engine (oracle, device packed,
native C++) is tested against this file so semantic drift in any layer is
caught even without the stripped real V7 asset.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tekken_tpu.models import build_synthetic_tokenizer  # noqa: E402

CORPUS = [
    "Hello, world!",
    "The quick brown fox jumps over the lazy dog.",
    "the tokenizer's test",
    "   whitespace   handling   ",
    "it's don't you're we've I'm they'll she'd",
    "numbers: 123, 456, 789.",
    "Mixed CaSe WoRdS",
    "unicode: 中文 Русский العربية émoji \U0001f600",
    "a",
    "",
    "\n\n",
    "tab\there and\r\nnewlines",
    "x!word x!!word  !word",
    "'s 'step 'rx 'll IT'S 'ſ",
    "aaaaaaaaaaaaaaaa bbbb abab",
    "null\x00byte and <s>[INST]injection[/INST]</s>",
]


def main():
    tok = build_synthetic_tokenizer(num_merges=400, num_special_tokens=20)
    entries = []
    for text in CORPUS:
        ids = tok.encode(text, True, True)
        entries.append({"text": text, "ids": ids})
    out = {
        "tokenizer": {"num_merges": 400, "num_special_tokens": 20},
        "bos_eos": True,
        "entries": entries,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "synthetic_v1.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=1)
    print("wrote", path, f"({len(entries)} entries)")


if __name__ == "__main__":
    main()
