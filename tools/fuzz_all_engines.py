"""Cross-engine differential fuzz: oracle vs packed vs flat vs native.

Run: python tools/fuzz_all_engines.py [n_batches]
"""

import os
import random
import string
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tekken_tpu.models import build_synthetic_tokenizer  # noqa: E402
from tekken_tpu.oracle import encode_ranks  # noqa: E402
from tekken_tpu.ops.flat import FlatEncoder  # noqa: E402
from tekken_tpu.ops.packed import PackedEncoder  # noqa: E402

ALPHABETS = [
    string.ascii_letters + string.digits + " .,!?'\n\r\t",
    "the quick hello world tokenizer aaaa  123 don't ",
    "éü中文ру ſ'sß \U0001f600",
    "'sStT'rReE'vVlLdDmM \t\n",
    "1234567890 .,;:!?",
    "　  \xa0 a1!'",
]


def main(n_batches=20, seed=0):
    rng = random.Random(seed)
    tok = build_synthetic_tokenizer(num_merges=400, num_special_tokens=20)
    enc = PackedEncoder(tok, rows=32, row_len=1024)
    flat = FlatEncoder(tok, rows=32, row_len=1024)
    try:
        from tekken_tpu.native import NativeEncoder
        native = NativeEncoder(tok)
    except Exception as e:
        print("native unavailable:", e)
        native = None

    bad = 0
    checked = 0
    for b in range(n_batches):
        texts = []
        for i in range(rng.randint(1, 32)):
            a = ALPHABETS[(b + i) % len(ALPHABETS)]
            texts.append("".join(rng.choice(a)
                                 for _ in range(rng.randint(0, 500))))
        dev = enc.encode_batch(texts)
        flt = flat.encode_batch(texts)
        nat = native.encode_batch(texts) if native else [None] * len(texts)
        for t, d, f, n in zip(texts, dev, flt, nat):
            want = encode_ranks(t, tok.ranks)
            checked += 1
            if d != want or f != want or (n is not None and n != want):
                bad += 1
                print("MISMATCH", repr(t[:60]))
                print("  oracle", want[:20])
                print("  device", d[:20])
                print("  flat  ", f[:20])
                if n is not None:
                    print("  native", n[:20])
                if bad > 5:
                    return 1
    print(f"checked {checked} docs across {n_batches} batches; bad {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sys.exit(main(n))
