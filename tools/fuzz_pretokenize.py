"""Differential fuzz: vectorized pretokenizer vs the regex-module oracle."""

import os
import random
import string
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tekken_tpu.oracle import pretokenize  # noqa: E402
from tekken_tpu.ops.pretokenize import pretokenize_vec  # noqa: E402

HAND_CASES = [
    "Hello, world!", "  word", "   whitespace   handling   ", "it's", "you're",
    "1234", "a\n\nb", "x!word", "x!!word", " !word", "'s", "'step", "'rx",
    "don'tre", "IT'S", "'ſ", "a ' b", "!!\n!!", "a\r\nb", "\n\n   word",
    "x\t's", " 's", "tab\there", "a \n b", "1's", "'ll", "'llow", "'l", "'",
    "", "x", " ", "\n", "é中1a!", "!\n\n \nx", "a  12", "  123,456",
    "  x", "　　ｗ", "ßs'ß", "'K", "ſ'ſ",
]


def main(n_random=4000, seed=0):
    rng = random.Random(seed)
    alphas = [
        string.ascii_letters + string.digits + " .,!?'\n\r\t",
        "ab 12 !? '\n",
        " \t\n\r'sStTrReEvVlLdDmM",
        "éü中文руſ 'sKKß",
        "".join(chr(c) for c in range(0x20, 0x7f)),
        "    　 a1!'",
    ]
    cases = list(HAND_CASES)
    for i in range(n_random):
        a = alphas[i % len(alphas)]
        cases.append("".join(rng.choice(a) for _ in range(rng.randint(0, 48))))

    bad = 0
    for t in cases:
        want = pretokenize(t)
        got = pretokenize_vec(t)
        if want != got:
            bad += 1
            print("MISMATCH", repr(t))
            print("  want", want)
            print("  got ", got)
            if bad > 8:
                break
    print("checked", len(cases), "bad", bad)
    return bad


if __name__ == "__main__":
    n = 400 if "--smoke" in sys.argv else 4000
    sys.exit(1 if main(n_random=n) else 0)
