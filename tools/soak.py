"""Deep differential soak: all engines, varied vocabs, varied corpora.

Run: python tools/soak.py [minutes]
"""

import os
import random
import string
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tekken_tpu import SpecialTokenPolicy  # noqa: E402
from tekken_tpu.models import build_synthetic_tokenizer  # noqa: E402
from tekken_tpu.oracle import encode_ranks  # noqa: E402
from tekken_tpu.ops.packed import PackedEncoder  # noqa: E402

ALPHAS = [
    string.ascii_letters + string.digits + " .,!?'\n\r\t",
    "the quick hello world tokenizer aaaa  123 don't I'm we've ",
    "éü中文русский ſ'sß \U0001f600\U0001f680",
    "'sStT'rReE'vVlLdDmM \t\n\r",
    "".join(chr(c) for c in range(0x20, 0x7F)),
    "　  \xa0 a1!'",
]

TRAIN_TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "it's don't you're we've I'm they'll she'd o'clock 'tis",
    "hello world peace tokenizer encoding decoding testing",
    "  whitespace   handling \n newlines \r\n mixed 123 456 789",
    "международный 中文分词 tokenización",
    "aaaa aaaaaaaa abab cdcd xyxy zzzz",
]


def main(minutes=8.0):
    deadline = time.time() + minutes * 60
    rng = random.Random(20260817)
    rounds = 0
    docs_checked = 0

    while time.time() < deadline:
        n_merges = rng.choice([0, 50, 200, 600, 1200])
        tok = build_synthetic_tokenizer(num_merges=n_merges,
                                        num_special_tokens=20,
                                        texts=TRAIN_TEXTS)
        enc = PackedEncoder(tok, rows=16, row_len=4096)
        try:
            from tekken_tpu.native import NativeEncoder
            native = NativeEncoder(tok)
        except Exception:
            native = None

        for _ in range(4):
            texts = []
            for i in range(rng.randint(1, 16)):
                a = ALPHAS[rng.randrange(len(ALPHAS))]
                texts.append("".join(rng.choice(a)
                                     for _ in range(rng.randint(0, 600))))
            dev = enc.encode_batch(texts)
            nat = (native.encode_batch(texts) if native
                   else [None] * len(texts))
            for t, d, n in zip(texts, dev, nat):
                want = encode_ranks(t, tok.ranks)
                assert d == want, (n_merges, repr(t[:80]), "device")
                if n is not None:
                    assert n == want, (n_merges, repr(t[:80]), "native")
                # round trip through the public surface
                shift = tok.num_special_tokens()
                ids = [r + shift for r in want]
                assert tok.decode(ids, SpecialTokenPolicy.RAISE) == t
                docs_checked += 1
        rounds += 1
        print(f"[soak] vocab={256+n_merges} rounds={rounds} "
              f"docs={docs_checked}", flush=True)

    print(f"SOAK OK: {docs_checked} docs across {rounds} vocab rounds")
    return 0


if __name__ == "__main__":
    m = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    sys.exit(main(m))
