"""Stepwise model-loading profile.

Mirrors the reference's profiling tests (reference:
tests/test_profile_loading.rs, tests/test_detailed_profile.rs): times each
stage of tokenizer construction — file read, JSON parse, base64 vocab
decode + validation, pair-table builds — at full 131k-vocab scale.

Run: python tools/profile_loading.py [path/to/tekken.json]
"""

import os
import random
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tekken_tpu.utils.timing import StageTimer  # noqa: E402


def main():
    timer = StageTimer()

    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        path = sys.argv[1]
    else:
        # synthesize a 131k-scale model file first
        print("no model file given — synthesizing 131k-scale tekken.json")
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import build_bench_vocab
        from tekken_tpu.config import ModelData, TekkenConfig
        from tekken_tpu.special_tokens import get_deprecated_special_tokens

        rng = random.Random(0)
        words = ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                         for _ in range(rng.randint(2, 11)))
                 for _ in range(40000)]
        vocab = build_bench_vocab(words)
        md = ModelData(
            vocab=vocab,
            config=TekkenConfig(pattern=".*", num_vocab_tokens=len(vocab),
                                default_vocab_size=len(vocab) + 1000,
                                default_num_special_tokens=1000,
                                version="v7"),
            special_tokens=get_deprecated_special_tokens(),
        )
        path = "/tmp/tekken_synth_131k.json"
        with open(path, "w") as f:
            f.write(md.to_json())

    from tekken_tpu.config import ModelData
    from tekken_tpu.config import parse_version
    from tekken_tpu.special_tokens import get_deprecated_special_tokens
    from tekken_tpu.tekkenizer import Tekkenizer
    from tekken_tpu.vocab import CuckooPairTable, PairTable

    with timer.stage("file read"):
        with open(path) as f:
            content = f.read()
    print(f"model file: {len(content)/1e6:.1f} MB")

    with timer.stage("JSON parse + schema"):
        md = ModelData.from_json(content)

    with timer.stage("Tekkenizer construction"):
        tok = Tekkenizer(
            vocab=md.vocab,
            special_tokens=(md.special_tokens
                            or get_deprecated_special_tokens()),
            pattern=md.config.pattern,
            vocab_size=md.config.default_vocab_size,
            num_special_tokens=md.config.default_num_special_tokens,
            version=parse_version(md.config.version),
            audio_config=md.audio,
        )

    with timer.stage("pair table (linear probe)"):
        PairTable.build(tok.ranks)

    with timer.stage("pair table (cuckoo)"):
        CuckooPairTable.build(tok.ranks)

    with timer.stage("first encode (oracle)"):
        tok.encode("The quick brown fox jumps over the lazy dog.", True, True)

    print()
    print(timer.report())


if __name__ == "__main__":
    main()
