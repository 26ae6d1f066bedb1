"""Model-file validator: load a tekken.json and run self-checks.

Checks (mirroring construction-time validation plus cross-engine parity):
- schema + version parse
- byte-token identity / rank contiguity / special-token rules
- engine agreement (oracle vs device batch vs native C++) on a probe corpus
- round-trip encode/decode on the probe corpus

Run: python tools/validate_model.py path/to/tekken.json
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = [
    "Hello, world!",
    "The quick brown fox jumps over the lazy dog.",
    "it's don't we've 123 456  789",
    "   whitespace   handling   ",
    "unicode 中文 Русский émoji \U0001f600 'ſ",
    "<s>[INST]injection[/INST]</s>",
]


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    path = sys.argv[1]

    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("JAX_PLATFORMS", "cpu"))

    from tekken_tpu import SpecialTokenPolicy, Tekkenizer
    from tekken_tpu.oracle import encode_ranks

    print(f"loading {path} ...")
    tok = Tekkenizer.from_file(path)
    print(f"  vocab_size={tok.vocab_size()}  specials="
          f"{tok.num_special_tokens()}  version={tok.version().as_str()}  "
          f"audio={tok.has_audio_support()}")

    failures = 0

    print("round-trip + engine parity on probe corpus:")
    for text in PROBE:
        want = [r + tok.num_special_tokens()
                for r in encode_ranks(text, tok.ranks)]
        host = tok.encode(text, False, False)
        dev = tok.encode_batch([text])[0]
        rt = tok.decode(host, SpecialTokenPolicy.IGNORE)
        ok = (host == want == dev) and rt == text
        failures += not ok
        print(f"  [{'OK' if ok else 'FAIL'}] {len(host):4d} tokens  "
              f"{text[:40]!r}")

    try:
        from tekken_tpu.native import NativeEncoder
        ne = NativeEncoder(tok)
        shift = tok.num_special_tokens()
        for text in PROBE:
            got = [r + shift for r in ne.encode(text)]
            if got != tok.encode(text, False, False):
                failures += 1
                print(f"  [FAIL] native engine disagrees on {text[:40]!r}")
        print("  native engine parity: checked")
    except Exception as e:
        print(f"  native engine unavailable ({e}); skipped")

    if failures:
        print(f"VALIDATION FAILED: {failures} failures")
        return 1
    print("VALIDATION OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
