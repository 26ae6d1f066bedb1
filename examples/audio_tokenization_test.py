"""Audio tokenization demo with JSON result dump
(mirrors reference: examples/audio_tokenization_test.rs).

Run: python examples/audio_tokenization_test.py [audio.wav]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tekken_tpu import Audio, SpecialTokenPolicy  # noqa: E402
from tekken_tpu.models import build_synthetic_tokenizer  # noqa: E402


def main():
    tok = build_synthetic_tokenizer(
        num_merges=200, num_special_tokens=20, with_audio=True,
        chunk_length_s=1.0)

    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        audio = Audio.from_file(sys.argv[1])
        name = sys.argv[1]
    else:
        sr = tok.audio_config().sampling_rate
        t = np.arange(int(sr * 3.2)) / sr
        audio = Audio.new(0.3 * np.sin(2 * np.pi * 220.0 * t), sr)
        name = "synthetic 3.2s 220Hz tone"

    print(f"audio: {name}: {len(audio.audio_array)} samples @ "
          f"{audio.sampling_rate} Hz ({audio.duration():.2f}s)")

    enc = tok.encode_audio(audio)
    print(f"-> {len(enc.tokens)} tokens "
          f"(1 x BEGIN_AUDIO + {len(enc.tokens)-1} x AUDIO)")

    text_ids = tok.encode("Transcribe this: ", True, False)
    mixed = text_ids + enc.tokens
    print("mixed stream (KEEP):",
          repr(tok.decode(mixed, SpecialTokenPolicy.KEEP))[:100], "...")

    results = {
        "audio": {"samples": len(enc.audio.audio_array),
                  "sampling_rate": enc.audio.sampling_rate,
                  "duration_s": enc.audio.duration()},
        "tokens": {"count": len(enc.tokens),
                   "begin_audio_id": enc.tokens[0],
                   "audio_token_id": enc.tokens[1] if len(enc.tokens) > 1
                   else None},
    }
    out = "audio_tokenization_results.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("results written to", out)


if __name__ == "__main__":
    main()
