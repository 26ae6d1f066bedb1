"""Full demo: text + audio tokenization end to end.

Mirrors the reference's basic_usage example (reference:
examples/basic_usage.rs:56-147): loads ``tekken.json`` if present, otherwise
builds a synthetic audio-enabled tokenizer, then demonstrates encode/decode
with all policies and audio tokenization.

Run: python examples/basic_usage.py [path/to/tekken.json]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tekken_tpu import Audio, SpecialTokenPolicy, Tekkenizer  # noqa: E402
from tekken_tpu.models import build_synthetic_tokenizer  # noqa: E402


def get_tokenizer() -> Tekkenizer:
    path = sys.argv[1] if len(sys.argv) > 1 else "tekken.json"
    if os.path.exists(path):
        print(f"loading {path}")
        return Tekkenizer.from_file(path)
    print("no tekken.json found — building a synthetic audio-enabled "
          "tokenizer (24kHz, 12.5 fps, 128 mels, 1s chunks)")
    return build_synthetic_tokenizer(
        num_merges=300, num_special_tokens=20, with_audio=True,
        sampling_rate=24000, frame_rate=12.5, num_mel_bins=128,
        hop_length=160, window_size=400, chunk_length_s=1.0)


def main():
    tok = get_tokenizer()
    print(f"vocab_size={tok.vocab_size()} specials={tok.num_special_tokens()}"
          f" version={tok.version().as_str()} audio={tok.has_audio_support()}")

    text = "Hello, world! This is the Tekken tokenizer."
    ids = tok.encode(text, True, True)
    print(f"\nencode({text!r}) -> {len(ids)} tokens")
    print(" ids:", ids)
    print(" keep:  ", repr(tok.decode(ids, SpecialTokenPolicy.KEEP)))
    print(" ignore:", repr(tok.decode(ids, SpecialTokenPolicy.IGNORE)))

    print("\nper-token pieces:")
    for t in ids[:12]:
        print(f"  {t:6d} -> {tok.id_to_piece(t)!r}"
              f"  special={tok.is_special_token(t)} byte={tok.is_byte(t)}")

    if tok.has_audio_support():
        sr = tok.audio_config().sampling_rate
        t = np.arange(int(sr * 2.5)) / sr
        wave = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        enc = tok.encode_audio(Audio.new(wave, sr))
        print(f"\naudio: 2.5s sine -> {len(enc.tokens)} tokens "
              f"(first={tok.id_to_piece(enc.tokens[0])!r}, padded to "
              f"{len(enc.audio.audio_array)} samples)")
        mixed = (tok.encode("Listen: ", True, False) + enc.tokens
                 + tok.encode(" transcribed.", False, True))
        print("mixed text+audio stream:",
              repr(tok.decode(mixed, SpecialTokenPolicy.KEEP))[:120], "...")


if __name__ == "__main__":
    main()
