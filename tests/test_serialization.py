"""Tekkenizer save/round-trip + batched conveniences."""

import numpy as np
import pytest

from tekken_tpu import Audio, SpecialTokenPolicy, Tekkenizer
from tekken_tpu.models import build_synthetic_tokenizer


def test_save_round_trip(tmp_path):
    tok = build_synthetic_tokenizer(num_merges=150, num_special_tokens=12)
    p = tmp_path / "saved.json"
    tok.save(p)
    tok2 = Tekkenizer.from_file(p)
    assert tok2.vocab_size() == tok.vocab_size()
    assert tok2.num_special_tokens() == tok.num_special_tokens()
    for text in ["hello world", "it's 123", "   pad   ", "中文"]:
        assert tok2.encode(text, True, True) == tok.encode(text, True, True)
    assert tok2.vocab() == tok.vocab()


def test_save_round_trip_with_audio(tmp_path):
    tok = build_synthetic_tokenizer(num_merges=50, with_audio=True,
                                    chunk_length_s=1.0)
    p = tmp_path / "saved.json"
    tok.save(p)
    tok2 = Tekkenizer.from_file(p)
    assert tok2.has_audio_support()
    assert tok2.audio_config().chunk_length_s == 1.0
    a = Audio.new(np.zeros(16000, dtype=np.float32), 16000)
    assert (tok2.encode_audio(a).tokens
            == tok.encode_audio(Audio.new(np.zeros(16000, np.float32),
                                          16000)).tokens)


def test_decode_batch(merged_tokenizer):
    texts = ["one", "two two", ""]
    ids = [merged_tokenizer.encode(t, True, True) for t in texts]
    decoded = merged_tokenizer.decode_batch(ids, SpecialTokenPolicy.IGNORE)
    assert decoded == texts


def test_encode_audio_batch(audio_tokenizer):
    clips = [Audio.new(np.zeros(16000 * k, dtype=np.float32), 16000)
             for k in (1, 2)]
    encs = audio_tokenizer.encode_audio_batch(clips)
    assert len(encs) == 2
    assert len(encs[1].tokens) > len(encs[0].tokens)


def test_audio_encoder_mel_spectrogram(audio_tokenizer):
    enc = audio_tokenizer._audio_encoder
    wave = np.random.RandomState(0).randn(2, 16000).astype(np.float32)
    mel = np.asarray(enc.mel_spectrogram(wave))
    assert mel.shape == (2, 100, 80)
