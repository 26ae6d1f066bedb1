"""Audio subsystem tests (mirrors reference tests/test_audio.rs and the
audio framing semantics of src/audio.rs)."""

import base64
import os
import math

import numpy as np
import pytest

from tekken_tpu import (
    Audio,
    AudioConfig,
    AudioError,
    AudioSpectrogramConfig,
    InvalidConfigError,
    hertz_to_mel,
    mel_filter_bank,
    mel_to_hertz,
)
from tekken_tpu.utils.wav import write_wav


@pytest.fixture()
def wav_file(tmp_path):
    # 1.5 s of 440 Hz sine at 16 kHz, 16-bit PCM
    sr = 16000
    t = np.arange(int(sr * 1.5)) / sr
    samples = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    p = tmp_path / "tone.wav"
    write_wav(p, samples, sr, bits=16)
    return p, len(t), sr


# --------------------------------------------------------------------- #
# configs (reference: src/audio.rs:49-71, 110-199)
# --------------------------------------------------------------------- #

def test_spectrogram_config_validation():
    with pytest.raises(InvalidConfigError):
        AudioSpectrogramConfig(0, 160, 400)
    with pytest.raises(InvalidConfigError):
        AudioSpectrogramConfig(80, 0, 400)
    with pytest.raises(InvalidConfigError):
        AudioSpectrogramConfig(80, 160, 0)


def test_audio_config_validation():
    sc = AudioSpectrogramConfig(80, 160, 400)
    with pytest.raises(InvalidConfigError):
        AudioConfig(0, 12.5, sc, None)
    with pytest.raises(InvalidConfigError):
        AudioConfig(16000, 0.0, sc, None)
    with pytest.raises(InvalidConfigError):
        AudioConfig(16000, 12.5, sc, -1.0)


def test_audio_length_per_tok():
    # 16000 / 12.5 / 160 = 8 samples-of-spectrogram per token
    # (reference: src/audio.rs:188-199; BASELINE.md audio constants)
    sc = AudioSpectrogramConfig(80, 160, 400)
    cfg = AudioConfig(16000, 12.5, sc, None)
    assert cfg.audio_length_per_tok() == 8


def test_chunk_frames():
    sc = AudioSpectrogramConfig(80, 160, 400)
    cfg = AudioConfig(16000, 12.5, sc, 1.0)
    assert cfg.chunk_frames() == 16000
    cfg2 = AudioConfig(16000, 12.5, sc, None)
    with pytest.raises(InvalidConfigError, match="chunk_length_s not set"):
        cfg2.chunk_frames()


# --------------------------------------------------------------------- #
# Audio container (reference: src/audio.rs:213-464)
# --------------------------------------------------------------------- #

def test_from_file_and_duration(wav_file):
    p, n, sr = wav_file
    audio = Audio.from_file(p)
    assert audio.sampling_rate == sr
    assert len(audio.audio_array) == n
    assert abs(audio.duration() - 1.5) < 1e-9
    # int samples scaled by i32::MAX (reference: src/audio.rs:275-288):
    # 16-bit data lands near ±1.5e-5, not ±0.5
    assert np.abs(audio.audio_array).max() < 1e-3


def test_from_bytes_and_base64(wav_file):
    p, n, sr = wav_file
    raw = p.read_bytes()
    a1 = Audio.from_bytes(raw)
    a2 = Audio.from_base64(base64.b64encode(raw).decode())
    assert len(a1.audio_array) == n
    np.testing.assert_array_equal(a1.audio_array, a2.audio_array)


def test_from_bytes_invalid():
    with pytest.raises(AudioError):
        Audio.from_bytes(b"not a wav file at all")


def test_stereo_to_mono_average(tmp_path):
    # stereo -> mono by per-frame channel average (reference: src/audio.rs:294-307)
    import struct
    sr = 8000
    left = np.full(100, 1000, dtype=np.int16)
    right = np.full(100, 3000, dtype=np.int16)
    inter = np.empty(200, dtype=np.int16)
    inter[0::2] = left
    inter[1::2] = right
    data = inter.astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    audio = Audio.from_bytes(hdr)
    assert len(audio.audio_array) == 100
    expected = 2000.0 / (2**31 - 1)
    np.testing.assert_allclose(audio.audio_array, expected, rtol=1e-5)


def test_pad_to_chunk_multiple():
    sc = AudioSpectrogramConfig(80, 160, 400)
    cfg = AudioConfig(16000, 12.5, sc, 1.0)
    audio = Audio.new(np.ones(20000, dtype=np.float32), 16000)
    audio.pad(cfg)
    assert len(audio.audio_array) == 32000  # next multiple of 16000
    assert audio.audio_array[20000:].sum() == 0.0


def test_pad_to_window_size():
    sc = AudioSpectrogramConfig(80, 160, 400)
    cfg = AudioConfig(16000, 12.5, sc, None)
    audio = Audio.new(np.ones(100, dtype=np.float32), 16000)
    audio.pad(cfg)
    assert len(audio.audio_array) == 400
    long = Audio.new(np.ones(5000, dtype=np.float32), 16000)
    long.pad(cfg)
    assert len(long.audio_array) == 5000  # no-op


def test_resample_identity():
    audio = Audio.new(np.ones(1000, dtype=np.float32), 16000)
    audio.resample(16000)
    assert len(audio.audio_array) == 1000


def test_resample_halves_rate():
    # beyond-reference: actual resampling (reference stubs this,
    # src/audio.rs:415-424)
    sr = 32000
    t = np.arange(sr) / sr
    wave = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    audio = Audio.new(wave, sr)
    audio.resample(16000)
    assert audio.sampling_rate == 16000
    assert len(audio.audio_array) == 16000
    # mid-section should still be a 440 Hz sine at the new rate
    t2 = np.arange(16000) / 16000
    expected = np.sin(2 * np.pi * 440.0 * t2)
    mid = slice(1000, 15000)
    assert np.max(np.abs(audio.audio_array[mid] - expected[mid])) < 1e-3


# --------------------------------------------------------------------- #
# audio tokenization (reference: src/audio.rs:498-592; tests/test_audio.rs)
# --------------------------------------------------------------------- #

def test_encode_audio_token_structure(audio_tokenizer):
    sr = 16000
    audio = Audio.new(np.zeros(sr, dtype=np.float32), sr)  # exactly 1 s
    enc = audio_tokenizer.encode_audio(audio)
    begin_id = audio_tokenizer.get_control_token("[BEGIN_AUDIO]")
    audio_id = audio_tokenizer.get_control_token("[AUDIO]")
    assert enc.tokens[0] == begin_id
    assert all(t == audio_id for t in enc.tokens[1:])
    # 16000 samples, hop 160 -> 16000%160==0 -> 100 frames; per_tok=8 -> 13 tokens
    assert len(enc.tokens) == 1 + math.ceil(100 / 8)


def test_encode_audio_frame_math_non_divisible(audio_tokenizer):
    # the quirky ceil(len/hop - 1) branch (reference: src/audio.rs:565-577)
    sr = 16000
    n = 16001  # not a hop multiple
    audio = Audio.new(np.zeros(n, dtype=np.float32), sr)
    enc = audio_tokenizer.encode_audio(audio)
    frames = math.ceil(n / 160 - 1)  # = 100
    expected = 1 + math.ceil(frames / 8)
    assert len(enc.tokens) == expected


def test_encode_audio_without_support(merged_tokenizer):
    audio = Audio.new(np.zeros(100, dtype=np.float32), 16000)
    with pytest.raises(AudioError, match="not configured"):
        merged_tokenizer.encode_audio(audio)


def test_has_audio_support(audio_tokenizer, merged_tokenizer):
    assert audio_tokenizer.has_audio_support()
    assert not merged_tokenizer.has_audio_support()
    assert audio_tokenizer.audio_config() is not None


# --------------------------------------------------------------------- #
# mel scale + filter bank (reference: src/audio.rs:611-748)
# --------------------------------------------------------------------- #

def test_mel_scale_round_trip():
    for f in [0.0, 100.0, 999.0, 1000.0, 4000.0, 8000.0]:
        assert abs(mel_to_hertz(hertz_to_mel(f)) - f) < 1e-6


def test_mel_scale_slaney_constants():
    assert hertz_to_mel(500.0) == pytest.approx(7.5)
    assert hertz_to_mel(1000.0) == pytest.approx(15.0)
    logstep = 27.0 / math.log(6.4)
    assert hertz_to_mel(2000.0) == pytest.approx(15.0 + math.log(2.0) * logstep)


def test_mel_filter_bank_shape_and_coverage():
    # (reference: tests/test_audio.rs:35-39 — shape (201, 80))
    fb = mel_filter_bank(201, 80, 0.0, 8000.0, 16000)
    assert fb.shape == (201, 80)
    assert fb.sum() > 0.0
    assert (fb >= 0.0).all()
    # every filter has some energy
    assert (fb.sum(axis=0) > 0.0).all()


def test_mel_filter_bank_validation():
    with pytest.raises(InvalidConfigError):
        mel_filter_bank(1, 80, 0.0, 8000.0, 16000)
    with pytest.raises(InvalidConfigError):
        mel_filter_bank(201, 80, 9000.0, 8000.0, 16000)


# --------------------------------------------------------------------- #
# real-asset conformance: jfk.wav (reference: tests/test_audio.rs:6-52)
# --------------------------------------------------------------------- #

JFK_WAV = "/root/reference/tests/assets/jfk.wav"


@pytest.mark.skipif(not os.path.exists(JFK_WAV),
                    reason="reference jfk.wav asset not present")
def test_jfk_wav_load_and_encode():
    """The one real-world binary WAV the environment provides: pin sample
    count, rate, duration, the i32::MAX int-scaling semantics, and the
    AudioEncoder token count per the reference's frame math
    (reference: tests/test_audio.rs:10-31, src/audio.rs:275-288,555-591).

    Ground truth cross-checked against an independent parse (stdlib
    ``wave``): mono, 16 kHz, 176,000 16-bit int frames, 11.0 s.
    """
    audio = Audio.from_file(JFK_WAV)
    arr = np.asarray(audio.audio_array)
    assert arr.shape == (176_000,)
    assert audio.sampling_rate == 16_000
    assert audio.duration() == pytest.approx(11.0)

    # int samples scale by i32::MAX (reference: src/audio.rs:281-284), so
    # 16-bit audio lands at ~1e-5 amplitude — NOT the usual 1/i16::MAX
    assert arr.dtype == np.float32
    peak = float(np.abs(arr).max())
    assert 1e-6 < peak < 2e-5, peak
    # the exact peak sample (16-bit value 25648 / i32::MAX, f32-rounded)
    assert peak == pytest.approx(25648 / 2147483647, rel=1e-5)

    # encoder frame math (reference: src/audio.rs:555-591): len % hop == 0
    # -> signal_length = 176000/160 = 1100 frames; tokens/frame factor
    # 16000/12.5/160 = 8 -> ceil(1100/8) = 138 audio tokens + BEGIN_AUDIO
    cfg = AudioConfig(16_000, 12.5, AudioSpectrogramConfig(80, 160, 400),
                      None)
    from tekken_tpu.audio import AudioEncoder
    enc = AudioEncoder(config=cfg, audio_token_id=1000,
                       begin_audio_token_id=1001)
    encoding = enc.encode(audio)
    assert len(encoding.tokens) == 139
    assert encoding.tokens[0] == 1001
    assert set(encoding.tokens[1:]) == {1000}
    # no chunking configured and len % hop == 0: pad is a no-op
    assert len(np.asarray(encoding.audio.audio_array)) == 176_000
