"""Device mel/STFT ops vs independent numpy reference."""

import numpy as np
import pytest

from tekken_tpu.audio import AudioSpectrogramConfig, mel_filter_bank
from tekken_tpu.ops.mel import (
    frame_signal,
    hann_window,
    mel_spectrogram,
    stft_power,
)


@pytest.fixture(scope="module")
def tone():
    sr = 16000
    t = np.arange(sr) / sr
    return (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32), sr


def test_hann_window_periodic():
    w = hann_window(400)
    assert w.shape == (400,)
    assert w[0] == pytest.approx(0.0)
    assert abs(w[200] - 1.0) < 1e-6  # periodic: peak at N/2
    np.testing.assert_allclose(w[1:200], w[201:][::-1], atol=1e-6)


def test_frame_signal_shapes(tone):
    x, sr = tone
    frames = np.asarray(frame_signal(x, 400, 160, center=True))
    assert frames.shape == (1, sr // 160 + 1, 400)
    nc = np.asarray(frame_signal(x, 400, 160, center=False))
    assert nc.shape == (1, (sr - 400) // 160 + 1, 400)
    # non-centered frames are literal slices
    np.testing.assert_allclose(nc[0, 3], x[3 * 160:3 * 160 + 400], atol=0)


def test_stft_power_against_numpy(tone):
    x, sr = tone
    got = np.asarray(stft_power(x, 400, 160, center=False))
    win = hann_window(400)
    for f in (0, 5, 17):
        frame = x[f * 160:f * 160 + 400] * win
        want = np.abs(np.fft.rfft(frame)) ** 2
        np.testing.assert_allclose(got[0, f], want, rtol=2e-3, atol=1e-4)


def test_stft_peak_bin(tone):
    # a 440 Hz tone at 16 kHz with 400-point windows peaks at bin 11
    x, sr = tone
    spec = np.asarray(stft_power(x, 400, 160, center=False))
    peak = spec[0, 10].argmax()
    assert peak == round(440 * 400 / sr) == 11


def test_mel_spectrogram_shape_and_matmul(tone):
    x, sr = tone
    cfg = AudioSpectrogramConfig(80, 160, 400)
    mel = np.asarray(mel_spectrogram(x, cfg, sr, log=False))
    assert mel.shape == (1, sr // 160, 80)
    # cross-check one frame against an explicit numpy matmul
    spec = np.asarray(stft_power(x, 400, 160, center=True))[:, :-1, :]
    fb = mel_filter_bank(201, 80, 0.0, sr / 2.0, sr).astype(np.float32)
    want = spec[0, 7] @ fb
    np.testing.assert_allclose(mel[0, 7], want, rtol=2e-3, atol=1e-5)


def test_log_mel_range(tone):
    x, sr = tone
    cfg = AudioSpectrogramConfig(80, 160, 400)
    lm = np.asarray(mel_spectrogram(x, cfg, sr, log=True))
    # whisper-style normalization keeps values in a small range
    assert lm.max() <= 2.0
    assert lm.min() >= lm.max() - 2.0 - 1e-5


def test_batched(tone):
    x, sr = tone
    cfg = AudioSpectrogramConfig(80, 160, 400)
    batch = np.stack([x, x * 0.1, np.zeros_like(x)])
    mel = np.asarray(mel_spectrogram(batch, cfg, sr, log=False))
    assert mel.shape == (3, sr // 160, 80)
    np.testing.assert_allclose(mel[1], mel[0] * 0.01, rtol=1e-3, atol=1e-6)
