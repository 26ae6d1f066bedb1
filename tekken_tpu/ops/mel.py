"""Batched STFT + mel spectrogram as XLA ops.

North star: "WAV/mel pipeline -> batched XLA FFT+matmul".  The reference
ships only the Slaney mel filter bank as public API (reference:
src/audio.rs:684-748, exercised by tests/test_audio.rs:35-39); its
spectrogram is never computed.  Here the full pipeline is provided as
device ops:

  frames  = window(hann) * strided frames of the padded waveform
  spec    = |rfft(frames)|^2                      (XLA FFT, batched)
  mel     = spec @ mel_filter_bank                (MXU matmul)
  logmel  = log10(max(mel, eps)), whisper-style dynamic-range clamp

Shapes follow the reference's convention: the filter bank is
(num_frequency_bins, num_mel_bins) so the matmul right-multiplies
(reference: src/audio.rs:718-737 "to match Python").
"""

from __future__ import annotations

import functools

import numpy as np

from ..audio import AudioSpectrogramConfig, mel_filter_bank


def hann_window(window_size: int) -> np.ndarray:
    """Periodic Hann window (the STFT convention used by torch/whisper)."""
    n = np.arange(window_size, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / window_size))).astype(
        np.float32)


def frame_signal(waveform, window_size: int, hop_length: int, center: bool = True):
    """Split (batch, n) waveforms into (batch, n_frames, window_size) frames.

    With ``center=True`` the signal is reflect-padded by window_size//2 on
    both sides (the standard STFT convention), giving
    n_frames = n // hop_length + 1.
    """
    import jax.numpy as jnp

    x = jnp.asarray(waveform, dtype=jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    n = x.shape[-1]
    if center:
        pad = window_size // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = n // hop_length + 1
    else:
        n_frames = max(0, (n - window_size) // hop_length + 1)
    starts = jnp.arange(n_frames, dtype=jnp.int32) * hop_length
    offs = jnp.arange(window_size, dtype=jnp.int32)
    idx = starts[:, None] + offs[None, :]
    return x[:, idx]  # (batch, n_frames, window_size)


def stft_power(waveform, window_size: int, hop_length: int,
               center: bool = True):
    """Power spectrogram |STFT|^2: (batch, n_frames, n_freq_bins) with
    n_freq_bins = window_size//2 + 1."""
    import jax.numpy as jnp

    frames = frame_signal(waveform, window_size, hop_length, center)
    win = jnp.asarray(hann_window(window_size))
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)


@functools.lru_cache(maxsize=8)
def _fb_cached(num_freq: int, num_mel: int, min_f: float, max_f: float,
               sr: int):
    return mel_filter_bank(num_freq, num_mel, min_f, max_f, sr).astype(
        np.float32)


def mel_spectrogram(
    waveform,
    config: AudioSpectrogramConfig,
    sampling_rate: int,
    min_frequency: float = 0.0,
    max_frequency: float | None = None,
    center: bool = True,
    log: bool = True,
):
    """Batched (log-)mel spectrogram: (batch, n_frames, num_mel_bins).

    The mel projection is a single MXU matmul against the Slaney filter bank
    (bit-identical to audio.mel_filter_bank, reference: src/audio.rs:684-748).
    ``log=True`` applies the whisper-style log10 + 8-decade dynamic range
    clamp and (x+4)/4 normalization.
    """
    import jax.numpy as jnp

    if max_frequency is None:
        max_frequency = sampling_rate / 2.0
    spec = stft_power(waveform, config.window_size, config.hop_length, center)
    # drop the trailing frame like whisper (frames fully determined by hops)
    spec = spec[:, :-1, :] if center else spec
    fb = jnp.asarray(_fb_cached(config.window_size // 2 + 1,
                                config.num_mel_bins,
                                float(min_frequency), float(max_frequency),
                                int(sampling_rate)))
    mel = jnp.einsum("btf,fm->btm", spec, fb,
                     preferred_element_type=jnp.float32)
    if not log:
        return mel
    logmel = jnp.log10(jnp.maximum(mel, 1e-10))
    logmel = jnp.maximum(logmel, logmel.max(axis=(-2, -1), keepdims=True) - 8.0)
    return (logmel + 4.0) / 4.0
