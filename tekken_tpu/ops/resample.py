"""Polyphase windowed-sinc resampling.

The reference's ``Audio::resample`` is a stub that errors whenever rates
differ (reference: src/audio.rs:415-424).  The north star requires a real
resampler in the audio path, so this implements rational-ratio polyphase
resampling (upsample by L via zero stuffing, windowed-sinc low-pass, decimate
by M) with both a host numpy path and a batched XLA path built on
``lax.conv_general_dilated`` (the conv maps onto the MXU for large batches).
"""

from __future__ import annotations

import math

import numpy as np


def _gcd_ratio(orig_rate: int, target_rate: int) -> tuple[int, int]:
    g = math.gcd(int(orig_rate), int(target_rate))
    return int(target_rate) // g, int(orig_rate) // g  # (up L, down M)


def design_kernel(up: int, down: int, half_width: int = 32,
                  beta: float = 8.555) -> np.ndarray:
    """Kaiser-windowed sinc low-pass at cutoff min(1/up, 1/down) (normalized),
    scaled by ``up`` to preserve amplitude after zero-stuffing."""
    max_rate = max(up, down)
    cutoff = 1.0 / max_rate  # in units of the upsampled Nyquist
    n_taps = 2 * half_width * max_rate + 1
    t = np.arange(n_taps, dtype=np.float64) - (n_taps - 1) / 2.0
    kern = cutoff * np.sinc(cutoff * t)
    kern *= np.kaiser(n_taps, beta)
    kern *= up
    return kern.astype(np.float64)


def resample_poly_host(x: np.ndarray, orig_rate: int, target_rate: int) -> np.ndarray:
    """Resample a 1-D waveform on host (numpy). Matches scipy's
    ``resample_poly`` output-length convention: ceil(len * L / M)."""
    x = np.asarray(x, dtype=np.float64)
    if orig_rate == target_rate or x.size == 0:
        return x.astype(np.float32)
    up, down = _gcd_ratio(orig_rate, target_rate)
    kern = design_kernel(up, down)
    n_taps = len(kern)
    half = (n_taps - 1) // 2

    # zero-stuff
    n_up = x.size * up
    upsampled = np.zeros(n_up, dtype=np.float64)
    upsampled[::up] = x

    # FFT convolution (host path); 'same'-aligned so output sample k
    # corresponds to upsampled position k*down
    n_out = -(-x.size * up // down)  # ceil
    n_fft = 1
    while n_fft < n_up + n_taps:
        n_fft <<= 1
    conv = np.fft.irfft(np.fft.rfft(upsampled, n_fft) * np.fft.rfft(kern, n_fft),
                        n_fft)
    # centered alignment: y[j] = sum_i x_up[i] * kern[half + j - i]
    centered = conv[half:half + n_up]
    out = centered[::down][:n_out]
    if out.size < n_out:
        out = np.pad(out, (0, n_out - out.size))
    return out.astype(np.float32)


def resample_poly_batched(x, orig_rate: int, target_rate: int):
    """Batched device resample: x of shape (batch, n) -> (batch, m).

    Uses ``lax.conv_general_dilated`` with lhs_dilation=up and window_stride=
    down, which expresses the whole polyphase pipeline as one XLA conv.
    """
    import jax.numpy as jnp
    from jax import lax

    if orig_rate == target_rate:
        return jnp.asarray(x, dtype=jnp.float32)
    up, down = _gcd_ratio(orig_rate, target_rate)
    kern = design_kernel(up, down).astype(np.float32)
    n_taps = len(kern)
    half = (n_taps - 1) // 2

    x = jnp.asarray(x, dtype=jnp.float32)
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)

    lhs = x[:, None, :]                       # (batch, feature=1, n)
    rhs = kern[None, None, ::-1]              # (out=1, in=1, taps) — conv flips
    out = lax.conv_general_dilated(
        lhs, jnp.asarray(rhs),
        window_strides=(down,),
        padding=[(half, half + down)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0, :n_out]
