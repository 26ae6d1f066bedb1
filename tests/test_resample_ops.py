"""Resampler: host path vs batched XLA conv path."""

import numpy as np
import pytest

from tekken_tpu.ops.resample import resample_poly_batched, resample_poly_host


@pytest.mark.parametrize("orig,target", [(32000, 16000), (44100, 16000),
                                         (8000, 16000), (24000, 16000)])
def test_batched_matches_host(orig, target):
    rng = np.random.RandomState(0)
    x = rng.randn(3, orig).astype(np.float32) * 0.3
    host = np.stack([resample_poly_host(row, orig, target) for row in x])
    dev = np.asarray(resample_poly_batched(x, orig, target))
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, atol=2e-4)


def test_resample_preserves_tone():
    sr, target = 48000, 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = np.asarray(resample_poly_batched(x[None, :], sr, target))[0]
    assert y.shape[0] == target
    t2 = np.arange(target) / target
    want = np.sin(2 * np.pi * 440.0 * t2)
    mid = slice(500, target - 500)
    assert np.max(np.abs(y[mid] - want[mid])) < 2e-3


def test_identity_rate():
    x = np.ones((2, 100), dtype=np.float32)
    y = np.asarray(resample_poly_batched(x, 16000, 16000))
    np.testing.assert_array_equal(y, x)
