"""Test configuration.

Tests run on CPU with 8 virtual devices so mesh/sharding paths (SURVEY.md
section 4: multi-host simulated via xla_force_host_platform_device_count) are
exercised without a pod.  Must run before any jax import.
"""

import os
import sys

# hard override: the environment pins JAX_PLATFORMS=axon (the real TPU
# tunnel) and something in site config re-applies it at jax import, so the
# env var alone is not enough — jax.config.update after import is.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from tekken_tpu.models import build_synthetic_tokenizer  # noqa: E402


@pytest.fixture(scope="session")
def small_tokenizer():
    """Byte-only vocab + named specials (mirrors reference
    tests/test_small_vocab.rs:7-95)."""
    return build_synthetic_tokenizer(num_merges=0, num_special_tokens=10)


@pytest.fixture(scope="session")
def merged_tokenizer():
    """BPE-trained synthetic vocab with deep merge trees."""
    return build_synthetic_tokenizer(num_merges=400, num_special_tokens=20)


@pytest.fixture(scope="session")
def audio_tokenizer():
    """Audio-enabled synthetic tokenizer (16kHz, 12.5fps, 80 mels, hop 160,
    win 400 — the reference's V7 audio constants, tests/test_audio.rs:20-21)."""
    return build_synthetic_tokenizer(
        num_merges=100, num_special_tokens=20, with_audio=True)
