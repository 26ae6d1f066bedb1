"""A broken accelerated engine must surface, never silently degrade.

Round-1 weakness: bare ``except Exception`` blocks disabled the device path
forever with no signal, so a kernel regression would quietly turn
``encode_batch`` into the slow host oracle.  Now: a RuntimeWarning with the
traceback fires once, ``engine_used`` reports which engine served the last
call, and ``TEKKEN_TPU_REQUIRE_DEVICE=1`` makes device failures hard errors.
"""

import warnings

import pytest

from tekken_tpu.errors import TokenizersError
from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.oracle import encode_ranks


def _poison_packed(monkeypatch):
    import tekken_tpu.ops.packed as packed

    def boom(self, *a, **k):
        raise RuntimeError("poisoned kernel")

    monkeypatch.setattr(packed.PackedEncoder, "__init__", boom)


def test_poisoned_packed_warns_once_and_falls_back(monkeypatch):
    _poison_packed(monkeypatch)
    monkeypatch.delenv("TEKKEN_TPU_REQUIRE_DEVICE", raising=False)
    tok = build_synthetic_tokenizer(num_merges=50)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = tok.encode_batch(["hello world"])
    msgs = [str(x.message) for x in w]
    assert any("packed-device" in m for m in msgs)
    assert any("poisoned kernel" in m for m in msgs)  # traceback included
    assert tok.engine_used == "host-oracle"
    shift = tok.num_special_tokens()
    assert out == [[r + shift
                    for r in encode_ranks("hello world", tok.ranks)]]
    # warned exactly once per engine
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        tok.encode_batch(["again"])
    assert not any("packed-device" in str(x.message) for x in w2)


def test_poisoned_packed_hard_fails_under_require_device(monkeypatch):
    _poison_packed(monkeypatch)
    monkeypatch.setenv("TEKKEN_TPU_REQUIRE_DEVICE", "1")
    tok = build_synthetic_tokenizer(num_merges=50)
    with pytest.raises(TokenizersError):
        tok.encode_batch(["hello"])
    with pytest.raises(TokenizersError):  # stays loud on later calls too
        tok.encode_batch(["hello"])


def _poison_packed_call(monkeypatch):
    """Poison encode_batch (NOT __init__): the jit compile happens at first
    CALL, which is where round 2's real Mosaic failure surfaced
    (VERDICT.md weak #2)."""
    import tekken_tpu.ops.packed as packed

    def boom(self, texts):
        raise RuntimeError("poisoned at call time (jit compile)")

    monkeypatch.setattr(packed.PackedEncoder, "encode_batch", boom)


def test_call_time_poison_warns_and_falls_back(monkeypatch):
    _poison_packed_call(monkeypatch)
    monkeypatch.delenv("TEKKEN_TPU_REQUIRE_DEVICE", raising=False)
    tok = build_synthetic_tokenizer(num_merges=50)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = tok.encode_batch(["hello world"])
    msgs = [str(x.message) for x in w]
    assert any("packed-device" in m for m in msgs)
    assert any("poisoned at call time" in m for m in msgs)
    assert tok.engine_used == "host-oracle"
    shift = tok.num_special_tokens()
    assert out == [[r + shift
                    for r in encode_ranks("hello world", tok.ranks)]]
    # engine stays disabled; no re-warn, output still exact
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        out2 = tok.encode_batch(["again"])
    assert not any("packed-device" in str(x.message) for x in w2)
    assert out2 == [[r + shift for r in encode_ranks("again", tok.ranks)]]


def test_call_time_poison_hard_fails_under_require_device(monkeypatch):
    _poison_packed_call(monkeypatch)
    monkeypatch.setenv("TEKKEN_TPU_REQUIRE_DEVICE", "1")
    tok = build_synthetic_tokenizer(num_merges=50)
    with pytest.raises(TokenizersError):
        tok.encode_batch(["hello"])


def test_decoder_call_time_poison_falls_back(monkeypatch):
    import tekken_tpu.ops.decode as decode
    from tekken_tpu.special_tokens import SpecialTokenPolicy

    def boom(self, ranks):
        raise RuntimeError("poisoned decode_stream")

    monkeypatch.setattr(decode.DeviceDecoder, "decode_stream", boom)
    monkeypatch.delenv("TEKKEN_TPU_REQUIRE_DEVICE", raising=False)
    # decode_batch prefers the native engine for byte materialization;
    # force the device path so the poisoned kernel is actually called
    monkeypatch.setenv("TEKKEN_TPU_DECODE_BYTES", "device")
    tok = build_synthetic_tokenizer(num_merges=50)
    ids = tok.encode("hello world", False, False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = tok.decode_batch([ids], SpecialTokenPolicy.IGNORE)
    assert out == ["hello world"]
    assert any("device-decode" in str(x.message) for x in w)


def test_engine_used_reports_device_path():
    tok = build_synthetic_tokenizer(num_merges=50)
    assert tok.engine_used is None
    tok.encode_batch(["hello world 123"])
    assert tok.engine_used == "packed-device"
    tok.encode("hello", False, False)
    assert tok.engine_used in ("native-host", "host-oracle")
