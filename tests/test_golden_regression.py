"""Golden-regression corpus: every engine must reproduce the committed ids.

Regenerate (only when semantics intentionally change):
    python tools/gen_golden.py
"""

import json
import os

import pytest

from tekken_tpu.models import build_synthetic_tokenizer

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "golden", "synthetic_v1.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def tok(golden):
    cfg = golden["tokenizer"]
    return build_synthetic_tokenizer(
        num_merges=cfg["num_merges"],
        num_special_tokens=cfg["num_special_tokens"])


def test_oracle_engine_matches_golden(tok, golden):
    os.environ["TEKKEN_TPU_DISABLE_NATIVE"] = "1"
    try:
        for e in golden["entries"]:
            got = tok.encode(e["text"], True, True)
            assert got == e["ids"], repr(e["text"])
    finally:
        os.environ.pop("TEKKEN_TPU_DISABLE_NATIVE", None)


def test_device_path_matches_golden(tok, golden):
    texts = [e["text"] for e in golden["entries"]]
    got = tok.encode_batch(texts, add_beginning_of_sequence=True,
                           add_end_of_sequence=True)
    for e, g in zip(golden["entries"], got):
        assert g == e["ids"], repr(e["text"])


def test_packed_path_matches_golden(tok, golden):
    from tekken_tpu.ops.packed import PackedEncoder
    enc = PackedEncoder(tok, rows=len(golden["entries"]), row_len=256)
    texts = [e["text"] for e in golden["entries"]]
    got = enc.encode_batch(texts)
    shift = tok.num_special_tokens()
    bos, eos = tok.bos_id(), tok.eos_id()
    for e, g in zip(golden["entries"], got):
        full = [bos] + [r + shift for r in g] + [eos]
        assert full == e["ids"], repr(e["text"])


def test_native_engine_matches_golden(tok, golden):
    pytest.importorskip("tekken_tpu.native.engine")
    try:
        from tekken_tpu.native import NativeEncoder
        ne = NativeEncoder(tok)
    except Exception:
        pytest.skip("native engine not built")
    shift = tok.num_special_tokens()
    bos, eos = tok.bos_id(), tok.eos_id()
    for e in golden["entries"]:
        ranks = ne.encode(e["text"])
        full = [bos] + [r + shift for r in ranks] + [eos]
        assert full == e["ids"], repr(e["text"])


def test_golden_decode_round_trip(tok, golden):
    from tekken_tpu import SpecialTokenPolicy
    for e in golden["entries"]:
        assert tok.decode(e["ids"], SpecialTokenPolicy.IGNORE) == e["text"]
