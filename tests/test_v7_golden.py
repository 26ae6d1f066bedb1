"""V7 conformance corpus — the reference's golden token-id tests.

The reference's 131k-entry V7 ``tekken.json`` asset is stripped from this
checkout (reference: .MISSING_LARGE_BLOBS), so these tests are gated on a
real model file supplied via the TEKKEN_JSON environment variable.  The
expected vectors are the reference's own goldens
(reference: tests/test_tokenizer_output.rs; tests/test_rust_tokenizer.rs).
"""

import os

import pytest

TEKKEN_JSON = os.environ.get("TEKKEN_JSON", "")

pytestmark = pytest.mark.skipif(
    not (TEKKEN_JSON and os.path.exists(TEKKEN_JSON)),
    reason="real V7 tekken.json not available (set TEKKEN_JSON)")


@pytest.fixture(scope="module")
def v7():
    from tekken_tpu import Tekkenizer
    return Tekkenizer.from_file(TEKKEN_JSON)


# (input, expected ids) — reference: tests/test_tokenizer_output.rs
GOLDEN = [
    ("Hello, world!", [22177, 1044, 4304, 1033]),
    ("The quick brown fox jumps over the lazy dog.",
     [1784, 7586, 22980, 94137, 72993, 2136, 1278, 42757, 10575, 1046]),
    ("This is a test of the Mistral Tekken tokenizer.",
     [4380, 1395, 1261, 2688, 1307, 1278, 42301, 2784, 47213, 3569,
      128405, 1046]),
    ("Emojis and unicode characters work too!",
     [5969, 3659, 1275, 1321, 79219, 11084, 2196, 4382, 1033]),
    ("Hello", [22177]),
    ("world", [34049]),
    ("test", [4417]),
    ("a", [1097]),
    ("the", [3265]),
    ("Python", [46728]),
    ("Rust", [1082, 1616]),
    ("tokenizer", [15017, 7463]),
    ("encoding", [47130]),
    ("decoding", [18888, 7967]),
    ("comparison", [69959, 3693]),
    ("Simple sentence.", [28683, 19286, 1046]),
    ("Another test case with numbers: 123, 456, 789.",
     [18661, 2688, 2937, 1454, 8091, 1058, 1032, 1049, 1050, 1051, 1044,
      1032, 1052, 1053, 1054, 1044, 1032, 1055, 1056, 1057, 1046]),
    ("Special characters: @#$%^&*()_+-={}[]|\\:;\"'<>,.?/",
     [40124, 11084, 1058, 2126, 1035, 1036, 1037, 1094, 1038, 1042, 1690,
      1095, 104799, 3181, 1125, 4344, 17743, 1058, 36211, 96726, 24482,
      1046, 1063, 1047]),
    ("Mixed CaSe WoRdS", [1077, 5422, 10645, 3201, 18739, 1082, 1100, 1083]),
    ("   whitespace   handling   ", [1256, 81024, 1256, 21490, 1293]),
]


def test_v7_metadata(v7):
    from tekken_tpu import TokenizerVersion
    assert v7.vocab_size() == 131072
    assert v7.version() is TokenizerVersion.V7
    assert v7.num_special_tokens() == 1000


@pytest.mark.parametrize("text,expected", GOLDEN,
                         ids=[t[:20] for t, _ in GOLDEN])
def test_golden_oracle(v7, text, expected):
    from tekken_tpu import SpecialTokenPolicy
    tokens = v7.encode(text, False, False)
    assert tokens == expected
    assert v7.decode(tokens, SpecialTokenPolicy.IGNORE) == text


@pytest.mark.parametrize("text,expected", GOLDEN[:6],
                         ids=[t[:20] for t, _ in GOLDEN[:6]])
def test_golden_device_path(v7, text, expected):
    got = v7.encode_batch([text])[0]
    assert got == expected


def test_golden_jfk_decode(v7):
    # reference: tests/test_rust_tokenizer.rs:16-19,80
    from tekken_tpu import SpecialTokenPolicy
    ids = [4998, 1878, 1044, 2036, 20574, 20999, 1044, 4237, 1605, 2549,
           2143, 6816, 1710, 1653, 1394, 1636, 1044, 4237, 2549, 1636, 1710,
           1653, 1394, 2143, 6816, 1046, 2]
    text = v7.decode(ids, SpecialTokenPolicy.IGNORE)
    assert text == ("And so, my fellow Americans, ask not what your country "
                    "can do for you, ask what you can do for your country.")
    # full decode equals join of per-token pieces for the non-special run
    joined = "".join(v7.id_to_piece(t) for t in ids[:-1])
    assert v7.decode(ids[:-1], SpecialTokenPolicy.IGNORE) == joined
