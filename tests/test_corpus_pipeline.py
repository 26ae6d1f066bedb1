"""Streaming corpus pipeline over the distributed encoder."""

import json

import pytest

from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.parallel.corpus import CorpusEncoder, find_shards


@pytest.fixture(scope="module")
def tok():
    return build_synthetic_tokenizer(num_merges=200)


def test_encode_files_to_jsonl(tok, tmp_path):
    shard_dir = tmp_path / "corpus"
    shard_dir.mkdir()
    docs = [f"document {i}: it's sample text {i * 7}" for i in range(23)]
    (shard_dir / "a.txt").write_text("\n".join(docs[:10]) + "\n")
    (shard_dir / "b.txt").write_text("\n".join(docs[10:]) + "\n")
    # one oversized doc forces the host path
    (shard_dir / "c.txt").write_text("x" * 2000 + "\n")

    enc = CorpusEncoder(tok, rows=8, row_len=256)
    out = tmp_path / "out.jsonl"
    stats = enc.encode_files_to_jsonl(find_shards(str(shard_dir)), str(out))

    assert stats["documents"] == 24
    assert stats["oversized_documents"] == 1
    assert stats["bytes"] == sum(len(d.encode()) for d in docs) + 2000
    lines = [json.loads(x) for x in out.read_text().splitlines()]
    assert len(lines) == 24
    assert stats["tokens"] == sum(len(x) for x in lines)

    # parity on a couple of docs (public id space)
    want = tok.encode(docs[0], False, False)
    assert lines[0] == want
    assert lines[-1] == tok.encode("x" * 2000, False, False)
