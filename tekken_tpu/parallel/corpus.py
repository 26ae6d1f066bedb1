"""Streaming corpus encoder: sharded text files -> DP encode -> counters.

The BASELINE configs[4] pipeline shape: a corpus sharded into files is
streamed batch-by-batch through the DistributedEncoder (documents
dp-sharded over the mesh, tables replicated, byte/token counters psum'd),
with throughput metering.  Output token streams can be written as JSONL or
consumed via callback.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterable, Iterator, Optional

from ..utils.timing import Meter
from .encode import DistributedEncoder


def iter_corpus_lines(paths: Iterable[str]) -> Iterator[str]:
    """Stream documents (one per line) from a list of shard files."""
    for path in paths:
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if line:
                    yield line


def find_shards(root: str, suffix: str = ".txt") -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(suffix):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


class CorpusEncoder:
    """Batch-streaming wrapper around DistributedEncoder."""

    def __init__(self, tokenizer, mesh=None, rows: int = 64,
                 row_len: int = 2048):
        self._enc = DistributedEncoder(tokenizer, mesh=mesh, rows=rows,
                                       row_len=row_len)
        self._rows = rows
        self._row_len = row_len
        self._shift = tokenizer.num_special_tokens()
        self.meter = Meter()

    def encode_stream(
        self,
        docs: Iterable[str],
        on_batch: Optional[Callable] = None,
        add_special_shift: bool = True,
    ) -> dict:
        """Encode a document stream; returns aggregate counters.

        ``on_batch(doc_ids: list[list[int]])`` receives batches of public
        token ids in input order.  Documents longer than the row budget go
        through the host oracle (exact per-document semantics, order
        preserved by flushing the pending device batch first).
        """
        from ..oracle import encode_ranks

        shift = self._shift if add_special_shift else 0
        batch: list[str] = []
        total_docs = 0
        n_oversized = 0

        def flush():
            nonlocal batch
            if not batch:
                return
            with self.meter.measure():
                docs_ids, n_bytes, n_tokens = self._enc.encode_batch(batch)
            self.meter.bytes_total += n_bytes
            self.meter.tokens_total += n_tokens
            if on_batch is not None:
                on_batch([[t + shift for t in d] for d in docs_ids])
            batch = []

        for doc in docs:
            total_docs += 1
            if len(doc.encode("utf-8")) > self._row_len:
                n_oversized += 1
                flush()  # keep output in input order
                with self.meter.measure(n_bytes=len(doc.encode("utf-8"))):
                    ranks = encode_ranks(doc, self._enc._ranks)
                self.meter.tokens_total += len(ranks)
                if on_batch is not None:
                    on_batch([[r + shift for r in ranks]])
                continue
            batch.append(doc)
            if len(batch) == self._rows:
                flush()
        flush()

        return {
            "documents": total_docs,
            "oversized_documents": n_oversized,
            **self.meter.summary(),
        }

    def encode_files_to_jsonl(self, shard_paths: Iterable[str],
                              out_path: str) -> dict:
        """Encode corpus shards and write one JSON id-list per line."""
        with open(out_path, "w") as out:
            def sink(batch_ids):
                for ids in batch_ids:
                    out.write(json.dumps(ids) + "\n")
            return self.encode_stream(iter_corpus_lines(shard_paths),
                                      on_batch=sink)
