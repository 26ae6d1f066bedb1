"""Batched encode pipeline: the device path behind Tekkenizer.encode_batch.

Pipeline per batch of documents:
  host:  UTF-8 bytes, pre-tokenization into pieces (oracle-exact vectorized
         rules; see ops/pretokenize.py for the device variant)
  device: pieces bucketed by length into (B, P) lanes; per-piece argmin BPE
         merge kernel (ops/bpe.py) with the pair table replicated in HBM
  host:  reassembly into per-document rank lists

Pieces longer than the largest bucket (rare pathological inputs like a
thousand-character word) fall back to the scalar oracle so parity is
unconditional.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..oracle import byte_pair_merge, pretokenize

BUCKETS = (16, 32, 64, 128, 256)


class JaxEncoder:
    """Device-table holder + batched encode for one Tekkenizer."""

    def __init__(self, tokenizer):
        import jax.numpy as jnp

        self._tok = tokenizer
        table = tokenizer.pair_table()
        self._key_left = jnp.asarray(table.key_left)
        self._key_right = jnp.asarray(table.key_right)
        self._values = jnp.asarray(table.values)
        self._max_probes = int(table.max_probes)
        self._ranks = tokenizer.ranks

    def encode_batch(self, texts: Sequence[str]) -> list[list[int]]:
        from .bpe import merge_bucket_fn

        # --- host: split into pieces ---
        doc_pieces: list[list[bytes]] = []
        for t in texts:
            doc_pieces.append([p.encode("utf-8") for p in pretokenize(t)])

        # piece registry: (doc, slot) -> output ranks
        results: dict[tuple[int, int], list[int]] = {}
        by_bucket: dict[int, list[tuple[int, int, bytes]]] = {b: [] for b in BUCKETS}
        max_bucket = BUCKETS[-1]

        for d, pieces in enumerate(doc_pieces):
            for s, piece in enumerate(pieces):
                n = len(piece)
                whole = self._ranks.get(piece)
                if n == 0:
                    results[(d, s)] = []
                elif whole is not None:
                    # whole-piece fast path (reference engine semantics)
                    results[(d, s)] = [whole]
                elif n == 1:
                    results[(d, s)] = [piece[0]]
                elif n > max_bucket:
                    results[(d, s)] = byte_pair_merge(piece, self._ranks)
                else:
                    for b in BUCKETS:
                        if n <= b:
                            by_bucket[b].append((d, s, piece))
                            break

        # --- device: merge per bucket ---
        import jax.numpy as jnp

        for P, items in by_bucket.items():
            if not items:
                continue
            B = len(items)
            ranks0 = np.zeros((B, P), dtype=np.int32)
            lengths = np.zeros(B, dtype=np.int32)
            for i, (_, _, piece) in enumerate(items):
                arr = np.frombuffer(piece, dtype=np.uint8)
                ranks0[i, :len(arr)] = arr
                lengths[i] = len(arr)
            merge = merge_bucket_fn(P, self._max_probes)
            out, n_out = merge(jnp.asarray(ranks0), jnp.asarray(lengths),
                               self._key_left, self._key_right, self._values)
            out = np.asarray(out)
            n_out = np.asarray(n_out)
            for i, (d, s, _) in enumerate(items):
                results[(d, s)] = out[i, :n_out[i]].tolist()

        # --- host: reassemble ---
        return [
            [r for s in range(len(pieces)) for r in results[(d, s)]]
            for d, pieces in enumerate(doc_pieces)
        ]
