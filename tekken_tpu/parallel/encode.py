"""Data-parallel distributed encode over a jax.sharding.Mesh.

TPU-native scale-out (new surface vs the reference, which is single-threaded
— SURVEY.md section 2.3): document rows are sharded over the ``dp`` mesh
axis, the pair table is replicated in every chip's HBM, each shard runs the
flat encode kernel locally (document-granular data parallelism is exact:
documents are independent), and byte/token counters are reduced with
``psum`` collectives riding ICI.
"""

from __future__ import annotations

import numpy as np

from ..ops.flat import flat_encode_impl
from .mesh import dp_sharded, make_dp_mesh, replicated


class DistributedEncoder:
    """Multi-chip data-parallel encoder.

    ``rows`` is the global document-row count (must divide by mesh size);
    ``row_len`` the padded per-document byte budget.
    """

    def __init__(self, tokenizer, mesh=None, rows: int = 64,
                 row_len: int = 1024):
        import jax

        self.mesh = mesh if mesh is not None else make_dp_mesh()
        n = self.mesh.devices.size
        if rows % n:
            raise ValueError(f"rows ({rows}) must divide mesh size ({n})")
        self._B = rows
        self._R = row_len

        table = tokenizer.pair_table()
        self._max_probes = int(table.max_probes)
        # broadcast once: replicated in HBM on every device
        self._key_left = replicated(self.mesh, np.asarray(table.key_left))
        self._key_right = replicated(self.mesh, np.asarray(table.key_right))
        self._values = replicated(self.mesh, np.asarray(table.values))

        self._step = self._build_step()

    def _build_step(self):
        import jax
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        max_probes = self._max_probes

        def shard_fn(byts, lengths, key_left, key_right, values):
            # local shapes: (B/n, R)
            out, out_pos, n_out = flat_encode_impl(
                byts, lengths, key_left, key_right, values, max_probes)
            local_bytes = jax.numpy.sum(lengths)
            total_bytes = jax.lax.psum(local_bytes, "dp")
            total_tokens = jax.lax.psum(n_out, "dp")
            return out, out_pos, n_out[None], total_bytes, total_tokens

        kwargs = dict(
            mesh=self.mesh,
            in_specs=(P("dp", None), P("dp"), P(), P(), P()),
            out_specs=(P("dp"), P("dp"), P("dp"), P(), P()),
        )
        try:
            sharded = shard_map(shard_fn, check_vma=False, **kwargs)
        except TypeError:  # older jax spells it check_rep
            sharded = shard_map(shard_fn, check_rep=False, **kwargs)
        return jax.jit(sharded)

    def encode_step(self, buf: np.ndarray, lengths: np.ndarray):
        """One jitted distributed step over a packed (rows, row_len) buffer.

        Returns (out, out_pos, n_out_per_shard, total_bytes, total_tokens) —
        out/out_pos are dp-sharded flat arrays (one block per shard).
        """
        byts = dp_sharded(self.mesh, buf)
        lens = dp_sharded(self.mesh, lengths)
        return self._step(byts, lens, self._key_left, self._key_right,
                          self._values)

    def encode_batch(self, texts):
        """Convenience: texts -> per-doc rank lists + counters."""
        if len(texts) > self._B:
            raise ValueError(f"{len(texts)} docs exceed {self._B} rows")
        buf = np.zeros((self._B, self._R), dtype=np.uint8)
        lengths = np.zeros(self._B, dtype=np.int32)
        for i, t in enumerate(texts):
            d = t.encode("utf-8")
            if len(d) > self._R:
                raise ValueError(f"doc of {len(d)} bytes exceeds row "
                                 f"{self._R}")
            if d:
                buf[i, :len(d)] = np.frombuffer(d, dtype=np.uint8)
            lengths[i] = len(d)

        out, out_pos, n_out, total_bytes, total_tokens = self.encode_step(
            buf, lengths)

        n_shards = self.mesh.devices.size
        shard_n = self._B * self._R // n_shards
        out = np.asarray(out)
        out_pos = np.asarray(out_pos)
        n_out = np.asarray(n_out)

        docs: list[list[int]] = []
        # reassemble: shard s holds tokens for rows [s*B/n, (s+1)*B/n)
        rows_per_shard = self._B // n_shards
        for s in range(n_shards):
            block = out[s * shard_n:(s + 1) * shard_n][:n_out[s]]
            pos = out_pos[s * shard_n:(s + 1) * shard_n][:n_out[s]]
            rows = pos // self._R  # local row within shard
            cut = np.searchsorted(rows, np.arange(rows_per_shard + 1))
            for r in range(rows_per_shard):
                docs.append(block[cut[r]:cut[r + 1]].tolist())

        return docs[:len(texts)], int(total_bytes), int(total_tokens)
