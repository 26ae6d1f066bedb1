"""Data-parallel distributed encode over a jax.sharding.Mesh.

TPU-native scale-out (new surface vs the reference, which is single-threaded
— SURVEY.md section 2.3): document rows are sharded over the ``dp`` mesh
axis, the packed cuckoo pair table is replicated in every chip's HBM, each
shard runs the packed encode kernel locally (document-granular data
parallelism is exact: documents are independent), and byte/token counters
are reduced with ``psum`` collectives riding ICI.
"""

from __future__ import annotations

import numpy as np

from ..ops.packed import packed_encode_impl
from .mesh import dp_sharded, make_dp_mesh, replicated


class DistributedEncoder:
    """Multi-chip data-parallel encoder.

    ``rows`` is the global document-row count (must divide by mesh size);
    ``row_len`` the padded per-document byte budget.
    """

    def __init__(self, tokenizer, mesh=None, rows: int = 64,
                 row_len: int = 1024, np_cap: int | None = None,
                 merge: str = "device"):
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        n = self.mesh.devices.size
        if rows % n:
            raise ValueError(f"rows ({rows}) must divide mesh size ({n})")
        self._B = rows
        self._R = row_len
        from ..ops.packed import default_np_cap, oracle_merge_fn
        self._shard_cap = (np_cap if np_cap is not None
                           else default_np_cap((rows // n) * row_len))
        if merge not in ("host", "device"):
            raise ValueError(f"merge must be 'host' or 'device': {merge!r}")
        self._host_merge = merge == "host"
        native = tokenizer._get_native_encoder()
        self._native = native
        self._merge_fn = (native.merge_spans if native is not None
                          else oracle_merge_fn(tokenizer.ranks))
        self.last_overflow_rows = 0  # psum'd count from the last batch

        table = tokenizer.cuckoo_table()
        self._seed1 = int(table.seed1)
        self._seed2 = int(table.seed2)
        wm = tokenizer.word_map()
        self._wseed = int(wm.seed)
        # broadcast once: replicated in HBM on every device
        self._packed = replicated(self.mesh, np.asarray(table.packed))
        self._dense = replicated(self.mesh, table.byte_pair_dense())
        self._wrows = replicated(self.mesh, wm.rows)
        self._ranks = tokenizer.ranks

        self._steps: dict = {}

    def _build_step(self, route):
        import jax
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        seed1, seed2, cap = self._seed1, self._seed2, self._shard_cap
        ws, hm = self._wseed, self._host_merge

        def shard_fn(byts, lengths, packed, dense, wrows):
            (tok, n_out, fb_start, fb_len, overflow,
             row_bad) = packed_encode_impl(
                byts, lengths, packed, dense, wrows,
                seed1, seed2, wseed=ws, np_cap=cap, host_merge=hm,
                route=route)
            total_bytes = jax.lax.psum(jax.numpy.sum(lengths), "dp")
            total_tokens = jax.lax.psum(n_out, "dp")
            # pod-visible overflow observability (VERDICT r4 item 6):
            # operators see how many document rows fell back to host
            overflow_rows = jax.lax.psum(jax.numpy.sum(row_bad), "dp")
            return (tok, n_out[None], fb_start, fb_len, overflow[None],
                    row_bad, total_bytes, total_tokens, overflow_rows)

        kwargs = dict(
            mesh=self.mesh,
            in_specs=(P("dp", None), P("dp"), P(), P(), P()),
            out_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                       P("dp"), P(), P(), P()),
        )
        try:
            sharded = shard_map(shard_fn, check_vma=False, **kwargs)
        except TypeError:  # older jax spells it check_rep
            sharded = shard_map(shard_fn, check_rep=False, **kwargs)
        return jax.jit(sharded)

    def encode_step(self, buf: np.ndarray, lengths: np.ndarray,
                    route: int | None = None):
        """One jitted distributed step over a packed (rows, row_len) buffer.

        ``route`` is the host-side static routing decision (the same
        values as ops/packed.host_route; VERDICT r3 item 2 — without it
        every shard ran the byte-granular cond-chain pipeline).  The
        buffer-global route is conservative for every shard: route 1's
        predicates hold only if they hold on every row, and routes 2/3
        handle any ASCII / any input respectively.  ``None`` keeps the
        device cond chain (callers that never see the data).

        Returns (tok, n_out_per_shard, fb_start, fb_len, overflow_per_shard,
        row_bad, total_bytes, total_tokens, overflow_rows); tok is the
        dp-sharded uncompacted token stream — tok[i] >= 0 is the token
        whose piece starts at flat byte i; row_bad marks document rows
        whose pieces overflowed the merge buckets (host re-encodes exactly
        those), and overflow_rows is their psum'd global count.
        """
        # one jitted step per (route, pallas, p23) variant; pallas_enabled
        # and _use_p23 are part of the key for the same staleness reason as
        # ops/packed.packed_encode_fn (both are read at trace time; a
        # toggled env knob must not serve a stale trace of the other
        # pipeline variant — ADVICE r3/r4)
        from ..ops.packed import _fb_len_limit, _use_p23
        from ..ops.pallas_stage1 import pallas_enabled
        key = (route, pallas_enabled(), _use_p23(), _fb_len_limit())
        step = self._steps.get(key)
        if step is None:
            step = self._steps[key] = self._build_step(route)
        byts = dp_sharded(self.mesh, buf)
        lens = dp_sharded(self.mesh, lengths)
        return step(byts, lens, self._packed, self._dense,
                    self._wrows)

    def encode_batch(self, texts):
        """Convenience: texts -> per-doc rank lists + psum'd counters.

        Routing is per ROW GROUP as in PackedEncoder (round 5): when the
        batch mixes routes, each route's docs run in their own (smaller,
        mesh-divisible) distributed step, so one UTF-8 doc no longer
        demotes every shard to the byte-granular char path.
        TEKKEN_TPU_GROUP_ROUTES=0 restores buffer-global routing."""
        import os

        from ..ops.packed import doc_routes, host_route

        if len(texts) > self._B:
            raise ValueError(f"{len(texts)} docs exceed {self._B} rows")
        buf, lengths = self._pack(texts, self._B)
        routes = doc_routes(buf)[:len(texts)]
        distinct = sorted(set(routes.tolist())) if len(texts) else [1]
        if (len(distinct) <= 1
                or os.environ.get("TEKKEN_TPU_GROUP_ROUTES", "1") == "0"):
            return self._encode_buffer(buf, lengths, len(texts),
                                       host_route(buf))

        n = self.mesh.devices.size
        results: list = [None] * len(texts)
        total_bytes = 0
        n_tokens = 0
        overflow_rows = 0
        for r in distinct:
            idx = np.flatnonzero(routes == r)
            Bg = n
            while Bg < idx.size:
                Bg <<= 1
            Bg = min(Bg, self._B)
            for lo in range(0, idx.size, Bg):
                sel = idx[lo:lo + Bg]
                sub = [texts[int(i)] for i in sel]
                sub_buf, sub_len = self._pack(sub, Bg)
                docs_g, bytes_g, toks_g = self._encode_buffer(
                    sub_buf, sub_len, len(sub), int(r))
                overflow_rows += self.last_overflow_rows
                total_bytes += bytes_g
                n_tokens += toks_g
                for j, i in enumerate(sel):
                    results[int(i)] = docs_g[j]
        self.last_overflow_rows = overflow_rows
        return results, total_bytes, n_tokens

    def _pack(self, texts, rows: int):
        buf = np.zeros((rows, self._R), dtype=np.uint8)
        lengths = np.zeros(rows, dtype=np.int32)
        for i, t in enumerate(texts):
            d = t.encode("utf-8")
            if len(d) > self._R:
                raise ValueError(f"doc of {len(d)} bytes exceeds row "
                                 f"{self._R}")
            if d:
                buf[i, :len(d)] = np.frombuffer(d, dtype=np.uint8)
            lengths[i] = len(d)
        return buf, lengths

    def _encode_buffer(self, buf, lengths, n_docs: int, route: int):
        """One distributed step over a packed (Bg, R) buffer + host
        post-processing (fb splice, per-row overflow fallback)."""
        from ..ops.packed import splice_host_merges

        (tok, n_out, fb_start, fb_len, overflow, row_bad, total_bytes,
         total_tokens, overflow_rows) = self.encode_step(
             buf, lengths, route=route)

        n_shards = self.mesh.devices.size
        rows_per_shard = buf.shape[0] // n_shards
        shard_n = rows_per_shard * self._R
        tok = np.asarray(tok)
        n_out = np.asarray(n_out)
        fb_start = np.asarray(fb_start)
        fb_len = np.asarray(fb_len)
        row_bad = np.asarray(row_bad)
        flat = buf.reshape(-1)

        def host_encode_row(row: int) -> list[int]:
            data = flat[row * self._R:
                        row * self._R + lengths[row]].tobytes()
            text = data.decode("utf-8")
            native = self._native
            if native is not None:
                return native.encode(text)
            from ..oracle import encode_ranks
            return encode_ranks(text, self._ranks)

        docs: list[list[int]] = []
        corrected = False  # host fallbacks change the device token counts
        for s in range(n_shards):
            stok = tok[s * shard_n:(s + 1) * shard_n]
            pos = np.flatnonzero(stok >= 0).astype(np.int64)
            block = stok[pos]
            # bulk-merge + splice the shard's recorded miss spans (all
            # misses in host mode; only oversize pieces in device mode)
            fb_lo = s * (fb_start.shape[0] // n_shards)
            fb_hi = (s + 1) * (fb_start.shape[0] // n_shards)
            had_fb = bool((fb_start[fb_lo:fb_hi] >= 0).any())
            if had_fb:
                block, pos = splice_host_merges(
                    block, pos, flat, fb_start[fb_lo:fb_hi],
                    fb_len[fb_lo:fb_hi], self._merge_fn,
                    base=s * shard_n)
                corrected = True  # spliced tokens aren't in device counts
            rows = pos // self._R  # local row within shard
            cut = np.searchsorted(rows, np.arange(rows_per_shard + 1))
            for r in range(rows_per_shard):
                row = s * rows_per_shard + r
                if row_bad[row]:
                    # bucket overflow corrupts only this row: re-encode it
                    # alone on host (VERDICT r4 item 6 — the shard's other
                    # rows keep their device tokens)
                    corrected = True
                    docs.append(host_encode_row(row))
                else:
                    docs.append(block[cut[r]:cut[r + 1]].tolist())

        docs = docs[:n_docs]
        n_tokens = (sum(len(d) for d in docs) if corrected
                    else int(total_tokens))
        self.last_overflow_rows = int(overflow_rows)
        return docs, int(total_bytes), n_tokens
