"""Fully-on-device flat encode: boundaries + BPE merge over a byte buffer.

The differential-testing engine (NOT the production path — that is
ops/packed.py; see docs/PARITY.md for the engine hierarchy): an
independent device formulation of the same semantics, fuzzed against the
oracle and the packed kernel.  Documents are packed into rows of a
(B, row_len) byte matrix; piece boundaries are computed per row (documents
are independent — run-relative rules like digit triples must not see
neighbor docs) with the vectorized pretokenizer vmapped over rows; the BPE
merge then runs on the flattened buffer with *per-piece* lowest-rank-first
semantics — each round performs one argmin merge in every piece
simultaneously via piece-segmented lexicographic min scans.  No host work
between padding the input and reading back the token stream.

Exactness: identical merge order per piece as the scalar oracle (see
ops/bpe.py for why cross-pair parallelism inside a piece is unsafe);
pieces are independent so cross-piece parallelism is free.
"""

from __future__ import annotations

import functools

import numpy as np

from .bpe import INF, probe_pairs
from .pretokenize import byte_boundaries


def _seg_lexmin_suffix(values, idx, end_mark):
    """Per-segment suffix lexicographic (value, idx) min; segments delimited
    by end_mark=True at their last element (scan runs right-to-left)."""
    import jax
    import jax.numpy as jnp

    values, idx, reset = values[::-1], idx[::-1], end_mark[::-1]

    def combine(a, b):
        va, ia, ra = a
        vb, ib, rb = b
        take_b = (vb < va) | ((vb == va) & (ib < ia))
        mv = jnp.where(take_b, vb, va)
        mi = jnp.where(take_b, ib, ia)
        return (jnp.where(rb, vb, mv), jnp.where(rb, ib, mi), ra | rb)

    v, i, _ = jax.lax.associative_scan(combine, (values, idx, reset))
    return v[::-1], i[::-1]


def _seg_first(values, reset):
    import jax
    import jax.numpy as jnp

    def combine(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, va), ra | rb

    v, _ = jax.lax.associative_scan(combine, (values, reset))
    return v


def _seg_polyhash(byte_vals, boundary, k: int):
    """Per-position polynomial hash of the piece prefix ending there:
    ``h[i] = sum_j b[j] * k^(i-j) mod 2^32`` over the piece containing i
    (reset at boundary=True).  At a piece's last byte this is the piece's
    ``vocab.poly_sig`` — concatenation is ``h_a * k^len_b + h_b``, so one
    segmented associative scan computes every piece's signature."""
    import jax
    import jax.numpy as jnp

    h0 = byte_vals.astype(jnp.uint32)
    p0 = jnp.full(byte_vals.shape, np.uint32(k), dtype=jnp.uint32)

    def combine(a, b):
        ha, pa, ra = a
        hb, pb, rb = b
        return (jnp.where(rb, hb, ha * pb + hb),
                jnp.where(rb, pb, pa * pb),
                ra | rb)

    h, _, _ = jax.lax.associative_scan(combine, (h0, p0, boundary))
    return h


def _seg_polyhash_suffix(byte_vals, is_last, k: int):
    """Per-position suffix polynomial hash anchored at the piece END:
    ``g[i] = sum_{t=i..end} b_t * k^(end-t)`` (pieces delimited by
    is_last=True at their final byte), plus the accumulated power
    ``p[i] = k^(end-i+1)``.  Runs right-to-left; the combine is the forward
    one with operand roles swapped (extending a suffix block on its LEFT
    adds the new byte at the highest power): ``g = g_left_part *
    p_right_part + g_right_part`` becomes, in reversed scan order,
    ``g = v_b * p_a + v_a``.  Returns (g, p)."""
    import jax
    import jax.numpy as jnp

    h0 = byte_vals[::-1].astype(jnp.uint32)
    p0 = jnp.full(byte_vals.shape, np.uint32(k), dtype=jnp.uint32)
    reset = is_last[::-1]

    def combine(a, b):
        ha, pa, ra = a
        hb, pb, rb = b
        return (jnp.where(rb, hb, hb * pa + ha),
                jnp.where(rb, pb, pa * pb),
                ra | rb)

    g, p, _ = jax.lax.associative_scan(combine, (h0, p0, reset))
    return g[::-1], p[::-1]


def flat_encode_impl(byts, lengths, key_left, key_right, values,
                     max_probes: int, piece_packed=None, token_byte_rows=None,
                     poly_k: int = 0, pseed1: int = 0, pseed2: int = 0):
    """Flat encode over a (B, R) document-row buffer (trace-time shapes).

    Returns (out_ranks i32[N] left-aligned -1-padded, out_pos i32[N] flat
    byte position of each output token, n_out), with N = B*R.  Un-jitted so
    the parallel layer can wrap it in shard_map; make_encode_flat adds jit.

    When ``piece_packed`` (a vocab.CuckooPieceTable) and ``token_byte_rows``
    (DecodeTable.padded_rows, shape (V, Lcap)) are given, pieces whose bytes
    ARE a vocab token take the whole-piece fast path (reference engine
    semantics) before any merging: signature via one segmented scan, a
    two-row-gather cuckoo probe, then exact byte verification (one element
    gather per input byte).
    """
    import jax
    import jax.numpy as jnp

    B, R = byts.shape
    N = B * R

    if True:
        # per-row boundaries (docs are independent), then flatten
        row_bound = jax.vmap(byte_boundaries)(byts, lengths)
        boundary = row_bound.reshape(N)

        idx = jnp.arange(N, dtype=jnp.int32)
        col = idx % R
        # 2D broadcast compare, not lengths[idx // R] (an N-index gather)
        valid = (jnp.arange(R, dtype=jnp.int32)[None, :]
                 < lengths[:, None]).reshape(N)

        piece_id = jnp.cumsum(boundary.astype(jnp.int32)) - 1
        rank = jnp.where(valid, byts.reshape(N).astype(jnp.int32), -1)
        nxt = idx + 1
        prv = idx - 1
        alive = valid

        # broadcast-from-start of an increasing sequence = native cummax
        pstart = jax.lax.cummax(jnp.where(boundary, idx, -1))

        def gather(arr, i, fill):
            ok = (i >= 0) & (i < N)
            return jnp.where(ok, arr[jnp.clip(i, 0, N - 1)], fill)

        # neighbor context via static slices (not gathers)
        same_piece = ~jnp.concatenate([boundary[1:],
                                       jnp.ones(1, dtype=bool)])
        right0 = jnp.where(same_piece,
                           jnp.concatenate([rank[1:],
                                            jnp.full(1, -1, jnp.int32)]), -1)
        pr = probe_pairs(rank, right0, key_left, key_right, values, max_probes)
        pr = jnp.where(valid, pr, INF)

        boundary_next = jnp.concatenate([boundary[1:], jnp.ones(1, dtype=bool)])

        if piece_packed is not None and poly_k:
            # --- whole-piece fast path (flat layout) ---
            from .bpe import INF as _INF
            from .packed import probe2

            next_valid = jnp.concatenate([valid[1:],
                                          jnp.zeros(1, dtype=bool)])
            is_last = (boundary_next | ~next_valid) & valid
            offset = idx - pstart
            BIGN = jnp.int32(1 << 30)
            last_pos = jax.lax.cummin(
                jnp.where(is_last, idx, BIGN)[::-1])[::-1]
            plen = jnp.where(valid, last_pos - pstart + 1, 0)

            byte_u = jnp.where(valid, byts.reshape(N), 0)
            h = _seg_polyhash(byte_u, boundary, poly_k)
            pend = pstart + plen - 1
            sig = jnp.where((pend >= 0) & (pend < N),
                            h[jnp.clip(pend, 0, N - 1)], jnp.uint32(0))
            sig31 = (sig & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)

            cand = probe2(sig31,
                          jnp.where(valid & (plen >= 2), plen, -1),
                          piece_packed, pseed1, pseed2)
            found = jnp.where(cand == _INF, -1, cand)

            # exact verification: candidate token byte at this offset
            V, Lcap = token_byte_rows.shape
            tb_flat = token_byte_rows.reshape(V * Lcap)
            vidx = jnp.clip(jnp.maximum(found, 0) * Lcap + offset,
                            0, V * Lcap - 1)
            ok_pos = (found >= 0) & (tb_flat[vidx] == byte_u) & valid

            # segmented AND over each piece (suffix scan), read at pstart
            def and_combine(a, b):
                va, ra = a
                vb, rb = b
                return jnp.where(rb, vb, va & vb), ra | rb
            ok_all, _ = jax.lax.associative_scan(
                and_combine, (ok_pos[::-1], is_last[::-1]))
            ok_piece_at_start = gather(ok_all[::-1], pstart, False)
            hit_piece = (found >= 0) & ok_piece_at_start & (plen >= 2) & valid

            rank = jnp.where(hit_piece & boundary, found, rank)
            alive = alive & ~(hit_piece & ~boundary)
            pr = jnp.where(hit_piece, INF, pr)

        def cond(state):
            return jnp.any(state[1] < INF)

        def body(state):
            rank, pr, nxt, prv, alive = state
            sfx_v, sfx_i = _seg_lexmin_suffix(pr, idx, boundary_next)
            min_v = gather(sfx_v, pstart, INF)
            min_i = gather(sfx_i, pstart, -1)
            is_m = (pr < INF) & (min_v == pr) & (min_i == idx)

            j = jnp.where(is_m, nxt, N)
            nj = gather(nxt, j, N)
            at_j = jnp.zeros(N, dtype=bool).at[j].set(is_m, mode="drop")

            rank = jnp.where(is_m, pr, rank)
            alive = alive & ~at_j
            nxt = jnp.where(is_m, nj, nxt)
            prv = prv.at[jnp.where(is_m, nj, N)].set(idx, mode="drop")
            pr = jnp.where(at_j, INF, pr)

            # recompute pr at merge positions: (rank[m], rank[nxt[m]])
            same = gather(piece_id, nxt, -2) == piece_id
            r_right = jnp.where(same & is_m, gather(rank, nxt, -1), -1)
            new_pm = probe_pairs(jnp.where(is_m, rank, -1), r_right,
                                 key_left, key_right, values, max_probes)
            pr = jnp.where(is_m, new_pm, pr)

            # recompute pr at prv[m]: (rank[pm], rank[m])
            pm = jnp.where(is_m, prv, -1)
            pm_ok = (pm >= 0) & (gather(piece_id, pm, -2) == piece_id)
            l_rank = jnp.where(pm_ok, gather(rank, pm, -1), -1)
            new_pp = probe_pairs(l_rank, jnp.where(pm_ok, rank, -1),
                                 key_left, key_right, values, max_probes)
            pr = pr.at[jnp.where(pm_ok, pm, N)].set(
                jnp.where(pm_ok, new_pp, INF), mode="drop")

            return rank, pr, nxt, prv, alive

        rank, pr, nxt, prv, alive = jax.lax.while_loop(
            cond, body, (rank, pr, nxt, prv, alive))

        order = jnp.cumsum(alive.astype(jnp.int32)) - 1
        scatter_idx = jnp.where(alive, order, N)
        out = jnp.full(N, -1, dtype=jnp.int32).at[scatter_idx].set(
            rank, mode="drop")
        out_pos = jnp.full(N, -1, dtype=jnp.int32).at[scatter_idx].set(
            idx, mode="drop")
        n_out = jnp.sum(alive.astype(jnp.int32))
        return out, out_pos, n_out


@functools.lru_cache(maxsize=8)
def encode_flat_fn(B: int, R: int, max_probes: int, poly_k: int = 0,
                   pseed1: int = 0, pseed2: int = 0):
    """Jitted flat encoder specialized to a (B, R) buffer shape."""
    import functools as ft
    import jax

    del B, R  # shapes are recovered from the traced arguments
    return jax.jit(ft.partial(flat_encode_impl, max_probes=max_probes,
                              poly_k=poly_k, pseed1=pseed1, pseed2=pseed2))


class FlatEncoder:
    """Host wrapper: documents -> flat device encode -> per-doc rank lists.

    Reference/testing path (PackedEncoder in ops/packed.py is the
    production path).  Includes the whole-piece fast path — a piece whose
    bytes ARE a vocab token encodes as that token before any merging, the
    reference engine's semantics — via a segmented polynomial signature
    scan + exact byte verification, so parity with the oracle holds even on
    vocabularies with merge-unreachable tokens."""

    def __init__(self, tokenizer, rows: int = 64, row_len: int = 1024):
        import jax.numpy as jnp

        table = tokenizer.pair_table()
        self._key_left = jnp.asarray(table.key_left)
        self._key_right = jnp.asarray(table.key_right)
        self._values = jnp.asarray(table.values)
        self._max_probes = int(table.max_probes)
        pt = tokenizer.piece_table()
        self._piece_packed = jnp.asarray(pt.packed)
        self._token_byte_rows = jnp.asarray(
            tokenizer.decode_table.padded_rows())
        self._poly_k = int(pt.k)
        self._pseed1 = int(pt.seed1)
        self._pseed2 = int(pt.seed2)
        self._B = rows
        self._R = row_len

    def pack(self, texts):
        datas = [t.encode("utf-8") for t in texts]
        if len(datas) > self._B:
            raise ValueError(f"{len(datas)} docs exceed {self._B} rows")
        buf = np.zeros((self._B, self._R), dtype=np.uint8)
        lengths = np.zeros(self._B, dtype=np.int32)
        for i, d in enumerate(datas):
            if len(d) > self._R:
                raise ValueError(f"doc of {len(d)} bytes exceeds row {self._R}")
            if d:
                buf[i, :len(d)] = np.frombuffer(d, dtype=np.uint8)
            lengths[i] = len(d)
        return buf, lengths

    def encode_batch(self, texts):
        import jax.numpy as jnp

        buf, lengths = self.pack(texts)
        fn = encode_flat_fn(self._B, self._R, self._max_probes,
                            self._poly_k, self._pseed1, self._pseed2)
        out, out_pos, n_out = fn(jnp.asarray(buf), jnp.asarray(lengths),
                                 self._key_left, self._key_right, self._values,
                                 piece_packed=self._piece_packed,
                                 token_byte_rows=self._token_byte_rows)
        out = np.asarray(out)[:int(n_out)]
        out_pos = np.asarray(out_pos)[:int(n_out)]
        rows = out_pos // self._R
        cut = np.searchsorted(rows, np.arange(len(texts) + 1))
        return [out[cut[i]:cut[i + 1]].tolist() for i in range(len(texts))]
