"""Packed-piece device encode: the optimized production path (flat-first).

Design (measured on TPU v5e; tools/profile_packed_stages.py and
tools/bench_lookup_primitives.py):
- Whole-piece detection runs in flat byte space: two segmented poly-hash
  scans give every byte its piece's 31-bit signature gather-free; a cuckoo
  probe (2 row-gathers) + one byte-table gather verify exactly.  Pieces
  that ARE vocab tokens — the vast majority of natural text — never touch
  the merge machinery.
- Only vocab-miss pieces are scattered (one width-4 row scatter) into a
  small (NP, P) matrix; per-round argmin is a lane reduction and per-round
  cuckoo re-probes touch only NP rows.
- All pair lookups probe cuckoo tables packed as (size, 4) int32 rows —
  a 4-wide row gather costs the same as a scalar gather on TPU, and cuckoo
  needs exactly two slots.
- Single-byte pieces and whole-piece hits emit tokens elementwise.

Capacity (static shapes): NP rows (default N/16; counts only vocab-miss
pieces) of P = 32 lanes.  Pieces longer than P or beyond row capacity are
flagged and returned for host fallback (scalar oracle), so parity is
unconditional.
"""

from __future__ import annotations

import functools

import numpy as np

from .bpe import INF
from .pretokenize import byte_boundaries

P_LANES = 32


def probe2(left, right, packed, seed1: int, seed2: int):
    """Cuckoo probe: 2 row-gathers.  left/right int32[...]; packed (S, 4).
    Returns merged rank or INF (absent / invalid query)."""
    import jax.numpy as jnp

    size = packed.shape[0]
    mask = jnp.uint32(size - 1)

    l = left.astype(jnp.uint32)
    r = right.astype(jnp.uint32)

    def slot(seed):
        h = (l * jnp.uint32(0x9E3779B1)) ^ (r * jnp.uint32(0x85EBCA77)) \
            ^ jnp.uint32(seed)
        h = h ^ (h >> jnp.uint32(15))
        h = h * jnp.uint32(0xC2B2AE3D)
        h = h ^ (h >> jnp.uint32(13))
        return (h & mask).astype(jnp.int32)

    r1 = packed[slot(seed1)]
    r2 = packed[slot(seed2)]
    hit1 = (r1[..., 0] == left) & (r1[..., 1] == right)
    hit2 = (r2[..., 0] == left) & (r2[..., 1] == right)
    out = jnp.where(hit1, r1[..., 2], jnp.where(hit2, r2[..., 2], INF))
    valid = (left >= 0) & (right >= 0)
    return jnp.where(valid, out, INF)


def _inv_u32(k: int) -> int:
    """Multiplicative inverse of odd k mod 2^32 (Newton iteration)."""
    inv = k
    for _ in range(5):
        inv = (inv * (2 - k * inv)) & 0xFFFFFFFF
    return inv


def packed_encode_impl(byts, lengths, packed_table, dense_tab, piece_packed,
                       token_byte_rows, seed1: int, seed2: int,
                       piece_k: int = 0, pseed1: int = 0, pseed2: int = 0,
                       np_cap: int | None = None, _stage: int | None = None):
    """Encode a (B, R) document-row buffer — flat-first architecture.

    Whole-piece detection runs in FLAT byte space (two segmented poly-hash
    scans give every position its piece's signature gather-free; one cuckoo
    probe + one byte-table gather verify exactly), so only pieces that MISS
    the vocabulary — a few percent of natural text — are scattered into the
    (NP, P) merge matrix.  That shrinks the matrix, its scatters, the merge
    rounds, and the un-scatter by an order of magnitude versus packing
    every multi-byte piece (measured: the matrix machinery dominated the
    old kernel at ~24ms/256KB on v5e; tools/profile_packed_stages.py).

    ``_stage`` (profiling only): cut the pipeline after stage k and return
    a checksum scalar instead of outputs, so per-stage device cost can be
    measured on the live code (XLA dead-code-eliminates the rest).

    Returns (out i32[N] left-aligned tokens, out_pos i32[N] flat byte pos,
    n_out, fb_start i32[NP] byte offsets of fallback pieces (-1 = none),
    fb_len i32[NP], n_mp).  Fallback pieces (longer than P lanes or beyond
    row capacity, and not vocab tokens) produce no tokens on device; the
    host splices oracle results at their positions.  n_mp > np_cap means
    capacity overflow: pieces beyond NP could not even be recorded as
    fallbacks and the host must re-encode the whole batch.
    """
    import jax
    import jax.numpy as jnp

    B, R = byts.shape
    N = B * R
    NP = np_cap if np_cap is not None else max(64, N // 16)

    row_bound = jax.vmap(byte_boundaries)(byts, lengths)
    boundary = row_bound.reshape(N)

    idx = jnp.arange(N, dtype=jnp.int32)
    valid = (idx % R) < lengths[idx // R]
    byte_rank = jnp.where(valid, byts.reshape(N).astype(jnp.int32), -1)

    # "broadcast from segment start" of an increasing sequence is a native
    # cummax, not a generic associative scan (6x cheaper on TPU)
    pstart = jax.lax.cummax(jnp.where(boundary, idx, -1))
    offset = idx - pstart

    # piece length at each byte: position of the piece's last byte (the
    # first is_last >= i, a reverse native cummin) minus the start
    boundary_next = jnp.concatenate([boundary[1:], jnp.ones(1, dtype=bool)])
    is_last = (boundary_next | ~jnp.concatenate(
        [valid[1:], jnp.zeros(1, dtype=bool)])) & valid
    BIGN = jnp.int32(1 << 30)
    last_pos = jax.lax.cummin(jnp.where(is_last, idx, BIGN)[::-1])[::-1]
    plen = jnp.where(valid, last_pos - pstart + 1, 0)

    multi = valid & (plen >= 2)
    is_pstart = boundary & valid
    if _stage == 1:  # scans
        return plen.sum() + pstart.sum()

    # --- whole-piece fast path, flat space (reference engine semantics: a
    # piece whose bytes are a vocab token encodes as that token before any
    # merging).  sig[i] = poly hash of the WHOLE piece containing i,
    # assembled from a forward prefix-hash scan and a reverse suffix-hash
    # scan: sig = h_prefix(i) * k^(end-i) + g_suffix(i+1) — no gathers. ---
    hit_piece = jnp.zeros(N, dtype=bool)
    found = jnp.full(N, -1, jnp.int32)
    if piece_k:
        from .flat import _seg_polyhash, _seg_polyhash_suffix

        byte_u = jnp.where(valid, byts.reshape(N), 0)
        h = _seg_polyhash(byte_u, boundary, piece_k)          # prefix hash
        # suffix hash anchored at the piece end
        # (g[i] = sum_{j>=i in piece} b_j * k^(end-j)) and its power
        # p_rev[i] = k^(end-i+1): the prefix term's multiplier k^(end-i)
        # is exactly p_rev at i+1
        gp, p_rev = _seg_polyhash_suffix(byte_u, is_last, piece_k)
        g_next = jnp.concatenate([gp[1:], jnp.zeros(1, jnp.uint32)])
        p_next = jnp.concatenate([p_rev[1:], jnp.ones(1, jnp.uint32)])
        sfx = jnp.where(is_last, jnp.uint32(0), g_next)
        pw = jnp.where(is_last, jnp.uint32(1), p_next)
        sig = h * pw + sfx
        sig31 = (sig & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        if _stage == 2:  # + piece signatures
            return sig31.sum()

        cand = probe2(sig31, jnp.where(multi, plen, -1),
                      piece_packed, pseed1, pseed2)
        found = jnp.where(cand == INF, -1, cand)

        # exact verification: candidate token byte at this offset
        V, Lcap = token_byte_rows.shape
        tb_flat = token_byte_rows.reshape(V * Lcap)
        vidx = jnp.clip(jnp.maximum(found, 0) * Lcap + offset,
                        0, V * Lcap - 1)
        ok_pos = (found >= 0) & (tb_flat[vidx] == byte_u) & valid
        # suffix AND over each piece; its value at pstart covers the whole
        # piece; broadcast forward with a packed cummax

        def and_comb(a, b):
            va, ra = a
            vb, rb = b
            return jnp.where(rb, vb, va & vb), ra | rb
        ok_sfx, _ = jax.lax.associative_scan(
            and_comb, (ok_pos[::-1], is_last[::-1]))
        ok_sfx = ok_sfx[::-1]
        pc = jax.lax.cummax(jnp.where(
            boundary, idx * 2 + ok_sfx.astype(jnp.int32), -1))
        hit_piece = multi & (found >= 0) & ((pc & 1) == 1)
    if _stage == 3:  # + probe + verify
        return hit_piece.astype(jnp.int32).sum() + found.sum()

    # --- active pieces (vocab misses) get the merge matrix ---
    active = multi & ~hit_piece
    mp_mark = is_pstart & active
    mp_id_at_start = jnp.cumsum(mp_mark.astype(jnp.int32)) - 1
    mp_id = jax.lax.cummax(jnp.where(mp_mark, mp_id_at_start, -1))
    n_mp = jnp.sum(mp_mark.astype(jnp.int32))

    # fallback: oversize (len > P) or capacity overflow
    fb_piece = active & ((plen > P_LANES) | (mp_id >= NP))
    ok = active & ~fb_piece

    # initial pair ranks: segments start as single bytes, so every
    # first-round query is a (byte, byte) pair — one gather from the dense
    # 64K-entry table instead of two cuckoo probes
    nxt_rank = jnp.concatenate([byte_rank[1:], jnp.full(1, -1, jnp.int32)])
    same_piece = jnp.concatenate([boundary[1:] == False,  # noqa: E712
                                  jnp.zeros(1, dtype=bool)]) & valid
    q_ok = same_piece & ok & (nxt_rank >= 0)
    dense_idx = jnp.where(q_ok, byte_rank * 256 + nxt_rank, 0)
    flat_pr = jnp.where(q_ok, dense_tab[dense_idx], INF)

    # --- build the matrices with SEPARATE width-1 scatters: interleaved
    # multi-column row scatters measured 4x slower on TPU
    # (tools/bench_scatter_strategies.py: width-4 10.5ms vs 4x width-1
    # 5.0ms at these shapes) ---
    tgt = jnp.where(ok, mp_id * P_LANES + offset, NP * P_LANES)
    ranks0 = jnp.full(NP * P_LANES, -1, jnp.int32).at[tgt].set(
        byte_rank, mode="drop").reshape(NP, P_LANES)
    pr0 = jnp.full(NP * P_LANES, INF, jnp.int32).at[tgt].set(
        flat_pr, mode="drop").reshape(NP, P_LANES)

    # per-row start/length land at row granularity; a fallback piece owns
    # its row but contributes no lanes, marked by a negative length
    row_write = mp_mark & active & (mp_id < NP)
    tgt_row = jnp.where(row_write, mp_id, NP)
    start0 = jnp.full(NP, -1, jnp.int32).at[tgt_row].set(
        pstart, mode="drop")
    sl = jnp.zeros(NP, jnp.int32).at[tgt_row].set(
        jnp.where(fb_piece, -plen, plen), mode="drop")
    nseg0 = jnp.maximum(sl, 0)
    fb_start = jnp.where(sl < 0, start0, -1)
    fb_len = jnp.where(sl < 0, -sl, 0)
    start0 = jnp.where(sl > 0, start0, -1)
    if _stage == 4:  # + dense probe + matrix scatter
        return (ranks0.sum() + pr0.sum() + start0.sum() + nseg0.sum()
                + fb_start.sum() + fb_len.sum())

    # --- merge rounds (compact-shift layout, ops/bpe.py) ---
    from .bpe import merge_rows_compact

    pos = jnp.arange(P_LANES, dtype=jnp.int32)[None, :]
    rank, n_seg = merge_rows_compact(ranks0, pr0, nseg0, packed_table,
                                     seed1, seed2)
    if _stage == 5:  # + merge rounds
        return rank.sum() + n_seg.sum()

    # --- assemble the token stream ---
    # singles and whole-piece hits are elementwise; only merged-piece lanes
    # scatter back (NP*P rows, an order of magnitude smaller than before)
    single = is_pstart & (plen == 1)
    tok_flat = jnp.where(single, byte_rank,
                         jnp.where(is_pstart & hit_piece, found, -1))
    lane_byte_pos = start0[:, None] + pos            # (NP, P)
    lane_ok = (pos < n_seg[:, None]) & (start0[:, None] >= 0)
    tok_flat = tok_flat.at[
        jnp.where(lane_ok, lane_byte_pos, N)].set(
        jnp.where(lane_ok, rank, -1), mode="drop")
    if _stage == 6:  # + lane un-scatter
        return tok_flat.sum()

    has_tok = tok_flat >= 0
    order = jnp.cumsum(has_tok.astype(jnp.int32)) - 1
    sidx = jnp.where(has_tok, order, N)
    out = jnp.full(N, -1, jnp.int32).at[sidx].set(tok_flat, mode="drop")
    out_pos = jnp.full(N, -1, jnp.int32).at[sidx].set(idx, mode="drop")
    n_out = jnp.sum(has_tok.astype(jnp.int32))
    return out, out_pos, n_out, fb_start, fb_len, n_mp


@functools.lru_cache(maxsize=8)
def packed_encode_fn(seed1: int, seed2: int, np_cap, piece_k: int = 0,
                     pseed1: int = 0, pseed2: int = 0):
    import functools as ft
    import jax

    return jax.jit(ft.partial(packed_encode_impl, seed1=seed1, seed2=seed2,
                              piece_k=piece_k, pseed1=pseed1, pseed2=pseed2,
                              np_cap=np_cap))


class PackedEncoder:
    """Host wrapper over the packed device kernel, with oracle splicing for
    fallback pieces.  Drop-in alternative to ops.flat.FlatEncoder."""

    def __init__(self, tokenizer, rows: int = 64, row_len: int = 1024,
                 np_cap: int | None = None):
        import jax.numpy as jnp

        table = tokenizer.cuckoo_table()
        self._packed = jnp.asarray(table.packed)
        self._dense = jnp.asarray(table.byte_pair_dense())
        self._seed1 = int(table.seed1)
        self._seed2 = int(table.seed2)
        pt = tokenizer.piece_table()
        dt = tokenizer.decode_table
        self._piece_packed = jnp.asarray(pt.packed)
        self._token_bytes = jnp.asarray(dt.padded_rows())
        self._piece_k = int(pt.k)
        self._pseed1 = int(pt.seed1)
        self._pseed2 = int(pt.seed2)
        self._B = rows
        self._R = row_len
        # capacity is for ACTIVE pieces (multi-byte vocab misses) only;
        # N/8 covers even 50%-miss corpora, and overflow degrades to an
        # exact full-batch host fallback rather than wrong output
        self._np_cap = np_cap if np_cap is not None else max(
            64, rows * row_len // 8)
        self._ranks = tokenizer.ranks

    def pack(self, texts):
        datas = [t.encode("utf-8") for t in texts]
        if len(datas) > self._B:
            raise ValueError(f"{len(datas)} docs exceed {self._B} rows")
        buf = np.zeros((self._B, self._R), dtype=np.uint8)
        lengths = np.zeros(self._B, dtype=np.int32)
        for i, d in enumerate(datas):
            if len(d) > self._R:
                raise ValueError(f"doc of {len(d)} bytes exceeds row "
                                 f"{self._R}")
            if d:
                buf[i, :len(d)] = np.frombuffer(d, dtype=np.uint8)
            lengths[i] = len(d)
        return buf, lengths

    def encode_batch(self, texts):
        import jax.numpy as jnp

        from ..oracle import byte_pair_merge, encode_ranks

        buf, lengths = self.pack(texts)
        fn = packed_encode_fn(self._seed1, self._seed2, self._np_cap,
                              self._piece_k, self._pseed1, self._pseed2)
        out, out_pos, n_out, fb_start, fb_len, n_mp = fn(
            jnp.asarray(buf), jnp.asarray(lengths), self._packed,
            self._dense, self._piece_packed, self._token_bytes)
        if int(n_mp) > self._np_cap:
            # capacity overflow (adversarial batch): full host fallback
            return [encode_ranks(t, self._ranks) for t in texts]
        out = np.asarray(out)[:int(n_out)]
        out_pos = np.asarray(out_pos)[:int(n_out)]

        # host fallback for oversize/overflow pieces
        fb_start = np.asarray(fb_start)
        fb_len = np.asarray(fb_len)
        fb = [(int(s), int(l)) for s, l in zip(fb_start, fb_len) if s >= 0]
        if fb:
            flat = buf.reshape(-1)
            extra_toks = []
            extra_pos = []
            for s, l in fb:
                piece = flat[s:s + l].tobytes()
                toks = byte_pair_merge(piece, self._ranks)
                extra_toks.extend(toks)
                # position tokens across the piece span (order restored by
                # the stable sort below)
                extra_pos.extend(
                    (s + np.linspace(0, max(l - 1, 0), len(toks)).astype(int))
                    .tolist())
            out = np.concatenate([out, np.asarray(extra_toks, np.int32)])
            out_pos = np.concatenate([out_pos,
                                      np.asarray(extra_pos, np.int32)])
            o = np.argsort(out_pos, kind="stable")
            out, out_pos = out[o], out_pos[o]

        rows = out_pos // self._R
        cut = np.searchsorted(rows, np.arange(len(texts) + 1))
        return [out[cut[i]:cut[i + 1]].tolist() for i in range(len(texts))]
