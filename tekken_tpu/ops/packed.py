"""Packed-piece device encode: the optimized production path.

Improvements over ops/flat.py (measured on TPU v5e):
- Pair lookups probe a cuckoo table packed as (size, 4) int32 rows
  [key_left, key_right, merged_rank, 0] — a 4-wide row gather costs the
  same as a scalar gather on TPU, and cuckoo needs exactly two slots, so a
  lookup is 2 row-gathers instead of up to 17x3.
- Mergeable pieces (length >= 2) are packed on device into a (NP, P) piece
  matrix; per-round argmin is a cheap lane reduction instead of a full-buffer
  segmented scan, and per-round re-probes touch only the piece matrix rows.
- Single-byte pieces bypass merging entirely (their token is the byte rank).

Capacity handling (static shapes): NP = N/4 rows of P = 32 lanes.  Pieces
longer than P or beyond the row capacity are flagged and returned for host
fallback (scalar oracle), so parity is unconditional; natural text never
overflows (pieces average ~6 bytes).
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


def whole_piece_lookup(ranks0, nseg0, piece_packed, token_words,
                       k: int, seed1: int, seed2: int):
    """Device whole-piece fast path.

    Signature = vocab.poly_sig31 of the row's bytes, computed as ONE masked
    lane dot-product against precomputed powers of ``k`` plus an
    inverse-power length correction (sum_{l<L} b_l k^(P-1-l) equals
    sig * k^(P-L) mod 2^32, and k is odd hence invertible) — no sequential
    per-lane loop.  Lookup = probe2 on the CuckooPieceTable (two row
    gathers), then exact verification against word-packed token bytes (one
    8-wide row gather).  Returns int32 (NP,) rank or -1 per row.
    """
    import jax.numpy as jnp

    NP, P = ranks0.shape
    lanes = jnp.arange(P, dtype=jnp.int32)[None, :]

    # powers k^(P-1-lane) mod 2^32
    kp = np.zeros(P, dtype=np.uint32)
    acc = 1
    for lane in reversed(range(P)):
        kp[lane] = acc
        acc = (acc * k) & 0xFFFFFFFF
    kp_j = jnp.asarray(kp)

    in_len = lanes < nseg0[:, None]
    b = jnp.where(in_len, ranks0.astype(jnp.uint32) & jnp.uint32(0xFF),
                  jnp.uint32(0))
    t = jnp.sum(b * kp_j[None, :], axis=1, dtype=jnp.uint32)

    # sig = t * inv(k)^(P-L): compose the inverse power from the bits of P-L
    j = (P - nseg0).astype(jnp.uint32)
    invk = _inv_u32(k)
    m = jnp.ones((NP,), dtype=jnp.uint32)
    ipow = invk
    for bit in range(6):  # P <= 32 -> P-L < 64
        m = jnp.where((j >> jnp.uint32(bit)) & 1 == 1,
                      m * jnp.uint32(ipow), m)
        ipow = (ipow * ipow) & 0xFFFFFFFF
    sig = ((t * m) & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)

    cand = probe2(sig, jnp.where(nseg0 >= 2, nseg0, -1),
                  piece_packed, seed1, seed2)
    found = jnp.where(cand == INF, -1, cand)

    # exact verification: pack the piece bytes into little-endian words and
    # compare against the candidate token's word row
    W = P // 4
    b4 = b.reshape(NP, W, 4)
    piece_words = (b4[:, :, 0]
                   | (b4[:, :, 1] << jnp.uint32(8))
                   | (b4[:, :, 2] << jnp.uint32(16))
                   | (b4[:, :, 3] << jnp.uint32(24))).astype(jnp.int32)
    cand_words = token_words[jnp.maximum(found, 0)]   # (NP, W) row gather
    ok = (found >= 0) & jnp.all(piece_words == cand_words, axis=1)
    return jnp.where(ok, found, -1)


def packed_encode_impl(byts, lengths, packed_table, dense_tab, piece_packed,
                       token_words, seed1: int, seed2: int,
                       piece_k: int = 0, pseed1: int = 0, pseed2: int = 0,
                       np_cap: int | None = None):
    """Encode a (B, R) document-row buffer.

    Returns (out i32[N] left-aligned tokens, out_pos i32[N] flat byte pos,
    n_out, fb_start i32[NP] byte offsets of fallback pieces (-1 = none),
    fb_len i32[NP]).  Fallback pieces produce no tokens on device; the host
    splices oracle results at their positions.
    """
    import jax
    import jax.numpy as jnp

    B, R = byts.shape
    N = B * R
    NP = np_cap if np_cap is not None else max(64, N // 4)

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

    mergeable = valid & (plen >= 2)
    is_pstart = boundary & valid
    # mergeable-piece index: rank among mergeable piece starts; the ids are
    # nondecreasing, so broadcasting through the piece is again a cummax
    # (positions of non-mergeable pieces get a stale id, never used)
    mp_mark = is_pstart & mergeable
    mp_id_at_start = jnp.cumsum(mp_mark.astype(jnp.int32)) - 1
    mp_id = jax.lax.cummax(jnp.where(mp_mark, mp_id_at_start, -1))
    n_mp = jnp.sum(mp_mark.astype(jnp.int32))

    in_matrix = mergeable & (offset < P_LANES) & (mp_id < NP)
    # fallback: oversize (len > P) or capacity overflow
    fb_piece = mergeable & ((plen > P_LANES) | (mp_id >= NP))

    # --- initial pair ranks in flat space: segments start as single
    # bytes, so every first-round query is a (byte, byte) pair — one gather
    # from the dense 64K-entry table instead of two cuckoo probes ---
    nxt_rank = jnp.concatenate([byte_rank[1:], jnp.full(1, -1, jnp.int32)])
    same_piece = jnp.concatenate([boundary[1:] == False,  # noqa: E712
                                  jnp.zeros(1, dtype=bool)]) & valid
    q_ok = same_piece & mergeable & (nxt_rank >= 0)
    dense_idx = jnp.where(q_ok, byte_rank * 256 + nxt_rank, 0)
    flat_pr = jnp.where(q_ok, dense_tab[dense_idx], INF)

    # --- scatter into (NP, P) matrices ---
    # same-index scatters are packed into row scatters (cost is per row)
    ok = in_matrix & ~fb_piece
    flat_tgt = jnp.where(ok, mp_id * P_LANES + offset, NP * P_LANES)
    init_rp = jnp.broadcast_to(
        jnp.array([-1, INF], jnp.int32)[None, :], (NP * P_LANES, 2))
    rp = init_rp.at[flat_tgt].set(
        jnp.stack([byte_rank, flat_pr], axis=1), mode="drop")
    ranks0 = rp[:, 0].reshape(NP, P_LANES)
    pr0 = rp[:, 1].reshape(NP, P_LANES)

    init_sn = jnp.broadcast_to(
        jnp.array([-1, 0], jnp.int32)[None, :], (NP, 2))
    sn = init_sn.at[
        jnp.where(mp_mark & ~fb_piece, mp_id, NP)].set(
        jnp.stack([pstart, plen], axis=1), mode="drop")
    start0, nseg0 = sn[:, 0], sn[:, 1]

    init_fb = jnp.broadcast_to(
        jnp.array([-1, 0], jnp.int32)[None, :], (NP, 2))
    fbv = init_fb.at[
        jnp.where(mp_mark & fb_piece, mp_id, NP)].set(
        jnp.stack([pstart, plen], axis=1), mode="drop")
    fb_start, fb_len = fbv[:, 0], fbv[:, 1]

    # --- whole-piece fast path (reference engine semantics: a piece whose
    # bytes are a vocab token encodes as that token before any merging) ---
    if piece_k:
        whole = whole_piece_lookup(ranks0, nseg0, piece_packed, token_words,
                                   piece_k, pseed1, pseed2)
        hit = whole >= 0
        lane0 = jnp.arange(P_LANES, dtype=jnp.int32)[None, :] == 0
        ranks0 = jnp.where(hit[:, None] & lane0, whole[:, None],
                           jnp.where(hit[:, None], -1, ranks0))
        pr0 = jnp.where(hit[:, None], INF, pr0)
        nseg0 = jnp.where(hit, 1, nseg0)

    # --- bucketed merge rounds (compact-shift layout, ops/bpe.py) ---
    from .bpe import merge_rows_compact

    pos = jnp.arange(P_LANES, dtype=jnp.int32)[None, :]
    rank, n_seg = merge_rows_compact(ranks0, pr0, nseg0, packed_table,
                                     seed1, seed2)

    # --- scatter merged tokens back to flat byte positions ---
    # token present at byte position b iff:
    #   single-byte piece start, or a surviving compacted lane.  Compacted
    #   lane k of row r maps to byte position start0[r] + k: unique and
    #   order-preserving because a piece's token count never exceeds its
    #   byte length.
    tok_flat = jnp.full(N, -1, jnp.int32)
    single = is_pstart & (plen == 1)
    tok_flat = jnp.where(single, byte_rank, tok_flat)
    lane_byte_pos = start0[:, None] + pos            # (NP, P)
    lane_ok = (pos < n_seg[:, None]) & (start0[:, None] >= 0)
    tok_flat = tok_flat.at[
        jnp.where(lane_ok, lane_byte_pos, N)].set(
        jnp.where(lane_ok, rank, -1), mode="drop")

    has_tok = tok_flat >= 0
    order = jnp.cumsum(has_tok.astype(jnp.int32)) - 1
    sidx = jnp.where(has_tok, order, N)
    op = jnp.full((N, 2), -1, jnp.int32).at[sidx].set(
        jnp.stack([tok_flat, idx], axis=1), mode="drop")
    out, out_pos = op[:, 0], op[:, 1]
    n_out = jnp.sum(has_tok.astype(jnp.int32))
    # n_mp > NP means capacity overflow: pieces beyond NP could not even be
    # recorded as fallbacks — the host must re-encode the whole batch.
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
        self._token_words = jnp.asarray(dt.word_packed(P_LANES))
        self._piece_k = int(pt.k)
        self._pseed1 = int(pt.seed1)
        self._pseed2 = int(pt.seed2)
        self._B = rows
        self._R = row_len
        self._np_cap = np_cap if np_cap is not None else max(
            64, rows * row_len // 4)
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
            self._dense, self._piece_packed, self._token_words)
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
