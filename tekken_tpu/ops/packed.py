"""Packed-piece device encode: the optimized production path.

Round-3 design (measured on TPU v5e; tools/profile_packed_stages.py,
tools/bench_scatter_scaling.py).  The governing constraint: every
random-access op (gather/scatter) runs at ~85-200 M rows/s regardless of
width, so throughput is set by RANDOM-ACCESS ROWS PER BYTE:
- Statically-routed simple-ASCII batches (typical prose; the host checks
  the route predicates in numpy for free) take the PIECE-COMPACT
  pipeline (_compact_encode): the stage-1 Pallas kernel evaluates the
  boundary rules, piece geometry, content dwords, probe hash AND a
  binary-gap compaction network in one HBM sweep, emitting per-row
  left-packed piece records — so the word probe, token emission, and
  merge-bucket build all run at piece granularity (~N/5.5 rows), not
  byte granularity.
- Whole-piece detection is WORD-EXACT: each WordDirectMap row stores the
  token's full content dwords + rank*32+len, so detection is ONE row
  gather + compares — no signature scans, no byte-verify gather.  Pieces
  that ARE vocab tokens — the vast majority of natural text — never touch
  the merge machinery.
- Vocab misses land in P=4/P=8/P=32 length-bucketed merge matrices
  sharing ONE scatter (disjoint row ranges), tiered to the actual count;
  empty buckets are skipped outright (bench-corpus misses are 100%
  2-3 bytes, so only the 3-round P=4 bucket runs).  probe2 fetches both
  cuckoo slots in one gather; with Pallas each round is 2 dispatches
  (ops/pallas_merge.py).
- General-ASCII / UTF-8 batches (and in-jit callers that cannot see the
  data, e.g. the distributed path) keep the flat byte-granular pipeline
  behind device conds.
- ``merge="host"`` alternative: the kernel records miss spans for the
  native C++ engine to bulk-merge (no device rounds, no length limit) —
  best on real PCIe/ICI hardware; the axon tunnel's readback cost keeps
  device merging the default here.

Capacity (static shapes): NP rows (default N/8; counts only vocab-miss
pieces).  Pieces longer than P_LANES are recorded as spans for host
splicing; bucket overflow triggers an exact full-batch host fallback —
parity is unconditional either way.
"""

from __future__ import annotations

import functools

import numpy as np

from .bpe import INF
from .pretokenize import byte_boundaries

P_LANES = 32
P_SHORT = 8


def _use_p23() -> bool:
    """A/B knob (TEKKEN_TPU_P23, default on): resolve 2-3-byte misses in
    the one-probe P23 tier vs. the P=4 merge bucket.  Read at trace time;
    part of the packed_encode_fn cache key."""
    import os

    return os.environ.get("TEKKEN_TPU_P23", "1") != "0"


def _fb_len_limit() -> int:
    """Max piece length merged ON DEVICE; longer vocab misses are recorded
    as fb spans for the host's bulk merge (the same splice machinery that
    always handled > P_LANES pieces).  Default 8: misses > 8 bytes are so
    rare on real corpora (bench corpus at B=512: ~1 per MB) that a single
    one used to hold the P=32 merge bucket's while_loop hostage for up to
    ~10 rounds of launch latency (round-5 profile: the long bucket charged
    ~6 ms/MB for ~1 piece).  TEKKEN_TPU_DEVICE_LONG=1 restores full
    on-device merging (P_LANES limit) for serving shapes where tokens must
    stay device-resident.  Read at trace time; part of the
    packed_encode_fn cache key."""
    import os

    return P_LANES if os.environ.get("TEKKEN_TPU_DEVICE_LONG") == "1" \
        else P_SHORT


def default_np_cap(n_bytes: int) -> int:
    """Default merge-matrix row capacity for an n_bytes buffer (counts only
    ACTIVE pieces — multi-byte vocab misses).  The returned NP sizes the
    P=4 bucket; the P=8 bucket gets NP/2 and the P=32 bucket NP/8
    (misses skew short — bench corpus: 100% are 2-3 bytes), so a batch
    whose 5-8-byte or >8-byte miss count exceeds ITS bucket trips the
    overflow flag even below NP total.  Overflow always degrades to an
    exact full-batch host fallback rather than wrong output; NP covers
    even a 50%-miss corpus of short pieces (pieces are >= 2 bytes, so
    there are at most N/2 of them).  One policy, shared by PackedEncoder
    and DistributedEncoder (per shard)."""
    return max(64, n_bytes // 8)


def probe2(left, right, packed, seed1: int, seed2: int):
    """Cuckoo probe.  left/right int32[...]; packed (S, 4).  Returns merged
    rank or INF (absent / invalid query).  Both cuckoo slots ride ONE
    row-gather op (slot vectors concatenated): at merge-round sizes gather
    cost is op-latency-bound, not element-bound, so one op of 2n rows
    beats two ops of n."""
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

    both = packed[jnp.concatenate([slot(seed1).reshape(-1),
                                   slot(seed2).reshape(-1)])]
    n = l.size
    r1 = both[:n].reshape(left.shape + (4,))
    r2 = both[n:].reshape(left.shape + (4,))
    hit1 = (r1[..., 0] == left) & (r1[..., 1] == right)
    hit2 = (r2[..., 0] == left) & (r2[..., 1] == right)
    out = jnp.where(hit1, r1[..., 2], jnp.where(hit2, r2[..., 2], INF))
    valid = (left >= 0) & (right >= 0)
    return jnp.where(valid, out, INF)


def probe1(left, right, dm, seed: int):
    """Direct-mapped candidate probe: ONE row-gather (vocab.direct_map).
    Entries lost to build-time slot collisions just miss — callers
    byte-verify every candidate and route misses to the merge path.  The
    build guarantees only greedy-STABLE tokens can be lost (the merge path
    reproduces those exactly), so exactness never rests on this table."""
    import jax.numpy as jnp

    size = dm.shape[0]
    mask = jnp.uint32(size - 1)
    l = left.astype(jnp.uint32)
    r = right.astype(jnp.uint32)
    h = (l * jnp.uint32(0x9E3779B1)) ^ (r * jnp.uint32(0x85EBCA77)) \
        ^ jnp.uint32(seed)
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(0xC2B2AE3D)
    h = h ^ (h >> jnp.uint32(13))
    row = dm[(h & mask).astype(jnp.int32)]
    hit = (row[..., 0] == left) & (row[..., 1] == right) & (row[..., 2] >= 0)
    valid = (left >= 0) & (right >= 0)
    return jnp.where(valid & hit, row[..., 2], INF)


def _inv_u32(k: int) -> int:
    """Multiplicative inverse of odd k mod 2^32 (Newton iteration)."""
    inv = k
    for _ in range(5):
        inv = (inv * (2 - k * inv)) & 0xFFFFFFFF
    return inv


def packed_encode_impl(byts, lengths, packed_table, dense_tab, word_rows,
                       seed1: int, seed2: int, wseed: int = 0,
                       np_cap: int | None = None, host_merge: bool = False,
                       route: int | None = None,
                       _stage: int | None = None):
    """Encode a (B, R) document-row buffer — flat-first architecture.

    Whole-piece detection is WORD-EXACT and runs in flat byte space: every
    position assembles its piece's first 12 (or 24, wide mode) bytes into
    masked little-endian dwords from static-slice shifts — no scans, no
    per-byte verify gather — and probes the WordDirectMap with ONE row
    gather; a full word+length compare against the row is exact on its own
    (the row stores the complete content).  Only pieces that MISS the
    vocabulary — a few percent of natural text — are scattered into the
    (NP, P) merge matrix.  That shrinks the matrix, its scatters, the merge
    rounds, and the un-scatter by an order of magnitude versus packing
    every multi-byte piece (measured: the matrix machinery dominated the
    old kernel at ~24ms/256KB on v5e; tools/profile_packed_stages.py).

    ``_stage`` (profiling only): cut the pipeline after stage k and return
    a checksum scalar instead of outputs, so per-stage device cost can be
    measured on the live code (XLA dead-code-eliminates the rest).

    Returns (tok i32[N] — tok[i] >= 0 is the token whose piece starts at
    flat byte i, in byte order, uncompacted; n_out,
    fb_start / fb_len i32 byte offsets+lengths of fallback pieces (-1/0 =
    none; sized per path: NPT on the flat device-merge path, NP32 on the
    compact device-merge path, NP in host-merge mode — consumers must be
    shape-agnostic), overflow i32, row_bad i32[B]).  Fallback pieces
    (longer than P_LANES and not vocab tokens) produce no tokens on
    device; the host splices oracle results at their positions.
    overflow != 0 means a merge-bucket capacity overflow: some active
    pieces could not even be recorded.  A dropped piece corrupts ONLY its
    own document row — bucket ids are batch-global but piece records are
    row-local — so row_bad marks exactly the rows holding dropped pieces
    and the host re-encodes those rows alone (VERDICT r4 item 6: a
    whole-batch fallback let one hot doc stall a host at pod scale).
    """
    import jax
    import jax.numpy as jnp

    B, R = byts.shape
    N = B * R
    NP = np_cap if np_cap is not None else max(64, N // 16)

    from .pallas_stage1 import pallas_enabled, stage1_fused
    from .pretokenize import (ascii_classes_arith, ascii_packed_lookup,
                              byte_boundaries_ascii,
                              byte_boundaries_ascii_simple)

    if route in (1, 2, 3) and pallas_enabled():
        # every statically-routed batch takes the PIECE-COMPACT pipeline
        # (round 4: previously simple-ASCII only): every random-access op
        # downstream of stage 1 runs at piece granularity (~N/5.5 rows)
        # instead of byte granularity.  The routes differ only in how the
        # boundary flags are produced (in-kernel simple/general rules, or
        # the XLA UTF-8 char path feeding the kernel externally).
        return _compact_encode(byts, lengths, packed_table, dense_tab,
                               word_rows, seed1, seed2, wseed, NP,
                               host_merge, route, _stage)

    idx = jnp.arange(N, dtype=jnp.int32)
    # row validity as a 2D broadcast compare — NEVER lengths[idx // R]:
    # that innocent spelling is an N-index gather (~70 M indices/s on
    # v5e => ~10 ms/MB, the round-5 "in-situ anomaly": stage cuts DCE'd
    # it until the first byte_rank consumer, charging it to the miss-
    # resolution stage)
    valid = (jnp.arange(R, dtype=jnp.int32)[None, :]
             < lengths[:, None]).reshape(N)
    byte_rank = jnp.where(valid, byts.reshape(N).astype(jnp.int32), -1)

    if wseed:
        Wc = word_rows.shape[1]            # 4 narrow / 8 wide (static)
        n_words = 3 if Wc == 4 else 6
        maxl = 12 if Wc == 4 else 24
        wsize = word_rows.shape[0]
    else:
        n_words = 0
        wsize = 1

    # --- stage 1: boundary rules + piece geometry + word assembly +
    # probe hash.  Three data-dependent variants behind nested batch
    # conds: (a) simple ASCII (no ws run > 1, no digit run > 3 — typical
    # prose) runs the FUSED Pallas kernel, one HBM sweep for the whole
    # stage (ops/pallas_stage1.py; falls back to the scan-free XLA rules
    # when Pallas is disabled); (b) general ASCII; (c) UTF-8.  All three
    # produce bit-identical (plen, slot, content dwords). ---
    def stage1_xla(row_bound):
        """Geometry + word assembly + probe hash (XLA formulation) from
        per-row boundary flags.  plen is the piece length AT ITS START
        byte: last_pos (first is_last >= i, ONE native reverse cummin —
        reverse=True beats the [::-1] scan [::-1] idiom 3x) minus idx;
        every consumer reads piece geometry at start positions only."""
        boundary = row_bound.reshape(N)
        boundary_next = jnp.concatenate(
            [boundary[1:], jnp.ones(1, dtype=bool)])
        is_last = (boundary_next | ~jnp.concatenate(
            [valid[1:], jnp.zeros(1, dtype=bool)])) & valid
        BIGN = jnp.int32(1 << 30)
        last_pos = jax.lax.cummin(jnp.where(is_last, idx, BIGN),
                                  reverse=True)
        plen = jnp.where(boundary & valid, last_pos - idx + 1, 0)
        if not n_words:
            return (plen,)

        # word assembly: the piece's first 12/24 bytes as length-masked
        # little-endian dwords via static-slice shifts (no scans, no
        # gathers); dwords returned as int32 BIT PATTERNS to match the
        # fused kernel (Mosaic is int32-only)
        bu = jnp.where(valid, byts.reshape(N), 0).astype(jnp.uint32)

        def sh(arr, k):
            # value at idx+k as a static slice (not a gather)
            return jnp.concatenate(
                [arr[k:], jnp.zeros(k, arr.dtype)]) if k else arr

        w = (bu | (sh(bu, 1) << jnp.uint32(8))
             | (sh(bu, 2) << jnp.uint32(16))
             | (sh(bu, 3) << jnp.uint32(24)))

        def msk(m):
            # uint32 mask of min(max(m,0),4) low bytes
            m4 = jnp.clip(m, 0, 4)
            shv = (jnp.minimum(m4, 3) * 8).astype(jnp.uint32)
            return jnp.where(m4 >= 4, jnp.uint32(0xFFFFFFFF),
                             (jnp.uint32(1) << shv) - jnp.uint32(1))

        ws = [sh(w, 4 * k) & msk(plen - 4 * k) for k in range(n_words)]
        h = ((ws[0] * jnp.uint32(0x9E3779B1))
             ^ (ws[1] * jnp.uint32(0x85EBCA77))
             ^ (ws[2] * jnp.uint32(0xC2B2AE3D))
             ^ (plen.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F))
             ^ jnp.uint32(wseed))
        h = h ^ (h >> jnp.uint32(15))
        h = h * jnp.uint32(0xC2B2AE3D)
        h = h ^ (h >> jnp.uint32(13))
        slot = (h & jnp.uint32(wsize - 1)).astype(jnp.int32)
        ws_i = [jax.lax.bitcast_convert_type(x, jnp.int32) for x in ws]
        return (plen, slot, *ws_i)

    def br_utf8(b):
        return stage1_xla(jax.vmap(byte_boundaries)(b, lengths))

    def br_general(b):
        return stage1_xla(jax.vmap(byte_boundaries_ascii)(
            b, lengths, ascii_packed_lookup(b)))

    if pallas_enabled():
        def br_simple(b, p=None):
            out = stage1_fused(b, lengths, n_words, wsize, wseed)
            return tuple(x.reshape(N) for x in out)
    else:
        def br_simple(b, p=None):
            pk = ascii_classes_arith(b) if p is None else p
            return stage1_xla(jax.vmap(byte_boundaries_ascii_simple)(
                b, lengths, pk))

    def br_ascii(b):
        # classes via fused compares — the one-hot MXU table lookup only
        # runs in the (rarer) non-simple branch
        pk = ascii_classes_arith(b)
        is_w2 = (pk & 4) != 0            # padding byte 0 is not ws/digit
        is_n2 = (pk & 2) != 0
        ws_run2 = jnp.any(is_w2[:, 1:] & is_w2[:, :-1])
        dig_run4 = jnp.any(is_n2[:, 3:] & is_n2[:, 2:-1]
                           & is_n2[:, 1:-2] & is_n2[:, :-3])
        return jax.lax.cond(ws_run2 | dig_run4,
                            lambda p: br_general(b),
                            lambda p: br_simple(b, p), pk)

    # ``route``: a STATIC host-side routing decision (1 simple ASCII /
    # 2 general ASCII / 3 UTF-8).  The host computes the same predicates
    # in numpy at pack time for ~free; on device they cost ~0.9 ms per
    # 256 KB — as much as the whole fused stage-1 kernel (measured v5e,
    # round 3).  None keeps the device-side cond chain (in-jit callers
    # that can't see the data, e.g. the distributed path).
    #
    # With Pallas DISABLED the static hint is deliberately ignored:
    # interleaved A/B on v5e measured the inlined XLA stage-1 at
    # 18.2 MB/s vs 29.4 MB/s for the same ops inside the cond branch —
    # XLA's fusion/scheduling of the cond-free graph is pathologically
    # worse, so the cond chain IS the fast XLA formulation.
    if not pallas_enabled() and route == 1:
        route = None
    if route == 1:
        s1 = br_simple(byts)
    elif route == 2:
        s1 = br_general(byts)
    elif route == 3:
        s1 = br_utf8(byts)
    else:
        s1 = jax.lax.cond(jnp.all(byts < 0x80), br_ascii, br_utf8, byts)
    plen = s1[0]
    is_pstart = plen > 0
    multi = plen >= 2
    if _stage == 1:  # scans / fused stage 1
        return plen.sum()
    if _stage == 2:  # + content words
        return (sum(x.sum() for x in s1[2:]) + s1[1].sum()
                if n_words else plen.sum())

    # --- whole-piece fast path, word-exact (reference engine semantics: a
    # piece whose bytes are a vocab token encodes as that token before any
    # merging).  The WordDirectMap row gathered at the stage-1 hash slot
    # holds the candidate's FULL content words + length, so the compare
    # alone is exact — no signature scans, no byte-verify gather, no
    # piece-AND reduction (all three dominated the round-1 kernel). ---
    hit_start = jnp.zeros(N, dtype=bool)
    found = jnp.full(N, -1, jnp.int32)
    if n_words:
        slot, ws = s1[1], s1[2:]
        row = word_rows[slot]              # the ONE whole-piece row gather
        meta = row[..., n_words]
        ok = (meta >= 0) & ((meta & 31) == plen)
        for k in range(n_words):
            ok = ok & (row[..., k] == ws[k])
        hit_start = ok & multi & (plen <= maxl)
        found = jnp.where(hit_start, meta >> 5, -1)
    if _stage == 3:  # + probe (word-exact, no separate verify)
        return hit_start.astype(jnp.int32).sum() + found.sum()

    # singles and whole-piece hits emit elementwise at their start byte
    single = is_pstart & (plen == 1)
    tok_base = jnp.where(single, byte_rank,
                         jnp.where(hit_start, found, -1))
    if _stage == 35:  # + token-base emission
        return tok_base.sum()

    if host_merge:
        # --- hybrid mode: the device does boundaries + word probe + token
        # emission; EVERY vocab miss (a few % of natural text) is recorded
        # as a (start, len) span for the host's native C++ engine to
        # bulk-merge and splice (ops/packed.py splice_host_merges).  No
        # merge matrix, no merge rounds, no piece-length limit: host
        # byte_pair_merge handles any span exactly (whole-piece check
        # included, so even >24-byte greedy-unstable tokens are exact). ---
        mp_mark = multi & ~hit_start
        fb_id = jnp.cumsum(mp_mark.astype(jnp.int32)) - 1
        n_miss = jnp.sum(mp_mark.astype(jnp.int32))
        overflow = (n_miss > NP).astype(jnp.int32)
        tgt = jnp.where(mp_mark & (fb_id < NP), fb_id, NP)
        # ONE N-source scatter for any N/R: pack only (idx, live) — plen
        # is re-read by a tiny NP-row gather from the flat plen array
        # (plen at a piece start IS its length), so no bits are spent on
        # it and the pack never overflows (idx < 2^30).
        assert N < (1 << 30), N
        word = (idx << 1) | 1
        w = jnp.zeros(NP, jnp.int32).at[tgt].set(word, mode="drop")
        live = (w & 1) == 1
        start_r = w >> 1
        fb_start = jnp.where(live, start_r, -1)
        fb_len = jnp.where(live, plen[jnp.clip(start_r, 0, N - 1)], 0)
        n_out = jnp.sum((tok_base >= 0).astype(jnp.int32))
        if _stage in (4, 5):
            return fb_start.sum() + fb_len.sum() + n_out
        dropped = mp_mark & (fb_id >= NP)
        row_bad = jnp.zeros(B, jnp.int32).at[
            jnp.where(dropped, idx // R, B)].set(1, mode="drop")
        return tok_base, n_out, fb_start, fb_len, overflow, row_bad

    # --- active pieces (vocab misses) get a merge matrix, SPLIT BY PIECE
    # LENGTH: a P=4 bucket (short misses dominate — 3 unrolled rounds),
    # a P=8 bucket (7 rounds) and a P=32 bucket for rare long misses.
    # All buckets share the ONE N-source scatter via disjoint row ranges,
    # so the split costs only small extra cumsums.  Round count was the
    # dominant kernel cost before the split (a single 32-byte piece held
    # every short piece hostage for ~31 rounds). ---
    mp_mark = multi & ~hit_start
    tiny_mark = mp_mark & (plen <= 4)
    short_mark = mp_mark & (plen > 4) & (plen <= P_SHORT)
    long_mark = mp_mark & (plen > P_SHORT)
    id_t = jnp.cumsum(tiny_mark.astype(jnp.int32)) - 1
    id_s = jnp.cumsum(short_mark.astype(jnp.int32)) - 1
    id_l = jnp.cumsum(long_mark.astype(jnp.int32)) - 1
    NP4 = NP
    NP8 = max(64, NP // 2)
    NP32 = max(64, NP // 8)   # long misses are rare; overflow => host
    NPT = NP4 + NP8 + NP32
    n_t = jnp.sum(tiny_mark.astype(jnp.int32))
    n_s = jnp.sum(short_mark.astype(jnp.int32))
    n_l = jnp.sum(long_mark.astype(jnp.int32))
    # capacity overflow => the host re-encodes the whole batch (exact)
    overflow = ((n_t > NP4) | (n_s > NP8) | (n_l > NP32)).astype(jnp.int32)

    # oversize pieces (> the device-merge length limit) own a LONG row but
    # contribute no lanes: the host splices merge results at their spans
    FBL = _fb_len_limit()
    fb_piece = long_mark & (plen > FBL)
    n_lm = jnp.sum((long_mark & (plen <= FBL)).astype(jnp.int32))

    row_write_t = tiny_mark & (id_t < NP4)
    row_write_s = short_mark & (id_s < NP8)
    row_write_l = long_mark & (id_l < NP32)
    tgt_row = jnp.where(row_write_t, id_t,
                        jnp.where(row_write_s, NP4 + id_s,
                                  jnp.where(row_write_l,
                                            NP4 + NP8 + id_l, NPT)))
    # (start, fb, live) pack into ONE N-source scatter pass for any N/R:
    # plen is re-read by a tiny NPT-row gather from the flat plen array
    # (plen at a piece start IS its length), so no bits are spent on it
    # and the pack never overflows (idx < 2^29).
    assert N < (1 << 29), N
    word = (idx << 2) | (fb_piece.astype(jnp.int32) << 1) | 1
    w = jnp.zeros(NPT, jnp.int32).at[tgt_row].set(word, mode="drop")
    live = (w & 1) == 1
    start_r = w >> 2
    fb_r = live & ((w & 2) != 0)
    plen_r = jnp.where(live, plen[jnp.clip(start_r, 0, N - 1)], 0)
    nseg0 = jnp.where(fb_r, 0, plen_r)
    fb_start = jnp.where(fb_r, start_r, -1)
    fb_len = jnp.where(fb_r, plen_r, 0)
    start0 = jnp.where(live & ~fb_r, start_r, -1)
    if _stage == 4:  # + matrix scatter
        return (start0.sum() + nseg0.sum() + fb_start.sum() + fb_len.sum())

    # --- merge rounds + lane un-scatter (shared helper) ---
    tok_flat = _merge_buckets(
        tok_base, byte_rank,
        lambda lo, rows: (nseg0[lo:lo + rows], start0[lo:lo + rows]),
        (n_t, n_s, n_lm),
        (NP4, NP8, NP32), packed_table, dense_tab, seed1, seed2, _stage)
    if _stage in (45, 5):
        return tok_flat

    # no device compaction: tok_flat[i] >= 0 IS the token at byte i (its
    # index is its position).  The host's flatnonzero is a trivial linear
    # pass, while the device scatters it replaces cost two N-source
    # scatter passes — and the readback halves.
    n_out = jnp.sum((tok_flat >= 0).astype(jnp.int32))
    dropped = mp_mark & (tgt_row == NPT)
    row_bad = jnp.zeros(B, jnp.int32).at[
        jnp.where(dropped, idx // R, B)].set(1, mode="drop")
    return tok_flat, n_out, fb_start, fb_len, overflow, row_bad


def _merge_buckets(tok_base, byte_rank, rows_fn, counts,
                   caps, packed_table, dense_tab,
                   seed1: int, seed2: int, _stage=None):
    """Merge rounds + lane un-scatter (compact-shift layout, ops/bpe.py)
    per length bucket, each tiered: cumsum ids are front-compacted, so a
    lax.cond picks the smallest static slice covering the actual count —
    first-round dense-table probe, merge loop, and token un-scatter all
    run tier-sized, and an EMPTY bucket is skipped outright (one cond).
    Lane contents are GATHERED from byte_rank at start+lane; no lane
    scatters exist.  With Pallas enabled each round is 2 dispatches
    (cuckoo gather + fused round kernel, ops/pallas_merge.py) instead of
    ~12.

    ``rows_fn(lo, rows) -> (n0, s0)`` materializes bucket rows
    [lo, lo+rows) — piece length and flat byte start per row — INSIDE
    the tier branch, so its cost is tier-sized, not capacity-sized (the
    round-4 profile found NPT-sized pos/plen gathers costing ~5 ms at
    B=512 for a near-empty bucket).  The flat path slices precomputed
    arrays; the compact path unpacks its scatter words and gathers
    geometry at `rows` granularity.

    ``counts``/``caps``: per-bucket piece counts and row capacities for
    the P=4 / P=8 / P=32 buckets laid out consecutively.  The P=4 bucket
    exists because short misses dominate real corpora (bench corpus:
    100% of misses are 2-3 bytes) and its unrolled merge is 3 rounds,
    not 7.

    With ``_stage`` set (45 = tiny+short buckets / 5 = all) returns a
    checksum scalar; otherwise the flat token stream."""
    import jax
    import jax.numpy as jnp

    from .bpe import merge_rows_compact
    from .pallas_stage1 import pallas_enabled

    N = tok_base.shape[0]

    if pallas_enabled():
        from .pallas_merge import merge_rows_compact_fused as merge_rows
    else:
        merge_rows = merge_rows_compact

    def merge_tier(lo, rows, P):
        pos = jnp.arange(P, dtype=jnp.int32)[None, :]

        def run(tok):
            n0, s0 = rows_fn(lo, rows)
            lane_byte_pos = s0[:, None] + pos        # (rows, P)
            lane_in = (pos < n0[:, None]) & (s0[:, None] >= 0)
            # lane contents: gather piece bytes at start+lane (tier-sized)
            r0 = jnp.where(lane_in, byte_rank[jnp.clip(
                lane_byte_pos, 0, N - 1)], -1)
            # initial pair ranks: segments start as single bytes, so every
            # first-round query is a (byte, byte) pair — one gather from
            # the dense 64K table, on rows*P elements instead of N
            right = jnp.concatenate(
                [r0[:, 1:], jnp.full((rows, 1), -1, jnp.int32)], axis=1)
            q_ok = (pos + 1 < n0[:, None]) & (r0 >= 0) & (right >= 0)
            pr0 = jnp.where(
                q_ok, dense_tab[jnp.where(q_ok, r0 * 256 + right, 0)], INF)
            r, n = merge_rows(
                r0, pr0, n0, packed_table, seed1, seed2,
                fixed_rounds=P - 1 if P <= P_SHORT else None)
            lane_ok = (pos < n[:, None]) & (s0[:, None] >= 0)
            return tok.at[jnp.where(lane_ok, lane_byte_pos, N)].set(
                jnp.where(lane_ok, r, -1), mode="drop")
        return run

    def bucket_branch(tiers, P, count, lo, tok):
        tiers = sorted(set(tiers))
        branch = merge_tier(lo, tiers[-1], P)
        for rows in reversed(tiers[:-1]):
            branch = (lambda small, big, rows: lambda t: jax.lax.cond(
                count <= rows, small, big, t))(
                    merge_tier(lo, rows, P), branch, rows)
        # empty bucket: skip every dispatch (real corpora often fill only
        # one bucket — e.g. the bench corpus misses are all 2-3 bytes)
        return jax.lax.cond(count == 0, lambda t: t, branch, tok)

    n_t, n_s, n_l = counts
    NP4, NP8, NP32 = caps
    # tier counts trade compile time (each tier instantiates the merge
    # loop) against wasted rows.  Every ladder starts at 64: a bucket
    # with a HANDFUL of misses must not pay a capacity-proportional tier
    # (measured round 4: ONE 5-8-byte miss at B=512 ran an 8192-row
    # 7-round matrix because the P=8 ladder bottomed out at NP8//4)
    tok_flat = bucket_branch(
        [64, max(64, NP4 // 16), max(64, NP4 // 4), NP4], 4, n_t,
        0, tok_base)
    tok_flat = bucket_branch(
        [64, max(64, NP8 // 16), max(64, NP8 // 4), NP8], P_SHORT, n_s,
        NP4, tok_flat)
    if _stage == 45:  # + tiny+short bucket merges only
        return tok_flat.sum()
    tok_flat = bucket_branch(
        [64, max(64, NP32 // 4), NP32], P_LANES, n_l,
        NP4 + NP8, tok_flat)
    if _stage == 5:  # + merge rounds + lane un-scatter
        return tok_flat.sum()
    return tok_flat


def _compact_encode(byts, lengths, packed_table, dense_tab, word_rows,
                    seed1: int, seed2: int, wseed: int, NP: int,
                    host_merge: bool, route: int, _stage):
    """Piece-compact pipeline for every statically-routed batch.

    The stage-1 Pallas kernel left-compacts every row's piece records
    (ops/pallas_stage1.stage1_compact), so the word probe, the token
    emission, and the merge-bucket build all run on a (B, C) window —
    C a lax.cond tier over the max per-row piece count (~R/5.5 on prose)
    — instead of the flat N byte positions.  Round-3 profile: the flat
    pipeline's probe alone was 12.3 ms of 33.8 ms per 1 MB; every one of
    those random-access rows shrinks ~4x here.

    ``route`` picks the boundary formulation (ops/pallas_stage1 rules):
    1 = simple-ASCII scan-free rules in-kernel; 2 = full general rule
    set in-kernel (row-local log-doubling scans); 3 = UTF-8 — the XLA
    char path (class-table gather + char compaction) computes byte-level
    flags, the kernel does geometry/dwords/hash/compaction.  Everything
    downstream of the flags is byte-positional and route-independent.

    Output contract is identical to packed_encode_impl's flat path."""
    import jax
    import jax.numpy as jnp

    from .pallas_stage1 import stage1_compact

    B, R = byts.shape
    N = B * R
    # the bucket-build pack shifts compact indices j < B*C <= N by 2 bits
    # (mirrors the flat path's guard at its identical pack; ADVICE r3)
    assert N < (1 << 29), N

    if wseed:
        Wc = word_rows.shape[1]
        n_words = 3 if Wc == 4 else 6
        maxl = 12 if Wc == 4 else 24
        wsize = word_rows.shape[0]
    else:
        n_words = 0
        wsize = 1

    if route == 3:
        bound = jax.vmap(byte_boundaries)(byts, lengths)
        st, pl, sl, *wsc, cnt = stage1_compact(
            byts, lengths, n_words, wsize, wseed, rules="external",
            boundary=bound)
    elif route == 2:
        st, pl, sl, *wsc, cnt = stage1_compact(
            byts, lengths, n_words, wsize, wseed, rules="general")
    else:
        st, pl, sl, *wsc, cnt = stage1_compact(byts, lengths, n_words,
                                               wsize, wseed)
    if _stage == 1:  # fused stage 1 (+ compaction)
        return st.sum() + pl.sum() + cnt.sum()
    if _stage == 2:  # + content words / slots
        return sl.sum() + sum(w.sum() for w in wsc)
    cmax = jnp.max(cnt)

    idx = jnp.arange(N, dtype=jnp.int32)
    # row validity as a 2D broadcast compare — NEVER lengths[idx // R]:
    # that innocent spelling is an N-index gather (~70 M indices/s on
    # v5e => ~10 ms/MB, the round-5 "in-situ anomaly": stage cuts DCE'd
    # it until the first byte_rank consumer, charging it to the miss-
    # resolution stage)
    valid = (jnp.arange(R, dtype=jnp.int32)[None, :]
             < lengths[:, None]).reshape(N)
    byte_rank = jnp.where(valid, byts.reshape(N).astype(jnp.int32), -1)

    NP4 = NP
    NP8 = max(64, NP // 2)
    NP32 = max(64, NP // 8)
    NP3 = NP           # 2-3-byte misses dominate real corpora
    NPT = NP4 + NP8 + NP32 + NP3

    def make_branch(C):
        def run(_):
            stc, plc, slc = st[:, :C], pl[:, :C], sl[:, :C]
            wsC = [w[:, :C] for w in wsc]
            live = stc >= 0
            row_base = (jnp.arange(B, dtype=jnp.int32) * R)[:, None]
            fstart = jnp.where(live, stc + row_base, -1)       # (B, C)

            # --- word-exact whole-piece probe, piece granularity ---
            if n_words:
                rowv = word_rows[jnp.clip(slc, 0, wsize - 1)]  # (B, C, Wc)
                meta = rowv[..., n_words]
                ok = live & (meta >= 0) & ((meta & 31) == plc)
                for k in range(n_words):
                    ok = ok & (rowv[..., k] == wsC[k])
                hit = ok & (plc >= 2) & (plc <= maxl)
                found = jnp.where(hit, meta >> 5, -1)
            else:
                hit = jnp.zeros_like(live)
                found = jnp.full(live.shape, -1, jnp.int32)
            single = live & (plc == 1)
            # byte tokens ARE their byte value; ws0 is masked to 1 byte
            tokv = jnp.where(single, wsC[0] & 0xFF, found)

            miss = live & (plc >= 2) & ~hit
            pos = fstart.reshape(-1)
            plf = plc.reshape(-1)
            BC = B * C
            j = jnp.arange(BC, dtype=jnp.int32)
            # GLOBAL compact index (row*R + col): C-tier-independent, so
            # merge tiers can gather geometry from the (N,)-shaped
            # pos_full/plf_full built once outside the C conds
            jg = (row_base + jnp.arange(C, dtype=jnp.int32)[None, :]
                  ).reshape(-1)

            if host_merge:
                src = tokv.reshape(-1)
                tok = jnp.full(N, -1, jnp.int32).at[
                    jnp.where(src >= 0, pos, N)].set(src, mode="drop")
                missf = miss.reshape(-1)
                fb_id = jnp.cumsum(missf.astype(jnp.int32)) - 1
                n_miss = jnp.sum(missf.astype(jnp.int32))
                overflow = (n_miss > NP).astype(jnp.int32)
                tgt = jnp.where(missf & (fb_id < NP), fb_id, NP)
                w = jnp.zeros(NP, jnp.int32).at[tgt].set(
                    (j << 1) | 1, mode="drop")
                live_r = (w & 1) == 1
                jj = jnp.clip(w >> 1, 0, BC - 1)
                fb_start = jnp.where(live_r, pos[jj], -1)
                fb_len = jnp.where(live_r, plf[jj], 0)
                dropped = missf & (fb_id >= NP)
                row_bad = jnp.zeros(B, jnp.int32).at[
                    jnp.where(dropped, pos // R, B)].set(1, mode="drop")
                return (tok, fb_start, fb_len, overflow, row_bad)

            # --- emit singles + hits into the flat token stream ---
            src = tokv.reshape(-1)
            tok = jnp.full(N, -1, jnp.int32).at[
                jnp.where(src >= 0, pos, N)].set(src, mode="drop")

            # 2-3-byte misses — the dominant miss lengths on real corpora
            # (bench corpus: 100%) — skip the merge matrix entirely: they
            # go to the one-probe P23 tier below (round-4 profile: the
            # 3-round matrix path was 4.2 of 8.3 ms per 256 KB and scaled
            # super-linearly with batch).  Their scatter word packs the
            # FLAT BYTE POSITION (+ the plen-3 bit), so the tier re-reads
            # bytes from byte_rank and needs nothing at BC granularity.
            if _use_p23():
                m23f = (miss & (plc <= 3)).reshape(-1)
                missf = (miss & (plc >= 4)).reshape(-1)
                tinym = missf & (plf == 4)
            else:
                # A/B knob: 2-3-byte misses ride the P=4 merge bucket
                m23f = jnp.zeros(B * C, jnp.bool_)
                missf = miss.reshape(-1)
                tinym = missf & (plf <= 4)
            is3f = (miss & (plc == 3)).reshape(-1)
            shortm = missf & (plf > 4) & (plf <= P_SHORT)
            longm = missf & (plf > P_SHORT)
            id_23 = jnp.cumsum(m23f.astype(jnp.int32)) - 1
            id_t = jnp.cumsum(tinym.astype(jnp.int32)) - 1
            id_s = jnp.cumsum(shortm.astype(jnp.int32)) - 1
            id_l = jnp.cumsum(longm.astype(jnp.int32)) - 1
            n_23 = jnp.sum(m23f.astype(jnp.int32))
            n_t = jnp.sum(tinym.astype(jnp.int32))
            n_s = jnp.sum(shortm.astype(jnp.int32))
            n_l = jnp.sum(longm.astype(jnp.int32))
            overflow = ((n_23 > NP3) | (n_t > NP4) | (n_s > NP8)
                        | (n_l > NP32)).astype(jnp.int32)
            FBL = _fb_len_limit()
            fb_piece = longm & (plf > FBL)
            n_lm = jnp.sum((longm & (plf <= FBL)).astype(jnp.int32))

            NPM = NP4 + NP8 + NP32
            tgt_row = jnp.where(
                tinym & (id_t < NP4), id_t,
                jnp.where(shortm & (id_s < NP8), NP4 + id_s,
                          jnp.where(longm & (id_l < NP32),
                                    NP4 + NP8 + id_l,
                                    jnp.where(m23f & (id_23 < NP3),
                                              NPM + id_23, NPT))))
            # bucket rows pack the GLOBAL compact index (jg): geometry is
            # gathered tier-sized inside the merge branches, so the
            # bucket build has NO capacity-proportional gathers (the old
            # NPT-sized pos/plf gathers were ~5 ms at B=512).  P23 rows
            # pack the flat BYTE position instead (their tier re-reads
            # bytes directly); their flag bit means "plen 3", not fb.
            word = jnp.where(
                m23f, (pos << 2) | (is3f.astype(jnp.int32) << 1) | 1,
                (jg << 2) | (fb_piece.astype(jnp.int32) << 1) | 1)
            w = jnp.zeros(NPT, jnp.int32).at[tgt_row].set(
                word, mode="drop")
            dropped = miss.reshape(-1) & (tgt_row == NPT)
            row_bad = jnp.zeros(B, jnp.int32).at[
                jnp.where(dropped, pos // R, B)].set(1, mode="drop")
            return (tok, overflow, w, n_t, n_s, n_l, n_lm, n_23, row_bad)
        return run

    # C tiers: probe/emission/bucket costs are all (B*C)-proportional, so
    # pick the smallest window covering the densest row.  x1.25 ladder:
    # prose runs ~R/5.5 pieces per row (measured cmax 357 at R=2048), and
    # the old {R/8, R/4, R/2, R} ladder made it pay for R/2 -- 43% wasted
    # probe/emission/bucket rows.  Each tier compiles ~60 ops (no merge
    # loops -- those tier separately); compile cost tracked in the bench.
    import os as _os
    _cl = _os.environ.get("TEKKEN_TPU_C_LADDER")
    if _cl == "flat":
        # experiment knob: ONE static window (no conds) — in-situ cost
        # bisect of the C ladder itself
        Cs = [min(R, 512)]
    elif _cl:
        Cs = sorted({min(R, max(64, int(R * float(f))))
                     for f in _cl.split(",")})
    else:
        Cs = sorted({min(R, max(64, int(R * f)))
                     for f in (0.125, 0.15625, 0.1953125, 0.25, 0.3125,
                               0.390625, 0.5, 0.625, 0.78125, 1.0)})
    branch = make_branch(Cs[-1])
    for Cv in reversed(Cs[:-1]):
        branch = (lambda small, big, Cv: lambda x: jax.lax.cond(
            cmax <= Cv, small, big, x))(make_branch(Cv), branch, Cv)

    if host_merge:
        tok, fb_start, fb_len, overflow, row_bad = branch(0)
        if _stage == 3:  # + probe + emission
            return tok.sum()
        n_out = jnp.sum((tok >= 0).astype(jnp.int32))
        if _stage in (35, 4, 45, 5):
            return fb_start.sum() + fb_len.sum() + n_out
        return tok, n_out, fb_start, fb_len, overflow, row_bad

    (tok, overflow, w, n_t, n_s, n_l, n_lm, n_23, row_bad) = branch(0)
    if _stage == 3:  # + probe + emission
        return tok.sum()
    if _stage in (35, 4):  # + bucket build
        return tok.sum() + w.sum() + n_t + n_s + n_l + n_23

    # byte-positional piece geometry for the merge tiers and the fb
    # records, derived ONCE from the stage-1 outputs (N-sized elementwise,
    # no gathers; concatenated so a tier reads both halves in ONE gather)
    rb_full = (jnp.arange(B, dtype=jnp.int32) * R)[:, None]
    pos_full = jnp.where(st >= 0, st + rb_full, -1).reshape(N)
    geo_full = jnp.concatenate([pos_full, pl.reshape(N)])
    NPM = NP4 + NP8 + NP32
    w23 = w[NPM:]

    # --- 2-3-byte misses: fully resolved in a compact tier sized to the
    # actual count.  A 2-byte miss needs NO probe (its only pair's
    # merged rank IS the dense-table entry — merge priority is the
    # merged rank); a 3-byte miss needs exactly ONE cuckoo probe after
    # the dense argmin picks the first merge.  Per tier: one 3T-row
    # byte gather, one 2T dense gather, one probe2, one 3T un-scatter —
    # replacing the 3-round matrix path these pieces took before
    # (round-4 profile: 4.2 of 8.3 ms per 256 KB, super-linear in B). ---
    def p23_tier(T):
        def run23(t):
            wv = w23[:T]
            livev = (wv & 1) == 1
            posr = jnp.where(livev, jax.lax.shift_right_logical(wv, 2),
                             -1)
            is3 = livev & ((wv & 2) != 0)
            pc = jnp.clip(posr, 0, N - 1)
            bs = byte_rank[jnp.concatenate(
                [pc, jnp.clip(pc + 1, 0, N - 1),
                 jnp.clip(pc + 2, 0, N - 1)])]
            b0, b1, b2 = bs[:T], bs[T:2 * T], bs[2 * T:]
            q1ok = livev & (b0 >= 0) & (b1 >= 0)
            q2ok = is3 & (b2 >= 0)
            didx = jnp.concatenate(
                [jnp.where(q1ok, b0 * 256 + b1, 0),
                 jnp.where(q2ok, b1 * 256 + b2, 0)])
            dd = dense_tab[didx]
            p1 = jnp.where(q1ok, dd[:T], INF)
            p2 = jnp.where(q2ok, dd[T:], INF)
            # 3-byte first merge: dense argmin, leftmost on ties
            any3 = is3 & ((p1 < INF) | (p2 < INF))
            first = p1 <= p2
            ql = jnp.where(any3, jnp.where(first, p1, b0), -1)
            qr = jnp.where(any3, jnp.where(first, b2, p2), -1)
            m = probe2(ql, qr, packed_table, seed1, seed2)
            hitp = m < INF
            two = livev & ~is3
            t0 = jnp.where(
                two, jnp.where(p1 < INF, p1, b0),
                jnp.where(is3, jnp.where(
                    any3, jnp.where(hitp, m,
                                    jnp.where(first, p1, b0)), b0), -1))
            t1 = jnp.where(
                two & (p1 >= INF), b1,
                jnp.where(is3 & any3 & ~hitp & ~first, p2,
                          jnp.where(is3 & ~any3, b1, -1)))
            t2 = jnp.where(is3 & ((any3 & ~hitp & first) | ~any3),
                           b2, -1)
            src = jnp.concatenate([t0, t1, t2])
            dst = jnp.concatenate([posr, posr + 1, posr + 2])
            ok = (src >= 0) & (jnp.concatenate([posr, posr, posr]) >= 0)
            return t.at[jnp.where(ok, dst, N)].set(src, mode="drop")
        return run23

    import os
    if os.environ.get("TEKKEN_TPU_P23_TIER1"):
        # experiment knob: flat two-tier ladder (in-situ cost bisect —
        # the 5-tier ladder is suspected of blocking XLA scheduling)
        tiers3 = sorted({max(64, NP3 // 4), NP3})
    else:
        tiers3 = sorted({64, max(64, NP3 // 64), max(64, NP3 // 16),
                         max(64, NP3 // 4), NP3})
    b3 = p23_tier(tiers3[-1])
    for T in reversed(tiers3[:-1]):
        b3 = (lambda small, big, T: lambda t: jax.lax.cond(
            n_23 <= T, small, big, t))(p23_tier(T), b3, T)
    tok = jax.lax.cond(n_23 == 0, lambda t: t, b3, tok)
    if _stage == 42:  # + P23 probe/emit
        return tok.sum()

    def rows_fn(lo, rows):
        # unpack bucket rows [lo, lo+rows): jg -> (start, plen) via ONE
        # tier-sized gather from geo_full (fb rows merge zero lanes)
        wv = w[lo:lo + rows]
        livev = (wv & 1) == 1
        fbv = livev & ((wv & 2) != 0)
        jjv = jnp.clip(wv >> 2, 0, N - 1)
        g = geo_full[jnp.concatenate([jjv, jjv + N])]
        sv, pv = g[:rows], g[rows:]
        n0 = jnp.where(livev & ~fbv, pv, 0)
        s0 = jnp.where(livev & ~fbv, sv, -1)
        return n0, s0

    tok_flat = _merge_buckets(
        tok, byte_rank, rows_fn, (n_t, n_s, n_lm),
        (NP4, NP8, NP32), packed_table, dense_tab, seed1, seed2, _stage)
    if _stage in (45, 5):
        return tok_flat
    n_out = jnp.sum((tok_flat >= 0).astype(jnp.int32))

    # fallback records (pieces > P_LANES) can only sit in the long
    # bucket's rows; their geometry gathers are NP32-sized and skipped
    # outright when the bucket is empty (the common case)
    def fb_some(_):
        wl = w[NP4 + NP8:NPM]
        livel = (wl & 1) == 1
        fbl = livel & ((wl & 2) != 0)
        jjl = jnp.clip(wl >> 2, 0, N - 1)
        g = geo_full[jnp.concatenate([jjl, jjl + N])]
        s = jnp.where(fbl, g[:NP32], -1)
        L = jnp.where(fbl, g[NP32:], 0)
        return s, L

    fb_start, fb_len = jax.lax.cond(
        n_l == 0,
        lambda _: (jnp.full(NP32, -1, jnp.int32),
                   jnp.zeros(NP32, jnp.int32)),
        fb_some, 0)
    return tok_flat, n_out, fb_start, fb_len, overflow, row_bad


def packed_encode_fn(seed1: int, seed2: int, np_cap, wseed: int = 0,
                     host_merge: bool = False, route: int | None = None):
    # pallas_enabled() changes which pipeline the trace takes (compact vs
    # flat for route==1, fused vs XLA stage 1); it must be part of the
    # cache key or a toggled TEKKEN_TPU_PALLAS serves a stale trace of
    # the other pipeline (ADVICE r3).
    from .pallas_stage1 import pallas_enabled

    return _packed_encode_fn(seed1, seed2, np_cap, wseed, host_merge,
                             route, pallas_enabled(), _use_p23(),
                             _fb_len_limit())


@functools.lru_cache(maxsize=16)
def _packed_encode_fn(seed1: int, seed2: int, np_cap, wseed: int,
                      host_merge: bool, route: int | None, _pallas: bool,
                      _p23: bool = True, _fbl: int = P_SHORT):
    import functools as ft
    import jax

    return jax.jit(ft.partial(packed_encode_impl, seed1=seed1, seed2=seed2,
                              wseed=wseed, np_cap=np_cap,
                              host_merge=host_merge, route=route))


def host_route(buf: np.ndarray) -> int:
    """The stage-1 routing decision in numpy (BIT-IDENTICAL predicates to
    the device cond chain — padding zeros are neither ws nor digit, so
    whole-buffer checks match the device's): 1 simple ASCII / 2 general
    ASCII / 3 UTF-8."""
    if buf.size and int(buf.max()) >= 0x80:
        return 3
    is_w = (buf == 32) | ((buf >= 9) & (buf <= 13))
    if (is_w[:, 1:] & is_w[:, :-1]).any():
        return 2
    is_n = (buf >= 48) & (buf <= 57)
    if (is_n[:, 3:] & is_n[:, 2:-1] & is_n[:, 1:-2] & is_n[:, :-3]).any():
        return 2
    return 1


def doc_routes(buf: np.ndarray) -> np.ndarray:
    """Per-ROW routing: host_route's predicates evaluated row-locally
    (pieces never cross rows, so a row's route depends only on its own
    bytes).  Returns int8[B]; host_route(buf) == doc_routes(buf).max()
    for non-empty buffers."""
    r = np.ones(buf.shape[0], np.int8)
    is_w = (buf == 32) | ((buf >= 9) & (buf <= 13))
    ws2 = (is_w[:, 1:] & is_w[:, :-1]).any(axis=1)
    is_n = (buf >= 48) & (buf <= 57)
    dig4 = (is_n[:, 3:] & is_n[:, 2:-1] & is_n[:, 1:-2]
            & is_n[:, :-3]).any(axis=1)
    r[ws2 | dig4] = 2
    r[(buf >= 0x80).any(axis=1)] = 3
    return r


def splice_host_merges(out, out_pos, flat, fb_start, fb_len, merge_fn,
                       base: int = 0):
    """Merge the kernel's recorded miss spans on host and splice their
    tokens into the device token stream by position.

    out/out_pos: device tokens and their flat byte positions (np arrays);
    flat: the flat input byte buffer; merge_fn(buf, starts, lens) ->
    (tokens back-to-back, counts) with byte_pair_merge semantics (the
    native engine's merge_spans, or the oracle fallback); ``base`` offsets
    shard-local span positions into ``flat``.  Token k of a span at start
    s gets position s + k (< s + len, so it never collides with another
    piece's slots)."""
    sel = fb_start >= 0
    starts = fb_start[sel].astype(np.int64)
    if starts.size == 0:
        return out, out_pos
    lens = fb_len[sel].astype(np.int64)
    toks, cnts = merge_fn(flat, base + starts, lens)
    cnts = np.asarray(cnts, dtype=np.int64)
    within = np.arange(len(toks), dtype=np.int64) - np.repeat(
        np.cumsum(cnts) - cnts, cnts)
    pos = np.repeat(starts, cnts) + within
    out = np.concatenate([out, np.asarray(toks, out.dtype)])
    out_pos = np.concatenate([out_pos, pos.astype(out_pos.dtype)])
    o = np.argsort(out_pos, kind="stable")
    return out[o], out_pos[o]


def oracle_merge_fn(ranks):
    """byte_pair_merge-based merge_fn (exact fallback when the native
    engine is unavailable)."""
    from ..oracle import byte_pair_merge

    def fn(flat, starts, lens):
        toks: list[int] = []
        cnts = np.empty(len(starts), np.int32)
        for i, (s, ln) in enumerate(zip(starts, lens)):
            t = byte_pair_merge(flat[s:s + ln].tobytes(), ranks)
            toks.extend(t)
            cnts[i] = len(t)
        return np.asarray(toks, np.int32), cnts
    return fn


class PackedEncoder:
    """Host wrapper over the packed device kernel.

    ``merge="device"`` (default): misses merge on device in the length-
    bucketed matrix — one scalar readback per batch, the right shape when
    tokens stay device-resident or the host link is slow (the axon tunnel
    makes per-batch array readbacks cost ~100ms+, measured).
    ``merge="host"``: the device only emits whole-piece/single tokens and
    records every miss as a span for the native C++ engine to bulk-merge
    and splice — faster when host<->device transfers are cheap (real
    PCIe/ICI hardware, CPU backend) and exact for ANY vocab (host
    byte_pair_merge has no piece-length limit)."""

    def __init__(self, tokenizer, rows: int = 64, row_len: int = 1024,
                 np_cap: int | None = None, merge: str = "device"):
        import jax.numpy as jnp

        table = tokenizer.cuckoo_table()
        self._packed = jnp.asarray(table.packed)
        self._dense = jnp.asarray(table.byte_pair_dense())
        self._seed1 = int(table.seed1)
        self._seed2 = int(table.seed2)
        wm = tokenizer.word_map()
        self._word_rows = jnp.asarray(wm.rows)
        self._wseed = int(wm.seed)
        self._B = rows
        self._R = row_len
        self._np_cap = (np_cap if np_cap is not None
                        else default_np_cap(rows * row_len))
        self._ranks = tokenizer.ranks
        self._tokenizer = tokenizer   # row-overflow host re-encode
        if merge not in ("host", "device"):
            raise ValueError(f"merge must be 'host' or 'device': {merge!r}")
        self._host_merge = merge == "host"
        self._merge_fn = None
        if self._host_merge:
            native = tokenizer._get_native_encoder()
            self._merge_fn = (native.merge_spans if native is not None
                              else oracle_merge_fn(self._ranks))

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
        import os

        buf, lengths = self.pack(texts)
        # Static host routing: at B=128 the device cond chain measured
        # slightly faster (round-3 early A/B: 30.8 vs 32.8 MB/s), but at
        # B=512 the cond chain LOSES 31% (interleaved A/B: 30.2 vs
        # 20.9 MB/s — conds block XLA fusion across the stage-1 boundary
        # at large shapes), so production routes on the host; the numpy
        # predicates are ~free and bit-identical.  In-jit callers that
        # cannot see the data (the distributed path) keep the cond chain.
        #
        # Routing is PER ROW GROUP (round 5, VERDICT r4 item 4): one CJK
        # doc in a 512-doc batch used to demote the whole 1 MB buffer to
        # the route-3 byte-granular char path.  Docs are grouped by their
        # own route and each minority group runs in a power-of-two
        # sub-batch of its own shape, so the majority group keeps its fast
        # route.  TEKKEN_TPU_GROUP_ROUTES=0 restores batch-global routing.
        routes = doc_routes(buf)[:len(texts)]
        distinct = sorted(set(routes.tolist())) if len(texts) else [1]
        if (len(distinct) <= 1
                or os.environ.get("TEKKEN_TPU_GROUP_ROUTES", "1") == "0"):
            return self._encode_buffer(buf, lengths, len(texts),
                                       host_route(buf))
        result: list[list[int] | None] = [None] * len(texts)
        for r in distinct:
            idx = np.flatnonzero(routes == r)
            Bg = 8
            while Bg < idx.size:
                Bg <<= 1
            Bg = min(Bg, self._B)
            for lo in range(0, idx.size, Bg):
                sel = idx[lo:lo + Bg]
                sub_buf = np.zeros((Bg, self._R), dtype=np.uint8)
                sub_buf[:sel.size] = buf[sel]
                sub_len = np.zeros(Bg, dtype=np.int32)
                sub_len[:sel.size] = lengths[sel]
                sub_out = self._encode_buffer(sub_buf, sub_len, sel.size,
                                              int(r))
                for j, i in enumerate(sel):
                    result[int(i)] = sub_out[j]
        return result

    def _encode_buffer(self, buf, lengths, n_docs: int, route: int):
        """Run the kernel on one packed (Bg, R) buffer with a static
        route; splice fb spans and host-re-encode overflow rows."""
        import jax.numpy as jnp

        Bg = buf.shape[0]
        np_cap = (self._np_cap if Bg == self._B
                  else max(64, self._np_cap * Bg // self._B))
        fn = packed_encode_fn(self._seed1, self._seed2, np_cap,
                              self._wseed, self._host_merge, route)
        tok, n_out, fb_start, fb_len, overflow, row_bad = fn(
            jnp.asarray(buf), jnp.asarray(lengths), self._packed,
            self._dense, self._word_rows)
        bad_rows: set[int] = set()
        if int(overflow):
            # bucket-capacity overflow (adversarial batch): a dropped
            # piece corrupts only its own row, so re-encode EXACTLY the
            # flagged rows on host and keep the device tokens elsewhere
            bad_rows = set(np.flatnonzero(np.asarray(row_bad)).tolist())
        tok = np.asarray(tok)
        out_pos = np.flatnonzero(tok >= 0).astype(np.int64)
        out = tok[out_pos]

        # host merge of recorded spans (all misses in host mode; only
        # pieces past the device-merge length limit in device mode)
        fb_start = np.asarray(fb_start)
        fb_len = np.asarray(fb_len)
        merge_fn = self._merge_fn or oracle_merge_fn(self._ranks)
        out, out_pos = splice_host_merges(
            out, out_pos, buf.reshape(-1), fb_start, fb_len, merge_fn)

        rows = out_pos // self._R
        cut = np.searchsorted(rows, np.arange(n_docs + 1))
        result = []
        for i in range(n_docs):
            if i in bad_rows:
                data = buf[i, :lengths[i]].tobytes()
                result.append(self._host_encode(data.decode("utf-8")))
            else:
                result.append(out[cut[i]:cut[i + 1]].tolist())
        return result

    def _host_encode(self, text: str) -> list[int]:
        """Exact host re-encode for overflow rows (native engine when
        built, else the scalar oracle)."""
        from ..oracle import encode_ranks
        tok = self._tokenizer
        native = tok._get_native_encoder() if tok is not None else None
        if native is not None:
            return native.encode(text)
        return encode_ranks(text, self._ranks)
