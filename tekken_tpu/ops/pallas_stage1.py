"""Fused stage-1 Pallas kernel: boundary rules + piece geometry + word
assembly + probe hash in ONE HBM sweep (simple-ASCII batches).

Motivation (round-2 perf model, CLAUDE.md): at merge-batch sizes every
XLA pass is launch-latency-bound (~0.05-0.15 ms per op), and stage 1 of
the packed kernel is ~40 such passes (boundary rule shifts, the reverse
cummin, the dword assembly shifts, the hash chain) — ~4 ms of the
~10.5 ms per 256 KB.  This kernel evaluates ALL of it per row-block in
VMEM/registers and writes the results once: plen (piece geometry), the
word-probe hash slot, and the masked content dwords the caller compares
against the gathered WordDirectMap row.

Mosaic constraints honored (bisected on v5e, round 3): int32-only
arithmetic (no uint8/uint32 casts), no bool concatenates, >=2D iota.
The hash pipeline is run in int32 with ``lax.shift_right_logical`` and
wrapping multiplies — bit-identical to the XLA uint32 formulation, so
the fused and unfused paths produce the same slots and dwords.

Rows are independent (pieces never cross documents): the reverse cummin
of piece geometry is a row-local log-doubling min, and all shifts fill
at the row edge.  Cross-row differences vs the flat XLA formulation are
masked out downstream (bytes beyond plen are zeroed by the dword masks;
non-start positions have plen == 0).

Row-level parity with the XLA path is asserted by
tests/test_pallas_stage1.py (interpret mode) and tools/tpu_smoke.py
(live device).
"""

from __future__ import annotations

import functools
import os


def pallas_enabled() -> bool:
    """Shared default-on switch for the fused Pallas kernels (this module
    and ops/pallas_merge.py).

    DEFAULT ON (round 3): unlike round 2's untested default-on (the Mosaic
    crash in BENCH_r02), the Pallas path (a) passes tools/tpu_smoke.py on
    the live v5e (all variants, oracle parity), (b) measures faster than
    the XLA path in interleaved same-session A/B (32.8 vs 29.4 MB/s,
    variance <2%), and (c) is wrapped in the runtime loud-fallback
    (tekkenizer encode_batch catches first-call compile failures and
    degrades to host with a RuntimeWarning).  ``TEKKEN_TPU_PALLAS=0``
    falls back to the plain XLA formulations; on the CPU backend the
    kernels run in interpret mode (tests)."""
    return os.environ.get("TEKKEN_TPU_PALLAS", "1") != "0"


def _i32(c: int) -> int:
    """Reinterpret a uint32 constant as int32 (two's complement)."""
    c &= 0xFFFFFFFF
    return c - (1 << 32) if c >= (1 << 31) else c


_M1 = _i32(0x9E3779B1)
_M2 = _i32(0x85EBCA77)
_M3 = _i32(0xC2B2AE3D)
_M4 = _i32(0x27D4EB2F)
_MC = _i32(0xC2B2AE3D)


def _sh(arr, k: int, fill):
    """Value at lane idx+k along the last axis (static slice), row-local."""
    import jax.numpy as jnp

    if k == 0:
        return arr
    pad = jnp.full(arr.shape[:-1] + (abs(k),), fill, dtype=arr.dtype)
    if k > 0:
        return jnp.concatenate([arr[..., k:], pad], axis=-1)
    return jnp.concatenate([pad, arr[..., :k]], axis=-1)


def _kernel(byts_ref, len_ref, *out_refs, n_words: int, size_mask: int,
            wseed: int):
    import jax
    import jax.numpy as jnp

    from .pretokenize import _char_boundaries_simple, ascii_classes_arith

    b = byts_ref[...]                       # (RB, R) int32, ASCII (< 0x80)
    L = len_ref[...]                        # (RB, 1) int32
    R = b.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    valid = idx < L
    pk = ascii_classes_arith(b, out_dtype=jnp.int32)
    boundary = _char_boundaries_simple(b, valid, pk)  # bool, valid-masked

    # piece geometry: last_pos[i] = min_{j >= i} (is_last[j] ? j : BIG)
    # as a row-local log-doubling min (the reverse cummin of the XLA path)
    BIG = jnp.int32(1 << 30)
    nb = _sh(boundary.astype(jnp.int32), 1, 1)
    nv = _sh(valid.astype(jnp.int32), 1, 0)
    is_last = ((nb | (1 - nv)) != 0) & valid
    last = jnp.where(is_last, idx, BIG)
    k = 1
    while k < R:
        last = jnp.minimum(last, _sh(last, k, BIG))
        k <<= 1
    plen = jnp.where(boundary, last - idx + 1, 0)
    out_refs[0][...] = plen

    if n_words:
        bu = jnp.where(valid, b, 0)
        w = (bu | (_sh(bu, 1, 0) << 8) | (_sh(bu, 2, 0) << 16)
             | (_sh(bu, 3, 0) << 24))

        def msk(m):
            # int32 mask of min(max(m,0),4) low bytes (-1 == all bytes)
            m4 = jnp.clip(m, 0, 4)
            shv = jnp.minimum(m4, 3) * 8
            return jnp.where(m4 >= 4, jnp.int32(-1),
                             (jnp.int32(1) << shv) - jnp.int32(1))

        ws = [_sh(w, 4 * j, 0) & msk(plen - 4 * j) for j in range(n_words)]

        lsr = jax.lax.shift_right_logical
        h = ((ws[0] * jnp.int32(_M1)) ^ (ws[1] * jnp.int32(_M2))
             ^ (ws[2] * jnp.int32(_M3)) ^ (plen * jnp.int32(_M4))
             ^ jnp.int32(_i32(wseed)))
        h = h ^ lsr(h, 15)
        h = h * jnp.int32(_MC)
        h = h ^ lsr(h, 13)
        out_refs[1][...] = h & jnp.int32(size_mask)
        for j in range(n_words):
            out_refs[2 + j][...] = ws[j]


@functools.lru_cache(maxsize=8)
def _stage1_fn(B: int, R: int, RB: int, n_words: int, size_mask: int,
               wseed: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    n_out = 1 + (1 + n_words if n_words else 0)
    return pl.pallas_call(
        functools.partial(_kernel, n_words=n_words, size_mask=size_mask,
                          wseed=wseed),
        grid=(B // RB,),
        in_specs=[pl.BlockSpec((RB, R), lambda i: (i, 0)),
                  pl.BlockSpec((RB, 1), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((RB, R), lambda i: (i, 0))] * n_out,
        out_shape=[jax.ShapeDtypeStruct((B, R), jnp.int32)] * n_out,
        interpret=interpret,
    )


def _compact_kernel(*refs, n_words: int, size_mask: int, wseed: int,
                    rules: str):
    """Stage 1 + PIECE COMPACTION in one HBM sweep.

    Every downstream op of the packed kernel is a random-access op whose
    cost is rows/s-bound (~85-200 M rows/s on v5e), so running them at
    byte granularity (N rows) instead of piece granularity (~N/5.5) was
    the round-3 profile's dominant cost (word probe 12.3 ms of 33.8 ms
    per 1 MB).  This kernel compacts every row's piece records
    (start lane, plen, content dwords) to the row's left edge in VMEM
    with a binary-gap shift network, so the caller can slice a C-column
    window (C = a tier over the max per-row piece count) and run the
    probe, the token emission, and the merge-bucket build on B*C rows.

    The network: piece starts have row-local compact ids (exclusive
    cumsum of the start mask) and gaps ``g = lane - id``.  Gaps are
    non-decreasing along a row and adjacent gap differences are bounded
    by the lane distance, so moving every record left by bit k of its
    remaining gap, LSB to MSB, is collision-free (differentially tested
    against numpy compaction in tests/test_pallas_stage1.py).

    Outputs (all (RB, R) int32, -1-padded past each row's count):
      start_rl  row-local byte lane of each piece start
      plen_c    piece length
      slot_c    word-probe hash slot (0 when no word map)
      ws_c[n_words]  masked little-endian content dwords
      cnt       (RB, 1) pieces in the row
    """
    import jax
    import jax.numpy as jnp

    from .pretokenize import (_char_boundaries_general,
                              _char_boundaries_simple, ascii_classes_arith)

    if rules == "external":
        # byte-level boundary flags computed upstream (the UTF-8 route:
        # char-class gathers + char compaction stay in XLA); everything
        # downstream — geometry, content dwords, hash, compaction — is
        # byte-positional and rule-set-independent
        byts_ref, bound_ref, len_ref, *out_refs = refs
    else:
        byts_ref, len_ref, *out_refs = refs
        bound_ref = None
    b = byts_ref[...]                       # (RB, R) int32
    L = len_ref[...]                        # (RB, 1) int32
    R = b.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    valid = idx < L
    if rules == "external":
        boundary = (bound_ref[...] != 0) & valid
    elif rules == "general":
        pk = ascii_classes_arith(b, out_dtype=jnp.int32)
        boundary = _char_boundaries_general(b, valid, pk)
    else:
        pk = ascii_classes_arith(b, out_dtype=jnp.int32)
        boundary = _char_boundaries_simple(b, valid, pk)  # valid-masked

    BIG = jnp.int32(1 << 30)
    nb = _sh(boundary.astype(jnp.int32), 1, 1)
    nv = _sh(valid.astype(jnp.int32), 1, 0)
    is_last = ((nb | (1 - nv)) != 0) & valid
    last = jnp.where(is_last, idx, BIG)
    k = 1
    while k < R:
        last = jnp.minimum(last, _sh(last, k, BIG))
        k <<= 1
    plen = jnp.where(boundary, last - idx + 1, 0)

    # content dwords at starts (masked to plen)
    bu = jnp.where(valid, b, 0)
    w = (bu | (_sh(bu, 1, 0) << 8) | (_sh(bu, 2, 0) << 16)
         | (_sh(bu, 3, 0) << 24))

    def msk(m):
        m4 = jnp.clip(m, 0, 4)
        shv = jnp.minimum(m4, 3) * 8
        return jnp.where(m4 >= 4, jnp.int32(-1),
                         (jnp.int32(1) << shv) - jnp.int32(1))

    nw = max(n_words, 1)   # singles need ws[0] for the byte value
    vals = [jnp.where(boundary, idx, -1),          # start lane
            jnp.where(boundary, plen, -1)]         # plen
    vals += [_sh(w, 4 * j, 0) & msk(plen - 4 * j) for j in range(nw)]

    # binary-gap compaction: id = exclusive count of starts, g = lane - id
    mark = plen > 0
    inc = mark.astype(jnp.int32)
    csum = inc
    k = 1
    while k < R:
        csum = csum + _sh(csum, -k, 0)
        k <<= 1                                     # inclusive cumsum
    gap = jnp.where(mark, idx - (csum - inc), BIG)
    cnt = csum[:, R - 1:R]

    k = 0
    step = 1
    while step < R:
        g_in = _sh(gap, step, BIG)
        sel = (g_in < BIG) & (((g_in >> k) & 1) == 1)
        stay = (gap < BIG) & (((gap >> k) & 1) == 0)
        new_vals = []
        for v in vals:
            v_in = _sh(v, step, -1)
            new_vals.append(jnp.where(sel, v_in,
                                      jnp.where(stay, v, -1)))
        vals = new_vals
        gap = jnp.where(sel, g_in - step, jnp.where(stay, gap, BIG))
        k += 1
        step <<= 1

    start_c, plen_c = vals[0], vals[1]
    ws_c = vals[2:]
    out_refs[0][...] = start_c
    out_refs[1][...] = plen_c

    if n_words:
        lsr = jax.lax.shift_right_logical
        h = ((ws_c[0] * jnp.int32(_M1)) ^ (ws_c[1] * jnp.int32(_M2))
             ^ (ws_c[2] * jnp.int32(_M3)) ^ (plen_c * jnp.int32(_M4))
             ^ jnp.int32(_i32(wseed)))
        h = h ^ lsr(h, 15)
        h = h * jnp.int32(_MC)
        h = h ^ lsr(h, 13)
        slot = h & jnp.int32(size_mask)
    else:
        slot = jnp.zeros_like(plen_c)
    out_refs[2][...] = jnp.where(plen_c > 0, slot, -1)
    for j in range(nw):
        out_refs[3 + j][...] = ws_c[j]
    out_refs[3 + nw][...] = cnt


@functools.lru_cache(maxsize=16)
def _compact_fn(B: int, R: int, RB: int, n_words: int, size_mask: int,
                wseed: int, rules: str, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    nw = max(n_words, 1)
    n_out = 3 + nw
    in_specs = [pl.BlockSpec((RB, R), lambda i: (i, 0))]
    if rules == "external":
        in_specs.append(pl.BlockSpec((RB, R), lambda i: (i, 0)))
    in_specs.append(pl.BlockSpec((RB, 1), lambda i: (i, 0)))
    return pl.pallas_call(
        functools.partial(_compact_kernel, n_words=n_words,
                          size_mask=size_mask, wseed=wseed, rules=rules),
        grid=(B // RB,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((RB, R), lambda i: (i, 0))] * n_out
        + [pl.BlockSpec((RB, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, R), jnp.int32)] * n_out
        + [jax.ShapeDtypeStruct((B, 1), jnp.int32)],
        interpret=interpret,
    )


def stage1_compact(byts, lengths, n_words: int, word_size: int, wseed: int,
                   rules: str = "simple", boundary=None):
    """(B, R) uint8 + (B,) int32 -> (start_rl, plen_c, slot_c, ws_c...,
    cnt); piece records left-compacted per row, -1 padding (cnt: (B,)).

    ``rules`` selects the boundary formulation the kernel runs:
    "simple" (scan-free simple-ASCII rules — the caller routes),
    "general" (full rule set, row-local log-doubling scans — any ASCII),
    or "external" (``boundary`` carries precomputed byte-level piece-start
    flags, e.g. the XLA UTF-8 path's — the kernel does geometry + content
    dwords + hash + compaction only).
    """
    import jax
    import jax.numpy as jnp

    B, R = byts.shape
    rb_env = os.environ.get("TEKKEN_TPU_STAGE1_RB")
    if rb_env:
        RB = int(rb_env)
    else:
        # live (RB, R) arrays flowing through the shift networks; stay
        # well under the 16 MB scoped-vmem limit (the general rules run
        # ~6 extra scans, so budget more arrays)
        den = 12 if rules == "simple" else 18
        RB = max(8, (5 << 20) // (den * 4 * max(R, 128)))
        while RB & (RB - 1):
            RB &= RB - 1
    RB = min(RB, B)
    while B % RB:
        RB >>= 1
    interpret = jax.default_backend() == "cpu"
    fn = _compact_fn(B, R, RB, n_words, word_size - 1, wseed, rules,
                     interpret)
    if rules == "external":
        out = fn(byts.astype(jnp.int32), boundary.astype(jnp.int32),
                 lengths.reshape(B, 1))
    else:
        out = fn(byts.astype(jnp.int32), lengths.reshape(B, 1))
    return tuple(out[:-1]) + (out[-1].reshape(B),)


def stage1_fused(byts, lengths, n_words: int, word_size: int, wseed: int):
    """(B, R) uint8 + (B,) int32 -> (plen, slot, ws...) each (B, R) int32.

    ``n_words`` 3 (narrow) or 6 (wide); 0 disables the word outputs (no
    word map) and returns just ``(plen,)``.  All outputs are bit-identical
    to the XLA stage-1 formulation in ops/packed.py.
    """
    import os

    import jax
    import jax.numpy as jnp

    B, R = byts.shape
    # Row-block size: each grid step costs fixed DMA/invocation overhead,
    # but the SCOPED vmem limit for a kernel's stack is 16 MB (round 3),
    # so budget ~6 MB across the ~12 live (RB, R) int32 arrays.
    rb_env = os.environ.get("TEKKEN_TPU_STAGE1_RB")
    if rb_env:
        RB = int(rb_env)
    else:
        RB = max(8, (6 << 20) // (12 * 4 * max(R, 128)))
        while RB & (RB - 1):
            RB &= RB - 1
    RB = min(RB, B)
    while B % RB:
        RB >>= 1
    interpret = jax.default_backend() == "cpu"
    fn = _stage1_fn(B, R, RB, n_words, word_size - 1, wseed, interpret)
    out = fn(byts.astype(jnp.int32), lengths.reshape(B, 1))
    return tuple(out)
