r"""Vectorized Tekken pre-tokenizer: the regex splitter as data-parallel ops.

North star: "regex splitter -> vectorized byte-class DFA scan".  Instead of a
sequential backtracking regex (the reference delegates this to its external
engine — reference: src/tekkenizer.rs:123,125), the hardcoded pattern

    (?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|
     ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+

is compiled, by hand, into closed-form *piece-boundary rules* over character
classes.  Because the pattern's matches tile the input, tokenization is fully
determined by where matches *start*; leftmost-first alternation semantics
reduce to per-run rules (derivation in the comments below), each computable
with vectorized segmented scans — O(log n) depth, no sequential DFA walk at
all.  This is strictly more parallel than a scan-based DFA and maps directly
onto the VPU.

Rule summary (char classes L=letter, N=number, W=whitespace, P=other):
- N runs split into triples from the run start (``\p{N}{1,3}``); nothing
  ever absorbs a digit.
- An L run is absorbed into a preceding token iff the previous char is
  non-newline whitespace (``[^\r\n\p{L}\p{N}]?\p{L}+`` via the ws-attach
  rule) or a free length-1 P run (same alternative), including the
  contraction split ``'s/'t/'re/'ve/'m/'ll/'d`` (case-insensitive, full
  Unicode folding) which consumes 1-2 letters and re-starts a piece on the
  remainder.
- A P run starts a piece unless preceded by a literal space (`` ?[^\s...]+``),
  and absorbs the maximal following ``[\r\n]*`` prefix of the next W run.
- A W run (entered past any newline prefix absorbed by a preceding P token)
  emits: the ``\s*[\r\n]+`` piece up to its last newline, then the tail
  follows the (?!\S) backtracking rules — all but the last char as one piece,
  with the final ws char attaching to a following letter run (any non-newline
  ws) or punct run (space only), else standing alone.

Verified against the scalar oracle (tests/test_pretokenize.py fuzz).
"""

from __future__ import annotations

import functools
import os

import numpy as np

_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "data", "unicode_tables.npz")

# class bits in the unicode table
_LETTER, _NUMBER, _WS = 1, 2, 4
# fold ids (tools/build_unicode_tables.py): 1..8 = s,t,r,e,v,m,l,d
_F_S, _F_T, _F_R, _F_E, _F_V, _F_M, _F_L, _F_D = range(1, 9)


@functools.lru_cache(maxsize=1)
def unicode_tables() -> tuple[np.ndarray, np.ndarray]:
    z = np.load(_DATA)
    return z["cls"], z["fold"]


@functools.lru_cache(maxsize=1)
def unicode_packed_table() -> np.ndarray:
    """cls (bits 0-2) | fold << 3 (bits 3-6) in one uint8 table: the per-char
    class+fold lookup is a single big-table gather instead of two (gathers
    dominate the boundary pass on TPU)."""
    cls, fold = unicode_tables()
    return (cls | (fold << 3)).astype(np.uint8)


# --------------------------------------------------------------------- #
# segmented scans
# --------------------------------------------------------------------- #

def _seg_scan(values, reset, kind: str, reverse: bool = False):
    """Segmented scan: within each segment (delimited by reset=True at its
    first element), combine values left-to-right with ``kind``
    ('max' | 'min' | 'first').  Runs as a log-depth associative scan."""
    import jax
    import jax.numpy as jnp

    if reverse:
        values = values[::-1]
        reset = reset[::-1]

    def combine(a, b):
        va, ra = a
        vb, rb = b
        if kind == "max":
            merged = jnp.maximum(va, vb)
        elif kind == "min":
            merged = jnp.minimum(va, vb)
        else:  # 'first'
            merged = va
        return jnp.where(rb, vb, merged), ra | rb

    out, _ = jax.lax.associative_scan(combine, (values, reset))
    if reverse:
        out = out[::-1]
    return out


# --------------------------------------------------------------------- #
# char-level boundary computation
# --------------------------------------------------------------------- #

def _shift(arr, k, fill):
    """Value at idx+k as a static slice (cheap vector op, not a gather)."""
    import jax.numpy as jnp

    n = arr.shape[0]
    if k == 0:
        return arr
    pad = jnp.full(min(abs(k), n), fill, dtype=arr.dtype)
    if k > 0:
        return jnp.concatenate([arr[k:], pad]) if k < n else jnp.full(
            n, fill, arr.dtype)
    return jnp.concatenate([pad, arr[:k]]) if -k < n else jnp.full(
        n, fill, arr.dtype)


def _char_boundaries(cp, is_valid, pk=None):
    """Piece-start flags at char positions — gather-free formulation.

    Every rule of the Tekken pattern is expressed per-element with:
    - constant shifts (static slices) for neighbor-char context,
    - native cumulative scans:  run_start = cummax(idx at class changes),
      u = last non-newline position <= i, f = first newline position >= i,
    - one packed-cummax "broadcast from run start" for the single run-level
      bit rule E needs (is the char before this whitespace run a P?).

    Derivation notes (rule E, the whitespace run [S,E) with entry past the
    ``[\\r\\n]*`` prefix a preceding P token absorbs):
      i == entry      <=>  prev-run-not-P and i==S,  or  prev-run-P and
                           ~is_nl(i) and all of [S,i) newline (u[i-1] < S)
      i == tail_start (>entry) <=> is_nl(i-1), i-1 >= entry (u[i-1] >= S or
                           prev-run-not-P), and no newline in [i,E)
                           (f[i] >= E i.e. f[i] > i and next-run via
                           change_next logic: f[i] beyond run end)
      i == E-1 extra piece <=> change_next(i), the char i-1 is in the tail
                           (same run, f[i-1] >= E), and X exists
                           (valid(i+1)).
    Fuzz-verified against the regex oracle (tools/fuzz_pretokenize.py).
    """
    import jax
    import jax.numpy as jnp

    n = cp.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    cp = jnp.where(is_valid, cp, 0)
    if pk is None:
        packed_tab = jnp.asarray(unicode_packed_table())
        pk = packed_tab[cp]          # one big-table gather
    pk = jnp.where(is_valid, pk, 0)
    cls = pk & jnp.uint8(7)
    fold = (pk >> jnp.uint8(3)).astype(jnp.uint8)

    is_l = (cls & _LETTER) != 0
    is_n = (cls & _NUMBER) != 0
    is_w = (cls & _WS) != 0
    is_p = is_valid & ~is_l & ~is_n & ~is_w
    is_nl = is_valid & ((cp == 0x0D) | (cp == 0x0A))
    is_space = is_valid & (cp == 0x20)
    is_apos = is_valid & (cp == 0x27)

    g = jnp.where(is_l, 0, jnp.where(is_n, 1, jnp.where(is_w, 2,
                                                        jnp.where(is_p, 3, 4))))

    change = jnp.concatenate([jnp.ones(1, dtype=bool), g[1:] != g[:-1]])
    change_next = jnp.concatenate([g[:-1] != g[1:], jnp.ones(1, dtype=bool)])

    # native cumulative scans
    S = jax.lax.cummax(jnp.where(change, idx, -1))          # run start
    u = jax.lax.cummax(jnp.where(~is_nl & is_valid, idx, -1))  # last non-nl <= i
    BIG = jnp.int32(1 << 30)
    # native reverse scans (~3x the [::-1] scan [::-1] idiom)
    f = jax.lax.cummin(jnp.where(is_nl, idx, BIG), reverse=True)  # 1st nl >= i

    # shifted neighbor context
    p_is_w = _shift(is_w, -1, False)
    p_is_nl = _shift(is_nl, -1, False)
    p_is_p = _shift(is_p, -1, False)
    p_is_space = _shift(is_space, -1, False)
    p_change = _shift(change, -1, False)      # prev char starts its own run
    p2_is_space = _shift(is_space, -2, False)
    u_prev = _shift(u, -1, jnp.int32(-1))
    f_prev = _shift(f, -1, BIG)
    next_valid = _shift(is_valid, 1, False)

    # ---- contraction at a free length-1 apostrophe run ----
    f1 = _shift(fold, 1, jnp.uint8(0))
    f2 = _shift(fold, 2, jnp.uint8(0))
    next_is_letter = _shift(is_l, 1, False)
    # char idx+2 is a letter in the same letter run as idx+1
    has_l2 = _shift(is_l, 2, False) & ~_shift(change, 2, True)
    p_free_apos = (is_p & is_apos & change & change_next & ~p_is_space)
    one_letter = (f1 == _F_S) | (f1 == _F_T) | (f1 == _F_M) | (f1 == _F_D)
    two_letter = (((f1 == _F_R) | (f1 == _F_V)) & has_l2 & (f2 == _F_E)) | \
                 ((f1 == _F_L) & has_l2 & (f2 == _F_L))
    contraction = p_free_apos & next_is_letter & (one_letter | two_letter)
    cons1 = contraction & one_letter
    cons2 = contraction & two_letter

    # ---- rule A: number runs split into triples ----
    b_num = is_n & (((idx - S) % 3) == 0)

    # ---- rule B: letter-run start (fires only at idx==S, so all context
    # is plain shifts) ----
    absorbed = ((p_is_w & ~p_is_nl)
                | (p_is_p & p_change & ~p2_is_space))
    b_letter_start = is_l & change & ~((idx > 0) & absorbed)

    # ---- rule C: post-contraction remainder ----
    b_letter_cont = is_l & ~change & (
        (_shift(change, -1, False) & _shift(cons1, -2, False))
        | (_shift(change, -2, False) & ~_shift(change, -1, False)
           & _shift(cons2, -3, False))
    )

    # ---- rule D: punct-run start ----
    b_punct = is_p & change & ~((idx > 0) & p_is_space)

    # ---- rule E: whitespace runs ----
    # broadcast "char before this run is P" from the run start via packed
    # cummax (idx is strictly increasing, so the latest run start wins)
    packed = jnp.where(change, idx * 2 + p_is_p.astype(jnp.int32), -1)
    prev_run_is_p = (jax.lax.cummax(packed) & 1) == 1

    run_continues = ~change  # i-1 is in the same run
    # no newline from i to the run's end: first nl >= i lies beyond the run.
    # Within a W run, "beyond the run" == f[i] > run_last; run_last is where
    # change_next holds.  Equivalent per-element test: the first nl >= i is
    # also >= the first position after the run; since the run is contiguous
    # whitespace, f[i] outside [i, run_last] <=> f[i] > run_last.  We avoid
    # run_last by noting nl chars are whitespace: f[i] stays within this run
    # unless there is no nl left in it, in which case f[i] jumps past E
    # (into a later run or BIG).  So test f[i] against the next change:
    nxt_change_pos = jax.lax.cummin(
        jnp.where(change_next, idx, BIG), reverse=True)  # run_last, per elem
    no_nl_to_end = f > nxt_change_pos
    no_nl_to_end_prev = f_prev > nxt_change_pos  # i-1 same run => same run_last

    is_entry = is_w & jnp.where(
        prev_run_is_p,
        ~is_nl & (u_prev < S),
        change,
    )
    b_ws_entry = is_entry  # entry < E automatic (entry is a char of the run)

    prev_ge_entry = jnp.where(prev_run_is_p, u_prev >= S, True)
    b_ws_tail = (is_w & run_continues & p_is_nl & prev_ge_entry
                 & no_nl_to_end & ~is_entry)

    # lone/attached final char piece at E-1 when the tail has >= 2 chars,
    # i.e. the previous char is already inside the tail
    b_ws_last = (is_w & change_next & next_valid
                 & run_continues & ~p_is_nl & no_nl_to_end_prev)

    b_ws = b_ws_entry | b_ws_tail | b_ws_last

    return (b_num | b_letter_start | b_letter_cont | b_punct | b_ws) & is_valid


def _char_boundaries_simple(cp, is_valid, pk):
    """Scan-free boundary rules for SIMPLE inputs: no whitespace run longer
    than 1 char and no digit run longer than 3 (the caller checks; typical
    prose and the bench corpus qualify).  Under those constraints every
    run-level rule of _char_boundaries collapses to neighbor shifts:

    - digit runs (<= 3) split only at their start: ``(idx - S) % 3 == 0``
      iff ``change``;
    - a length-1 whitespace run IS its own start, so ``prev_run_is_p`` is
      just the previous char's class, the ``u_prev < S`` all-newline-prefix
      condition is vacuous, and the tail/last sub-pieces cannot exist:
      ``b_ws = is_w & ~(p_is_p & is_nl)`` (a lone newline after a punct run
      is absorbed by the punct token's ``[\\r\\n]*``).

    Differentially fuzzed against the oracle on qualifying inputs
    (tests/test_simple_boundary_branch.py).

    Shape-generic over the LAST axis (rows are independent), so the same
    code serves the 1D host path, the batched 2D XLA path, and the fused
    Pallas kernel (ops/pallas_stage1.py).

    MOSAIC-SAFE: all arithmetic is int32 and no bool array is ever
    concatenated — Mosaic's vreg layout assert fires on uint8 arithmetic
    and bool concatenate at (8, n) block shapes (bisected on v5e, round 3;
    the round-2 BENCH_r02 crash).  XLA compiles both forms identically."""
    import jax
    import jax.numpy as jnp

    n = cp.shape[-1]
    if cp.ndim > 1:
        # >= 2D iota: 1D iota is rejected inside Pallas TPU kernels
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (1,) * (cp.ndim - 1) + (n,), cp.ndim - 1)
    else:
        idx = jnp.arange(n, dtype=jnp.int32)

    def sh(arr, k, fill):
        # value at idx+k along the last axis (static slice, not a gather)
        pad = jnp.full(arr.shape[:-1] + (abs(k),), fill, dtype=arr.dtype)
        if k > 0:
            return jnp.concatenate([arr[..., k:], pad], axis=-1)
        return jnp.concatenate([pad, arr[..., :k]], axis=-1)

    cp = jnp.where(is_valid, cp, 0)
    pk = jnp.where(is_valid, pk.astype(jnp.int32), 0)
    cls = pk & 7
    fold = (pk >> 3) & 0x1F

    is_l = (cls & _LETTER) != 0
    is_n = (cls & _NUMBER) != 0
    is_w = (cls & _WS) != 0
    is_p = is_valid & ~is_l & ~is_n & ~is_w
    is_nl = is_valid & ((cp == 0x0D) | (cp == 0x0A))
    is_space = is_valid & (cp == 0x20)
    is_apos = is_valid & (cp == 0x27)

    g = jnp.where(is_l, 0, jnp.where(is_n, 1, jnp.where(is_w, 2,
                                                        jnp.where(is_p, 3,
                                                                  4))))
    onei = jnp.ones(g.shape[:-1] + (1,), dtype=jnp.int32)
    change = jnp.concatenate(
        [onei, (g[..., 1:] != g[..., :-1]).astype(jnp.int32)], axis=-1) != 0
    change_next = jnp.concatenate(
        [(g[..., :-1] != g[..., 1:]).astype(jnp.int32), onei], axis=-1) != 0

    # pack every per-char predicate into ONE int32 word and shift the word
    # once per offset: shifts are op-latency-bound, so 4 packed shifts
    # replace ~12 predicate shifts
    z = jnp.int32(0)
    pk2 = (jnp.where(is_l, 1, z) | jnp.where(is_w, 4, z)
           | jnp.where(is_p, 8, z) | jnp.where(is_nl, 16, z)
           | jnp.where(is_space, 32, z) | jnp.where(change, 128, z)
           | (fold << 8))
    m1 = sh(pk2, -1, z)
    m2 = sh(pk2, -2, z)
    q1 = sh(pk2, 1, z)
    q2 = sh(pk2, 2, z)

    p_is_w = (m1 & 4) != 0
    p_is_nl = (m1 & 16) != 0
    p_is_p = (m1 & 8) != 0
    p_is_space = (m1 & 32) != 0
    p_change = (m1 & 128) != 0
    p2_is_space = (m2 & 32) != 0

    # contraction at a free length-1 apostrophe run (same as the general
    # path — already shift-only)
    f1 = (q1 >> 8) & 0x1F
    f2 = (q2 >> 8) & 0x1F
    next_is_letter = (q1 & 1) != 0
    has_l2 = ((q2 & 1) != 0) & ((q2 & 128) == 0)
    p_free_apos = (is_p & is_apos & change & change_next & ~p_is_space)
    one_letter = (f1 == _F_S) | (f1 == _F_T) | (f1 == _F_M) | (f1 == _F_D)
    two_letter = (((f1 == _F_R) | (f1 == _F_V)) & has_l2 & (f2 == _F_E)) | \
                 ((f1 == _F_L) & has_l2 & (f2 == _F_L))
    contraction = p_free_apos & next_is_letter & (one_letter | two_letter)
    cons = (jnp.where(contraction & one_letter, 1, z)
            | jnp.where(contraction & two_letter, 2, z))
    cm2 = sh(cons, -2, z)
    cm3 = sh(cons, -3, z)

    b_num = is_n & change
    absorbed = ((p_is_w & ~p_is_nl)
                | (p_is_p & p_change & ~p2_is_space))
    b_letter_start = is_l & change & ~((idx > 0) & absorbed)
    p_change1 = p_change                      # change at i-1
    p_change2 = (m2 & 128) != 0               # change at i-2
    b_letter_cont = is_l & ~change & (
        (p_change1 & ((cm2 & 1) != 0))
        | (p_change2 & ~p_change1 & ((cm3 & 2) != 0))
    )
    b_punct = is_p & change & ~((idx > 0) & p_is_space)
    b_ws = is_w & ~(p_is_p & is_nl)

    return (b_num | b_letter_start | b_letter_cont | b_punct
            | b_ws) & is_valid


def _char_boundaries_general(cp, is_valid, pk):
    """The FULL boundary rule set of ``_char_boundaries``, row-local over
    the last axis, with every cumulative scan expressed as a log-doubling
    shift network — the formulation the compact Pallas stage-1 kernel
    runs for general-ASCII batches (ws runs > 1 / digit runs > 3 allowed;
    chars == bytes, i.e. all input < 0x80).

    MOSAIC-SAFE like _char_boundaries_simple: int32 arithmetic only, no
    bool concatenates, >=2D iota, ``%`` replaced by an exact multiply-
    shift div-3 (valid for run offsets < 8192; asserted).  Bit-identical
    to _char_boundaries on qualifying rows (tests/test_pretokenize.py
    differential fuzz)."""
    import jax
    import jax.numpy as jnp

    n = cp.shape[-1]
    assert n <= 8192, n  # div-3 multiply trick bound (see b_num)
    if cp.ndim > 1:
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (1,) * (cp.ndim - 1) + (n,), cp.ndim - 1)
        idx = jnp.broadcast_to(idx, cp.shape)
    else:
        idx = jnp.arange(n, dtype=jnp.int32)

    def sh(arr, k, fill):
        # value at idx+k along the last axis (static slice, not a gather)
        if k == 0:
            return arr
        pad = jnp.full(arr.shape[:-1] + (min(abs(k), n),), fill,
                       dtype=arr.dtype)
        if k > 0:
            return (jnp.concatenate([arr[..., k:], pad], axis=-1)
                    if k < n else jnp.broadcast_to(pad, arr.shape))
        return (jnp.concatenate([pad, arr[..., :k]], axis=-1)
                if -k < n else jnp.broadcast_to(pad, arr.shape))

    def cummax_f(x, fill):
        k = 1
        while k < n:
            x = jnp.maximum(x, sh(x, -k, fill))
            k <<= 1
        return x

    def cummin_r(x, fill):
        k = 1
        while k < n:
            x = jnp.minimum(x, sh(x, k, fill))
            k <<= 1
        return x

    BIG = jnp.int32(1 << 30)
    cp = jnp.where(is_valid, cp, 0)
    pk = jnp.where(is_valid, pk.astype(jnp.int32), 0)
    cls = pk & 7
    fold = (pk >> 3) & 0x1F

    is_l = (cls & _LETTER) != 0
    is_n = (cls & _NUMBER) != 0
    is_w = (cls & _WS) != 0
    is_p = is_valid & ~is_l & ~is_n & ~is_w
    is_nl = is_valid & ((cp == 0x0D) | (cp == 0x0A))
    is_space = is_valid & (cp == 0x20)
    is_apos = is_valid & (cp == 0x27)

    g = jnp.where(is_l, 0, jnp.where(is_n, 1, jnp.where(is_w, 2,
                                                        jnp.where(is_p, 3,
                                                                  4))))
    onei = jnp.ones(g.shape[:-1] + (1,), dtype=jnp.int32)
    change = jnp.concatenate(
        [onei, (g[..., 1:] != g[..., :-1]).astype(jnp.int32)], axis=-1) != 0
    change_next = jnp.concatenate(
        [(g[..., :-1] != g[..., 1:]).astype(jnp.int32), onei], axis=-1) != 0

    vi = is_valid.astype(jnp.int32)
    z = jnp.int32(0)

    # scans (row-local log-doubling)
    S = cummax_f(jnp.where(change, idx, -1), jnp.int32(-1))
    u = cummax_f(jnp.where(~is_nl & (vi != 0), idx, -1), jnp.int32(-1))
    f = cummin_r(jnp.where(is_nl, idx, BIG), BIG)
    nxt_change_pos = cummin_r(jnp.where(change_next, idx, BIG), BIG)
    p_is_p_i = sh(jnp.where(is_p, 1, z), -1, z)
    prev_run_is_p = (cummax_f(
        jnp.where(change, idx * 2 + p_is_p_i, -1), jnp.int32(-1)) & 1) == 1

    # shifted neighbor context
    p_is_w = sh(jnp.where(is_w, 1, z), -1, z) != 0
    p_is_nl = sh(jnp.where(is_nl, 1, z), -1, z) != 0
    p_is_p = p_is_p_i != 0
    p_is_space = sh(jnp.where(is_space, 1, z), -1, z) != 0
    p_change = sh(jnp.where(change, 1, z), -1, z) != 0
    p2_is_space = sh(jnp.where(is_space, 1, z), -2, z) != 0
    u_prev = sh(u, -1, jnp.int32(-1))
    f_prev = sh(f, -1, BIG)
    next_valid = sh(vi, 1, z) != 0

    # contraction at a free length-1 apostrophe run
    f1 = sh(fold, 1, z)
    f2 = sh(fold, 2, z)
    next_is_letter = sh(jnp.where(is_l, 1, z), 1, z) != 0
    has_l2 = (sh(jnp.where(is_l, 1, z), 2, z) != 0) & (
        sh(jnp.where(change, 1, z), 2, 1) == 0)
    p_free_apos = (is_p & is_apos & change & change_next & ~p_is_space)
    one_letter = (f1 == _F_S) | (f1 == _F_T) | (f1 == _F_M) | (f1 == _F_D)
    two_letter = (((f1 == _F_R) | (f1 == _F_V)) & has_l2 & (f2 == _F_E)) | \
                 ((f1 == _F_L) & has_l2 & (f2 == _F_L))
    contraction = p_free_apos & next_is_letter & (one_letter | two_letter)
    cons = (jnp.where(contraction & one_letter, 1, z)
            | jnp.where(contraction & two_letter, 2, z))
    cm2 = sh(cons, -2, z)
    cm3 = sh(cons, -3, z)

    # rule A: number runs split into triples from the run start.
    # d % 3 via exact multiply-shift: floor(d/3) = (d*21846) >> 16 for
    # 0 <= d < 8192 (error term 2d/196608 < 1/3 keeps the floor exact)
    d = jnp.where(is_n, idx - S, z)
    div3 = jax.lax.shift_right_logical(d * jnp.int32(21846), 16)
    b_num = is_n & ((d - 3 * div3) == 0)

    # rule B: letter-run start
    absorbed = ((p_is_w & ~p_is_nl)
                | (p_is_p & p_change & ~p2_is_space))
    b_letter_start = is_l & change & ~((idx > 0) & absorbed)

    # rule C: post-contraction remainder
    p_change1 = p_change
    p_change2 = sh(jnp.where(change, 1, z), -2, z) != 0
    b_letter_cont = is_l & ~change & (
        (p_change1 & ((cm2 & 1) != 0))
        | (p_change2 & ~p_change1 & ((cm3 & 2) != 0))
    )

    # rule D: punct-run start
    b_punct = is_p & change & ~((idx > 0) & p_is_space)

    # rule E: whitespace runs (entry / tail / last sub-pieces)
    run_continues = ~change
    no_nl_to_end = f > nxt_change_pos
    no_nl_to_end_prev = f_prev > nxt_change_pos

    # bool selects spelled as logical ops: Mosaic materializes a
    # jnp.where on bool vectors (and scalar-bool splats) as an i8 mask
    # and fails on the i8 -> i1 truncation (caught by tpu_smoke, round
    # 4); & / | / ~ lower cleanly and are bit-identical
    is_entry = is_w & ((prev_run_is_p & ~is_nl & (u_prev < S))
                       | (~prev_run_is_p & change))
    prev_ge_entry = ~prev_run_is_p | (u_prev >= S)
    b_ws_tail = (is_w & run_continues & p_is_nl & prev_ge_entry
                 & no_nl_to_end & ~is_entry)
    b_ws_last = (is_w & change_next & next_valid
                 & run_continues & ~p_is_nl & no_nl_to_end_prev)
    b_ws = is_entry | b_ws_tail | b_ws_last

    return (b_num | b_letter_start | b_letter_cont | b_punct
            | b_ws) & is_valid


# --------------------------------------------------------------------- #
# ASCII fast path: bytes ARE chars
# --------------------------------------------------------------------- #

def ascii_packed_lookup(byts):
    """cls|fold<<3 for ASCII bytes as a one-hot bf16 matmul on the MXU —
    measured ~8x a gather for small tables (tools/bench_lookup_primitives:
    mxu256); exact because table values < 256.  byts: uint8[...] < 0x80."""
    import jax.numpy as jnp

    tab = jnp.asarray(unicode_packed_table()[:128], dtype=jnp.bfloat16)
    oh = (byts[..., None] == jnp.arange(128, dtype=jnp.uint8)
          ).astype(jnp.bfloat16)
    return (oh @ tab).astype(jnp.uint8)


def byte_boundaries_ascii(byts, length, pk):
    """Boundary flags for an all-ASCII row: every byte is a char, so the
    char-compaction scatters, the lead-byte bookkeeping, and the big-table
    gather of byte_boundaries all vanish.  ``pk`` is the packed class+fold
    byte from ascii_packed_lookup (computed batch-wide by the caller)."""
    import jax.numpy as jnp

    L = byts.shape[0]
    valid = jnp.arange(L, dtype=jnp.int32) < length
    return _char_boundaries(byts.astype(jnp.int32), valid, pk=pk)


def ascii_classes_arith(byts, out_dtype=None):
    """pk-layout class+fold byte for ASCII input via fused compares — no
    table, no one-hot matmul (ASCII \\s is exactly {9..13, 32}, letters
    A-Za-z, digits 0-9; contraction folds are the 8 lowercased letters).

    ``out_dtype``: default uint8; the Pallas boundary kernel passes int32
    because Mosaic's vreg layout assert rejects uint8 casts at (8, n)
    blocks (v5e, round 3)."""
    import jax.numpy as jnp

    b = byts.astype(jnp.int32)
    lo = b | 32
    is_l = (lo >= 97) & (lo <= 122)
    is_n = (b >= 48) & (b <= 57)
    is_w = (b == 32) | ((b >= 9) & (b <= 13))
    z = jnp.int32(0)
    fold = z
    for fid, ch in zip(range(1, 9), b"strevmld"):
        fold = jnp.where(is_l & (lo == ch), fid, fold)
    pk = (jnp.where(is_l, 1, z) | jnp.where(is_n, 2, z)
          | jnp.where(is_w, 4, z) | (fold << 3))
    return pk.astype(out_dtype if out_dtype is not None else jnp.uint8)


def byte_boundaries_ascii_simple(byts, length, pk):
    """Scan-free boundary flags for an all-ASCII row of a SIMPLE batch
    (no ws run > 1, no digit run > 3 — the caller checks batch-wide)."""
    import jax.numpy as jnp

    L = byts.shape[0]
    valid = jnp.arange(L, dtype=jnp.int32) < length
    return _char_boundaries_simple(byts.astype(jnp.int32), valid, pk)


# --------------------------------------------------------------------- #
# byte-level wrapper: UTF-8 structure + boundary flags
# --------------------------------------------------------------------- #

def byte_char_structure(byts, length):
    """Vectorized UTF-8 decode over a padded byte buffer.

    Returns (is_lead bool[L], cp int32[L] at lead positions) — cp is 0 at
    non-lead/invalid positions.  Assumes well-formed UTF-8 (guaranteed for
    text that came from a str/String).
    """
    import jax.numpy as jnp

    L = byts.shape[0]
    idx = jnp.arange(L, dtype=jnp.int32)
    valid = idx < length
    b = jnp.where(valid, byts, 0).astype(jnp.int32)

    is_cont = (b & 0xC0) == 0x80
    is_lead = valid & ~is_cont

    def nxt(k):
        # static slice, not a gather: 30x cheaper on TPU
        return _shift(byts, k, np.uint8(0)).astype(jnp.int32) & 0x3F

    b1, b2, b3 = nxt(1), nxt(2), nxt(3)
    cp1 = b
    cp2 = ((b & 0x1F) << 6) | b1
    cp3 = ((b & 0x0F) << 12) | (b1 << 6) | b2
    cp4 = ((b & 0x07) << 18) | (b1 << 12) | (b2 << 6) | b3
    cp = jnp.where(b < 0x80, cp1,
                   jnp.where(b < 0xE0, cp2,
                             jnp.where(b < 0xF0, cp3, cp4)))
    cp = jnp.where(is_lead, cp, 0)
    return is_lead, cp


def byte_boundaries_via_chars(byts, length):
    """Round-1..4 formulation of byte_boundaries: compact chars with
    scatters, run the char-level rules, scatter boundaries back.  Kept as
    the differential reference for the direct byte-level formulation
    below (the three N-source scatters cost ~20 ms/MB on v5e)."""
    import jax.numpy as jnp

    is_lead, cp = byte_char_structure(byts, length)
    L = byts.shape[0]
    idx = jnp.arange(L, dtype=jnp.int32)

    # compact chars: char k lives at byte position lead_pos[k]
    char_idx = jnp.cumsum(is_lead.astype(jnp.int32)) - 1  # per byte
    # scatter lead-byte positions / codepoints into char-order arrays as
    # two separate width-1 scatters (interleaved multi-column scatters
    # measured far slower on TPU — tools/bench_scatter_strategies.py);
    # invalid rows routed out of bounds and dropped
    scatter_idx = jnp.where(is_lead, char_idx, L)
    lead_pos = jnp.zeros(L, dtype=jnp.int32).at[scatter_idx].set(
        idx, mode="drop")
    cp_char = jnp.zeros(L, dtype=jnp.int32).at[scatter_idx].set(
        cp, mode="drop")
    nchars = jnp.sum(is_lead.astype(jnp.int32))
    char_valid = jnp.arange(L, dtype=jnp.int32) < nchars

    cb = _char_boundaries(cp_char, char_valid)

    # map char boundaries back to byte positions
    out = jnp.zeros(L, dtype=bool).at[
        jnp.where(cb, lead_pos, L)].set(True, mode="drop")
    # ensure padding never flagged
    out = out & (idx < length)
    return out


def byte_boundaries(byts, length):
    """Piece-start flags over a padded byte buffer (True at the lead byte
    of each piece's first char) — DIRECT byte-level formulation (round 5).

    The char-compaction formulation (byte_boundaries_via_chars) paid
    three N-source scatters (~20 ms/MB on v5e).  Here the char-level
    rules of _char_boundaries run at BYTE granularity with every
    per-char value BROADCAST to the char's continuation bytes (a 3-shift
    select keyed on the lead-distance), so class runs are byte-contiguous
    and all scans/shifts work on byte positions; char-indexed neighbor
    reads use selects keyed on the neighbor's byte length.  Rule A's
    char-modular split uses the char ordinal (cumsum of is_lead); rule
    C's back-references become a forward push from the contraction
    apostrophe (multi-byte folded letters like U+017F make byte shifts
    != char shifts, so look-backs cannot be plain byte shifts).
    Differentially tested against byte_boundaries_via_chars and the
    regex oracle (tools/fuzz_pretokenize.py)."""
    import jax
    import jax.numpy as jnp

    L = byts.shape[0]
    idx = jnp.arange(L, dtype=jnp.int32)
    valid = idx < length
    is_lead, cp = byte_char_structure(byts, length)

    b = jnp.where(valid, byts, 0).astype(jnp.int32)
    is_cont = valid & ((b & 0xC0) == 0x80)
    # char byte length at lead bytes (junk at continuations, masked by use)
    clen = jnp.where(b < 0xC0, 1, jnp.where(b < 0xE0, 2,
                     jnp.where(b < 0xF0, 3, 4)))
    # distance to the owning lead (0 at leads, 1..3 at continuations)
    cont1 = _shift(is_cont, -1, False)
    cont2 = _shift(is_cont, -2, False)
    ld = jnp.where(is_cont,
                   jnp.where(cont1, jnp.where(cont2, 3, 2), 1), 0)

    # per-char packed word at leads: cls(3) | nl(8) | space(16) | apos(32)
    # | valid-lead(64) | fold << 8
    packed_tab = jnp.asarray(unicode_packed_table())
    pk = packed_tab[cp].astype(jnp.int32)   # the one big-table gather
    cls = pk & 7
    fold = (pk >> 3) & 0x1F
    W = (cls
         | jnp.where((cp == 0x0D) | (cp == 0x0A), 8, 0)
         | jnp.where(cp == 0x20, 16, 0)
         | jnp.where(cp == 0x27, 32, 0)
         | 64
         | (fold << 8))
    W = jnp.where(is_lead, W, 0)

    def bcast(arr, fill=0):
        # value at the owning lead, for every byte of the char
        a1 = _shift(arr, -1, fill)
        a2 = _shift(arr, -2, fill)
        a3 = _shift(arr, -3, fill)
        return jnp.where(ld == 0, arr,
                         jnp.where(ld == 1, a1,
                                   jnp.where(ld == 2, a2, a3)))

    Wb = jnp.where(valid, bcast(W), 0)
    is_l = (Wb & _LETTER) != 0
    is_n = (Wb & _NUMBER) != 0
    is_w = (Wb & _WS) != 0
    is_p = ((Wb & 64) != 0) & ((Wb & 7) == 0)
    is_nl = (Wb & 8) != 0
    is_space = (Wb & 16) != 0
    is_apos = (Wb & 32) != 0
    fold_b = (Wb >> 8) & 0x1F

    g = jnp.where(is_l, 0, jnp.where(is_n, 1, jnp.where(is_w, 2,
                  jnp.where(is_p, 3, 4))))
    change = jnp.concatenate(
        [jnp.ones(1, dtype=bool), g[1:] != g[:-1]]) & is_lead
    chg_next_b = jnp.concatenate(
        [g[:-1] != g[1:], jnp.ones(1, dtype=bool)])   # run-last BYTE

    # scans, all on byte positions (class broadcast makes runs contiguous)
    S = jax.lax.cummax(jnp.where(change, idx, -1))
    u = jax.lax.cummax(jnp.where(~is_nl & valid, idx, -1))
    BIG = jnp.int32(1 << 30)
    f = jax.lax.cummin(jnp.where(is_nl, idx, BIG), reverse=True)
    nxt_change_pos = jax.lax.cummin(
        jnp.where(chg_next_b, idx, BIG), reverse=True)

    chb = bcast(jnp.where(change, 1, 0)) != 0   # per-char change, all bytes

    # previous char = any byte of it = byte i-1 (values are broadcast)
    Wm1 = _shift(Wb, -1, 0)
    p_is_w = (Wm1 & _WS) != 0
    p_is_nl = (Wm1 & 8) != 0
    p_is_p = ((Wm1 & 64) != 0) & ((Wm1 & 7) == 0)
    p_is_space = (Wm1 & 16) != 0
    p_change = _shift(chb, -1, False)

    # char -2 = byte (i - 2 - ld(i-1))
    ldm1 = _shift(ld, -1, 0)

    def at_prev2(arr, fill):
        a2 = _shift(arr, -2, fill)
        a3 = _shift(arr, -3, fill)
        a4 = _shift(arr, -4, fill)
        a5 = _shift(arr, -5, fill)
        return jnp.where(ldm1 == 0, a2, jnp.where(ldm1 == 1, a3,
                         jnp.where(ldm1 == 2, a4, a5)))

    p2_is_space = (at_prev2(Wb, 0) & 16) != 0

    # next char = byte i + clen(i)  (valid at leads)
    def at_next(arr, fill):
        a1 = _shift(arr, 1, fill)
        a2 = _shift(arr, 2, fill)
        a3 = _shift(arr, 3, fill)
        a4 = _shift(arr, 4, fill)
        return jnp.where(clen == 1, a1, jnp.where(clen == 2, a2,
                         jnp.where(clen == 3, a3, a4)))

    g_next = at_next(g, jnp.int32(4))
    change_next = g_next != g
    next_valid = at_next(valid, False)

    # ---- contraction at a free length-1 apostrophe run (apos is 1 byte,
    # but the folded letters can be multi-byte, e.g. U+017F -> 's') ----
    f1 = at_next(fold_b, jnp.int32(0))
    n1_is_l = at_next(is_l, False)
    cl_next = at_next(clen, jnp.int32(1))     # byte length of char i+1
    # char i+2 relative to the apostrophe: byte i + 1 + cl_next

    def at_apos2(arr, fill):
        a2 = _shift(arr, 2, fill)
        a3 = _shift(arr, 3, fill)
        a4 = _shift(arr, 4, fill)
        a5 = _shift(arr, 5, fill)
        return jnp.where(cl_next == 1, a2, jnp.where(cl_next == 2, a3,
                         jnp.where(cl_next == 3, a4, a5)))

    f2 = at_apos2(fold_b, jnp.int32(0))
    has_l2 = at_apos2(is_l, False) & ~at_apos2(chb, True)
    p_free_apos = (is_p & is_apos & change & change_next & ~p_is_space)
    one_letter = (f1 == _F_S) | (f1 == _F_T) | (f1 == _F_M) | (f1 == _F_D)
    two_letter = (((f1 == _F_R) | (f1 == _F_V)) & has_l2 & (f2 == _F_E)) | \
                 ((f1 == _F_L) & has_l2 & (f2 == _F_L))
    contraction = p_free_apos & n1_is_l & (one_letter | two_letter)
    cons1 = contraction & one_letter
    cons2 = contraction & two_letter

    # ---- rule A: number runs split into char-triples ----
    c_ord = jnp.cumsum(is_lead.astype(jnp.int32)) - 1
    cS = jax.lax.cummax(jnp.where(change, c_ord, -1))
    b_num = is_n & (((c_ord - cS) % 3) == 0)

    # ---- rule B: letter-run start ----
    absorbed = ((p_is_w & ~p_is_nl)
                | (p_is_p & p_change & ~p2_is_space))
    b_letter_start = is_l & change & ~((idx > 0) & absorbed)

    # ---- rule C: post-contraction remainder, as a FORWARD push from the
    # apostrophe to the char after the absorbed letter(s) ----
    cb1 = jnp.zeros(L, dtype=bool)
    for k in range(2, 6):                      # 1 + cl_next in 2..5
        cb1 = cb1 | _shift(cons1 & (cl_next == k - 1), -k, False)
    off2 = 1 + cl_next + at_apos2(clen, jnp.int32(1))
    cb2 = jnp.zeros(L, dtype=bool)
    for k in range(3, 10):                     # off2 in 3..9
        cb2 = cb2 | _shift(cons2 & (off2 == k), -k, False)
    b_letter_cont = is_l & ~change & (cb1 | cb2)

    # ---- rule D: punct-run start ----
    b_punct = is_p & change & ~((idx > 0) & p_is_space)

    # ---- rule E: whitespace runs ----
    packed2 = jnp.where(change, idx * 2 + p_is_p.astype(jnp.int32), -1)
    prev_run_is_p = (jax.lax.cummax(packed2) & 1) == 1
    run_continues = ~change
    no_nl_to_end = f > nxt_change_pos
    no_nl_to_end_prev = _shift(f, -1, BIG) > nxt_change_pos
    u_prev = _shift(u, -1, jnp.int32(-1))
    is_entry = is_w & jnp.where(prev_run_is_p,
                                ~is_nl & (u_prev < S), change)
    prev_ge_entry = jnp.where(prev_run_is_p, u_prev >= S, True)
    b_ws_tail = (is_w & run_continues & p_is_nl & prev_ge_entry
                 & no_nl_to_end & ~is_entry)
    b_ws_last = (is_w & change_next & next_valid
                 & run_continues & ~p_is_nl & no_nl_to_end_prev)
    b_ws = is_entry | b_ws_tail | b_ws_last

    return ((b_num | b_letter_start | b_letter_cont | b_punct | b_ws)
            & valid & is_lead)


# --------------------------------------------------------------------- #
# host convenience (testing / fallback)
# --------------------------------------------------------------------- #

@functools.lru_cache(maxsize=32)
def _jitted_boundaries(L: int):
    import jax
    return jax.jit(byte_boundaries)


def _bucket_len(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b <<= 1
    return b


def pretokenize_vec(text: str) -> list[str]:
    """Split text with the vectorized boundary rules (host convenience,
    differential-tested against oracle.pretokenize).  Pads to power-of-two
    buckets so jit compiles once per bucket."""
    import jax.numpy as jnp

    data = text.encode("utf-8")
    if not data:
        return []
    L = _bucket_len(len(data))
    padded = np.zeros(L, dtype=np.uint8)
    padded[:len(data)] = np.frombuffer(data, dtype=np.uint8)
    flags = np.asarray(_jitted_boundaries(L)(jnp.asarray(padded), len(data)))
    starts = np.flatnonzero(flags[:len(data)])
    out = []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(data)
        out.append(data[s:e].decode("utf-8"))
    return out
