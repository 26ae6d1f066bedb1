"""Fused merge-round Pallas kernel for the compact-shift BPE merge.

A merge round in the XLA formulation (ops/bpe.py merge_rows_compact) is
~12 dispatches: neighbor take, probe hash chain, cuckoo row gather, the
shift/select update, and the fused min+argmin — each launch-latency-bound
at merge-matrix sizes, making the merge stage ~half the packed kernel's
device time (profiled v5e, round 3).  Here every round is TWO dispatches:

  1. XLA: ``packed[idx]`` — the one cuckoo row gather (dynamic HBM
     indexing stays in XLA; in-kernel table gathers miscompile, CLAUDE.md)
  2. this kernel: hit-compare the gathered rows, apply the merge
     (compact-shift selects), run the fused min+argmin for the NEXT
     round, read the next merge's neighbors via one-hot masked reduces
     (no take_along_axis), and emit the next probe's query values and
     cuckoo slots.

The kernel is its own prologue: called with ``mrank = INF`` and dummy
rows it applies no merge and just computes the first argmin + probe.

Semantics are identical to merge_rows_compact (leftmost-lowest-rank, one
merge per piece per round — parallel local-minimum merging is NOT
order-equivalent, see ops/bpe.py); differentially tested in
tests/test_pallas_merge.py and fuzzed end-to-end.

Mosaic constraints (bisected on v5e, round 3): int32-only, no bool
concatenates, >=2D iota, logical shifts via lax.shift_right_logical.
The int32 hash is bit-identical to the uint32 cuckoo hash in
ops/packed.py probe2.
"""

from __future__ import annotations

import functools
import os

import numpy as np

INF = np.int32(2**31 - 1)
_INT_MIN = np.int32(-2**31 + 1)


def _i32(c: int) -> int:
    c &= 0xFFFFFFFF
    return c - (1 << 32) if c >= (1 << 31) else c


_K1 = _i32(0x9E3779B1)
_K2 = _i32(0x85EBCA77)
_K3 = _i32(0xC2B2AE3D)


def _round_kernel(rank_ref, pr_ref, n_ref, mrank_ref, q_ref, rows_ref,
                  probeq_ref, orank_ref, opr_ref, on_ref, omrank_ref,
                  oq_ref, oidx_ref, oprobeq_ref, *, P: int, lane_bits: int,
                  size_mask: int, seed1: int, seed2: int):
    import jax
    import jax.numpy as jnp

    rank = rank_ref[...]                    # (B2, P)
    pr = pr_ref[...]                        # (B2, P)
    n_seg = n_ref[...]                      # (B2, 1)
    mrank = mrank_ref[...]                  # (B2, 1)
    q = q_ref[...]                          # (B2, 1)
    rows = rows_ref[...]                    # (B2, 16) gathered cuckoo rows
    pq = probeq_ref[...]                    # (B2, 4) [pl1, pr1, pl2, pr2]

    B2 = rank.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B2, P), 1)
    CAP = jnp.int32(1 << 24)
    iINF = jnp.int32(INF)

    do = mrank < iINF                       # (B2, 1)

    # --- hit-compare the gathered rows against the probe queries.  rows
    # columns: [seed1·pair1 | seed1·pair2 | seed2·pair1 | seed2·pair2],
    # each a (left, right, merged, _) quad. ---
    pl1, pr1 = pq[:, 0:1], pq[:, 1:2]
    pl2, pr2 = pq[:, 2:3], pq[:, 3:4]
    v1 = (pl1 >= 0) & (pr1 >= 0)
    v2 = (pl2 >= 0) & (pr2 >= 0)
    h1a = (rows[:, 0:1] == pl1) & (rows[:, 1:2] == pr1)
    h1b = (rows[:, 8:9] == pl1) & (rows[:, 9:10] == pr1)
    h2a = (rows[:, 4:5] == pl2) & (rows[:, 5:6] == pr2)
    h2b = (rows[:, 12:13] == pl2) & (rows[:, 13:14] == pr2)
    new_pl = jnp.where(v1 & h1a, rows[:, 2:3],
                       jnp.where(v1 & h1b, rows[:, 10:11], iINF))
    new_pq = jnp.where(v2 & h2a, rows[:, 6:7],
                       jnp.where(v2 & h2b, rows[:, 14:15], iINF))

    # --- apply the merge at (mrank, q): compact-shift selects ---
    rank_sh = jnp.concatenate(
        [rank[:, 1:], jnp.full((B2, 1), -1, jnp.int32)], axis=1)
    pr_sh = jnp.concatenate(
        [pr[:, 1:], jnp.full((B2, 1), iINF, jnp.int32)], axis=1)
    rank = jnp.where(do,
                     jnp.where(lane < q, rank,
                               jnp.where(lane == q, mrank, rank_sh)),
                     rank)
    pr = jnp.where(do,
                   jnp.where(lane < q - 1, pr,
                             jnp.where(lane == q - 1, new_pl,
                                       jnp.where(lane == q, new_pq, pr_sh))),
                   pr)
    n_seg = n_seg - do.astype(jnp.int32)

    # --- fused min+argmin for the next round ---
    key = jnp.min((jnp.minimum(pr, CAP) << lane_bits) | lane, axis=1,
                  keepdims=True)
    m2 = key >> lane_bits
    q2 = key & ((1 << lane_bits) - 1)
    m2 = jnp.where(m2 >= CAP, iINF, m2)
    do2 = m2 < iINF

    # --- next merge's neighbors via one-hot masked reduces (no gathers) ---
    leftv = jnp.max(jnp.where(lane == q2 - 1, rank, jnp.int32(_INT_MIN)),
                    axis=1, keepdims=True)
    rightv = jnp.max(jnp.where(lane == q2 + 2, rank, jnp.int32(_INT_MIN)),
                     axis=1, keepdims=True)
    left_ok = do2 & (q2 >= 1)
    right_ok = do2 & (q2 + 2 < n_seg)
    npl1 = jnp.where(left_ok, leftv, -1)
    npr1 = jnp.where(do2, m2, -1)
    npl2 = npr1
    npr2 = jnp.where(right_ok, rightv, -1)

    # --- cuckoo slots for the next probe (int32, bit-identical to the
    # uint32 hash in packed.probe2) ---
    lsr = jax.lax.shift_right_logical

    def slot(left, right, seed):
        h = ((left * jnp.int32(_K1)) ^ (right * jnp.int32(_K2))
             ^ jnp.int32(_i32(seed)))
        h = h ^ lsr(h, 15)
        h = h * jnp.int32(_K3)
        h = h ^ lsr(h, 13)
        return h & jnp.int32(size_mask)

    oidx_ref[...] = jnp.concatenate(
        [slot(npl1, npr1, seed1), slot(npl2, npr2, seed1),
         slot(npl1, npr1, seed2), slot(npl2, npr2, seed2)], axis=1)
    oprobeq_ref[...] = jnp.concatenate([npl1, npr1, npl2, npr2], axis=1)
    orank_ref[...] = rank
    opr_ref[...] = pr
    on_ref[...] = n_seg
    omrank_ref[...] = m2
    oq_ref[...] = q2


@functools.lru_cache(maxsize=32)
def _round_fn(B2: int, P: int, size_mask: int, seed1: int, seed2: int,
              interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    lane_bits = max(1, (P - 1).bit_length())
    assert 25 + lane_bits <= 31, P
    # Row-blocked grid: Mosaic pads every block's minor dim to 128 lanes,
    # so a (B2, 8) block really occupies B2 x 128 lanes in VMEM, and the
    # SCOPED vmem limit for a kernel's stack is 16 MB (measured round 3:
    # RB=2048 at tier 16384 OOM'd scoped vmem at 28.21M/16M; grid-step
    # overhead is per-byte-constant, so big blocks buy little anyway).
    # 512-row blocks keep each step ~7 MB incl. padding.
    RB = min(B2, int(os.environ.get("TEKKEN_TPU_MERGE_RB", "512")))
    # grid=(B2 // RB,) floor-divides: RB MUST divide B2 or trailing rows
    # would silently never be written (ADVICE r3).  Round down to a
    # divisor (every tier size is a multiple of 64, so this terminates
    # quickly; RB=1 always divides).
    while B2 % RB:
        RB >>= 1
    shapes = [(B2, P), (B2, P), (B2, 1), (B2, 1), (B2, 1), (B2, 4), (B2, 4)]
    blocks = [(RB, P), (RB, P), (RB, 1), (RB, 1), (RB, 1), (RB, 4), (RB, 4)]
    return pl.pallas_call(
        functools.partial(_round_kernel, P=P, lane_bits=lane_bits,
                          size_mask=size_mask, seed1=seed1, seed2=seed2),
        grid=(B2 // RB,),
        in_specs=[pl.BlockSpec(b, lambda i: (i, 0))
                  for b in blocks[:5]] + [
            pl.BlockSpec((RB, 16), lambda i: (i, 0)),
            pl.BlockSpec((RB, 4), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec(b, lambda i: (i, 0)) for b in blocks],
        out_shape=[jax.ShapeDtypeStruct(s, jnp.int32) for s in shapes],
        interpret=interpret,
    )


def merge_rows_compact_fused(rank, pr, n_seg, packed_table, seed1: int,
                             seed2: int, fixed_rounds: int | None = None):
    """Drop-in replacement for bpe.merge_rows_compact with the fused
    round kernel: 2 dispatches per round instead of ~12."""
    import jax
    import jax.numpy as jnp

    B2, P = rank.shape
    interpret = jax.default_backend() == "cpu"
    kern = _round_fn(B2, P, packed_table.shape[0] - 1, seed1, seed2,
                     interpret)

    n2 = n_seg.reshape(B2, 1)
    inf_col = jnp.full((B2, 1), INF, jnp.int32)
    zero_col = jnp.zeros((B2, 1), jnp.int32)
    dummy_rows = jnp.zeros((B2, 16), jnp.int32)
    neg_pq = jnp.full((B2, 4), -1, jnp.int32)

    # prologue: no merge applied (mrank = INF); computes the first
    # argmin and the first probe's queries/slots
    state = kern(rank, pr, n2, inf_col, zero_col, dummy_rows, neg_pq)

    def body(state):
        rank, pr, n2, mrank, q, idx, pq = state
        rows = packed_table[idx.reshape(-1)].reshape(B2, 16)
        return kern(rank, pr, n2, mrank, q, rows, pq)

    if fixed_rounds is not None:
        for _ in range(fixed_rounds):
            state = body(state)
    else:
        state = jax.lax.while_loop(
            lambda s: jnp.any(s[3] < INF), body, state)
    return state[0], state[2].reshape(B2)
