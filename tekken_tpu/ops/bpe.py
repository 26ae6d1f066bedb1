"""BPE merge kernel: per-piece argmin merging, vmapped over piece lanes.

North star: "sequential merge loop -> parallel pair-rank argmin scan; HashMap
rank lookup -> hash-in-HBM gather".

Exactness note (why not merge many pairs per piece per round): parallel
"local minimum" merging — merge every pair whose rank is below both
neighbors' — is NOT equivalent to the reference's lowest-rank-first order for
valid BPE vocabularies.  Counterexample: vocab {a,b,c,d bytes, "ab":300,
"cd":260, "bcd":290} on piece "abcd": sequential merges cd(260) then
b+cd(290) -> [a, bcd]; local-minimum merging fuses (a,b) and (c,d)
simultaneously -> [ab, cd].  Merging is only order-free across *pieces*, so
the exact data-parallel unit is: one lowest-rank merge per piece per round,
with every piece in the batch advancing simultaneously (argmin over lanes +
two hash probes per piece per round).  Pieces are padded into
(batch, piece_len) buckets; rounds = max merges in the bucket, with a
while_loop early exit.

Pair lookups gather from the PairTable (vocab.py) replicated in HBM:
linear-probe open addressing with exact (left,right) key compare, probe
depth bounded by the table's max chain (static unrolled loop).
"""

from __future__ import annotations

import functools

import numpy as np

INF = np.int32(2**31 - 1)

# mixing constants — must match vocab.pair_hash
_HC1, _HC2, _HC3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D


def probe_pairs(left, right, key_left, key_right, values, max_probes: int):
    """Vectorized pair-table probe.

    left/right: int32[...], rank pairs (negative = invalid query).
    Returns merged rank int32[...] or INF where absent/invalid.
    """
    import jax.numpy as jnp

    size = key_left.shape[0]
    mask = jnp.uint32(size - 1)

    l = left.astype(jnp.uint32)
    r = right.astype(jnp.uint32)
    h = (l * jnp.uint32(_HC1)) ^ (r * jnp.uint32(_HC2))
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(_HC3)
    h = h ^ (h >> jnp.uint32(13))
    slot = (h & mask).astype(jnp.int32)

    found = jnp.full(left.shape, INF, dtype=jnp.int32)
    done = jnp.zeros(left.shape, dtype=bool)
    for _ in range(max_probes):
        kl = key_left[slot]
        kr = key_right[slot]
        hit = (kl == left) & (kr == right)
        empty = kl < 0
        found = jnp.where(~done & hit, values[slot], found)
        done = done | hit | empty
        slot = (slot + 1) & jnp.int32(size - 1)

    valid = (left >= 0) & (right >= 0)
    return jnp.where(valid, found, INF)


def make_merge_bucket(P: int, max_probes: int):
    """Build a jitted merge function for bucket width P."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=())
    def merge(ranks0, lengths, key_left, key_right, values):
        B = ranks0.shape[0]
        pos = jnp.arange(P, dtype=jnp.int32)[None, :]
        alive0 = pos < lengths[:, None]

        rank = jnp.where(alive0, ranks0, -1)
        nxt = jnp.broadcast_to(pos + 1, (B, P)).astype(jnp.int32)
        prv = jnp.broadcast_to(pos - 1, (B, P)).astype(jnp.int32)
        alive = alive0

        left = rank
        right = jnp.concatenate(
            [rank[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1)
        pr = probe_pairs(left, right, key_left, key_right, values, max_probes)
        pr = jnp.where(pos + 1 < lengths[:, None], pr, INF)

        def gather_row(arr, i, fill):
            ok = (i >= 0) & (i < P)
            v = jnp.take_along_axis(arr, jnp.clip(i, 0, P - 1)[:, None],
                                    axis=1)[:, 0]
            return jnp.where(ok, v, fill)

        def cond(state):
            return jnp.any(jnp.min(state[1], axis=1) < INF)

        def body(state):
            rank, pr, nxt, prv, alive = state
            m = jnp.argmin(pr, axis=1).astype(jnp.int32)   # leftmost min
            mrank = jnp.take_along_axis(pr, m[:, None], axis=1)[:, 0]
            do = mrank < INF

            j = gather_row(nxt, m, P)
            nj = gather_row(nxt, j, P)

            at_m = do[:, None] & (pos == m[:, None])
            at_j = do[:, None] & (pos == j[:, None])

            rank = jnp.where(at_m, mrank[:, None], rank)
            alive = alive & ~at_j
            nxt = jnp.where(at_m, nj[:, None], nxt)
            prv = jnp.where((do & (nj < P))[:, None] & (pos == nj[:, None]),
                            m[:, None], prv)
            pr = jnp.where(at_j, INF, pr)

            r_nj = gather_row(rank, nj, -1)
            new_pm = probe_pairs(jnp.where(do, mrank, -1), r_nj,
                                 key_left, key_right, values, max_probes)
            pr = jnp.where(at_m, new_pm[:, None], pr)

            pm = gather_row(prv, m, -1)
            r_pm = jnp.where(gather_row(alive, pm, False),
                             gather_row(rank, pm, -1), -1)
            new_pp = probe_pairs(r_pm, jnp.where(do, mrank, -1),
                                 key_left, key_right, values, max_probes)
            pr = jnp.where((do & (pm >= 0))[:, None] & (pos == pm[:, None]),
                           new_pp[:, None], pr)

            return rank, pr, nxt, prv, alive

        rank, pr, nxt, prv, alive = jax.lax.while_loop(
            cond, body, (rank, pr, nxt, prv, alive))

        # left-align surviving ranks; -1 padding
        order = jnp.cumsum(alive.astype(jnp.int32), axis=1) - 1
        out = jnp.full((B, P), -1, dtype=jnp.int32)
        scatter_idx = jnp.where(alive, order, P)
        out = out.at[jnp.arange(B)[:, None], scatter_idx].set(
            jnp.where(alive, rank, -1), mode="drop")
        n_out = jnp.sum(alive.astype(jnp.int32), axis=1)
        return out, n_out

    return merge


@functools.lru_cache(maxsize=16)
def merge_bucket_fn(P: int, max_probes: int):
    return make_merge_bucket(P, max_probes)


def merge_rows_compact(rank, pr, n_seg, packed_table, seed1: int, seed2: int,
                       fixed_rounds: int | None = None):
    """Per-row argmin BPE merge in a compact-shift layout.

    rank: (B, P) segment ranks, left-aligned (-1 pad); pr: (B, P) pair ranks
    (pr[:, i] pairs segment i with i+1; INF where absent); n_seg: (B,).
    Each round merges the lowest-rank pair in every row simultaneously and
    closes the gap with a lane shift (pure selects — no pointer arrays, no
    scatters; the only gathers are two neighbor reads and two cuckoo
    probes).  Returns (rank, n_seg) with results still left-aligned.

    ``fixed_rounds``: statically unroll exactly that many rounds instead of
    a while_loop — a P-lane piece can merge at most P-1 times, and the
    unrolled form drops the per-round any() reduction/sync (used for the
    P=8 short bucket, whose bound is 7).
    """
    import jax
    import jax.numpy as jnp

    from .packed import probe2

    B, P = rank.shape
    lane = jnp.arange(P, dtype=jnp.int32)[None, :]

    # The min_lane key below treats any rank >= 2^24 as ABSENT, so a pair
    # table holding such ranks would silently drop merges.  The invariant
    # is enforced where tables are built (vocab.CuckooPairTable.build);
    # re-check it here for tables reaching this kernel by any other path.
    # numpy inputs only: under jit (argument OR closure capture) the table
    # is traced and the build-time guard is the active one (ADVICE r2).
    import numpy as _np
    if isinstance(packed_table, _np.ndarray):
        mx = int(packed_table[:, 2].max(initial=0))
        assert mx < (1 << 24), f"pair-table rank {mx} >= 2^24 unsupported"

    # min+argmin fused into ONE reduction: key = min(pr, CAP)*P' + lane.
    # Real merged ranks are < 2^24 (vocab ranks; asserted at table build),
    # INF clips to CAP (=> do=False), and ties break to the lowest lane —
    # exactly the reference's leftmost-lowest-rank order.  Rounds are
    # launch-latency-bound, so dropping the second reduction matters.
    CAP = jnp.int32(1 << 24)
    lane_bits = max(1, (P - 1).bit_length())
    # the fused key must fit int32: min(pr,CAP)<<lane_bits | lane uses
    # 25+lane_bits bits, so P >= 64 would overflow into the sign bit and
    # produce wrong merges (ADVICE r2) — current buckets are P=8/32
    assert 25 + lane_bits <= 31, f"P={P} overflows the fused min+argmin key"

    def min_lane(pr):
        key = jnp.min((jnp.minimum(pr, CAP) << lane_bits) | lane, axis=1)
        mrank = key >> lane_bits
        q = key & ((1 << lane_bits) - 1)
        return jnp.where(mrank >= CAP, INF, mrank), q

    # (mrank, q) ride the loop state so the while cond re-uses the body's
    # reduction instead of running its own min over pr every round
    def cond(state):
        return jnp.any(state[3] < INF)

    def body(state):
        rank, pr, n_seg, mrank, q = state
        do = mrank < INF
        qb = q[:, None]

        # both neighbor segments in ONE take (gathers dominate round cost)
        nb_idx = jnp.stack([jnp.clip(q - 1, 0, P - 1),
                            jnp.clip(q + 2, 0, P - 1)], axis=1)
        nb = jnp.take_along_axis(rank, nb_idx, axis=1)
        left = jnp.where(q >= 1, nb[:, 0], -1)
        right2 = jnp.where(q + 2 < P, nb[:, 1], -1)

        n_new = n_seg - do.astype(jnp.int32)
        right_ok = do & (q + 2 < n_seg)
        left_ok = do & (q >= 1)

        # both new pair probes in ONE stacked probe2 (2 row-gathers, not 4)
        B2 = rank.shape[0]
        pl = jnp.concatenate([jnp.where(left_ok, left, -1),
                              jnp.where(do, mrank, -1)])
        pr_in = jnp.concatenate([jnp.where(do, mrank, -1),
                                 jnp.where(right_ok, right2, -1)])
        both = probe2(pl, pr_in, packed_table, seed1, seed2)
        new_pl = both[:B2]
        new_pq = both[B2:]

        rank_sh = jnp.concatenate(
            [rank[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1)
        pr_sh = jnp.concatenate(
            [pr[:, 1:], jnp.full((B, 1), INF, jnp.int32)], axis=1)

        rank = jnp.where(do[:, None],
                         jnp.where(lane < qb, rank,
                                   jnp.where(lane == qb, mrank[:, None],
                                             rank_sh)),
                         rank)
        pr = jnp.where(do[:, None],
                       jnp.where(lane < qb - 1, pr,
                                 jnp.where(lane == qb - 1, new_pl[:, None],
                                           jnp.where(lane == qb,
                                                     new_pq[:, None],
                                                     pr_sh))),
                       pr)
        m2, q2 = min_lane(pr)
        return rank, pr, n_new, m2, q2

    m0, q0 = min_lane(pr)
    if fixed_rounds is not None:
        state = (rank, pr, n_seg, m0, q0)
        for _ in range(fixed_rounds):
            state = body(state)   # finished rows no-op via the do mask
        rank, pr, n_seg = state[:3]
    else:
        rank, pr, n_seg = jax.lax.while_loop(
            cond, body, (rank, pr, n_seg, m0, q0))[:3]
    return rank, n_seg
