"""Fine-grained stage timing of the packed kernel (inline copy of
ops/packed.py's pipeline, cut at increasing depths).  A profiling tool —
if ops/packed.py changes, re-sync before trusting the numbers.

Each stage: one jitted dispatch, REPS in-jit reps (input perturbed per
iteration; letters stay letters), checksum readback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPS = int(os.environ.get("PROF_REPS", 64))


def main():
    from profile_packed_stages import build_setup

    import jax
    import jax.numpy as jnp

    from tekken_tpu.ops.bpe import INF, merge_rows_compact
    from tekken_tpu.ops.packed import (P_LANES, whole_piece_lookup)
    from tekken_tpu.ops.pretokenize import byte_boundaries

    enc, buf, lengths, nbytes = build_setup()
    jbuf = jnp.asarray(buf)
    jlen = jnp.asarray(lengths)
    NP = enc._np_cap
    print(f"platform={jax.devices()[0].platform} bytes/iter={nbytes} "
          f"reps={REPS} np_cap={NP}", flush=True)

    def pipeline(byts, lengths, upto):
        B, R = byts.shape
        N = B * R
        row_bound = jax.vmap(byte_boundaries)(byts, lengths)
        boundary = row_bound.reshape(N)
        if upto == 0:
            return boundary.astype(jnp.int32).sum()

        idx = jnp.arange(N, dtype=jnp.int32)
        valid = (idx % R) < lengths[idx // R]
        byte_rank = jnp.where(valid, byts.reshape(N).astype(jnp.int32), -1)
        pstart = jax.lax.cummax(jnp.where(boundary, idx, -1))
        offset = idx - pstart
        boundary_next = jnp.concatenate([boundary[1:],
                                         jnp.ones(1, dtype=bool)])
        is_last = (boundary_next | ~jnp.concatenate(
            [valid[1:], jnp.zeros(1, dtype=bool)])) & valid
        BIGN = jnp.int32(1 << 30)
        last_pos = jax.lax.cummin(jnp.where(is_last, idx, BIGN)[::-1])[::-1]
        plen = jnp.where(valid, last_pos - pstart + 1, 0)
        mergeable = valid & (plen >= 2)
        is_pstart = boundary & valid
        mp_mark = is_pstart & mergeable
        mp_id_at_start = jnp.cumsum(mp_mark.astype(jnp.int32)) - 1
        mp_id = jax.lax.cummax(jnp.where(mp_mark, mp_id_at_start, -1))
        n_mp = jnp.sum(mp_mark.astype(jnp.int32))
        if upto == 1:
            return mp_id.sum() + plen.sum() + n_mp

        in_matrix = mergeable & (offset < P_LANES) & (mp_id < NP)
        fb_piece = mergeable & ((plen > P_LANES) | (mp_id >= NP))
        nxt_rank = jnp.concatenate([byte_rank[1:],
                                    jnp.full(1, -1, jnp.int32)])
        same_piece = jnp.concatenate([boundary[1:] == False,  # noqa: E712
                                      jnp.zeros(1, dtype=bool)]) & valid
        q_ok = same_piece & mergeable & (nxt_rank >= 0)
        dense_idx = jnp.where(q_ok, byte_rank * 256 + nxt_rank, 0)
        flat_pr = jnp.where(q_ok, enc._dense[dense_idx], INF)
        if upto == 2:
            return (flat_pr == INF).astype(jnp.int32).sum()

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
        if upto == 3:
            return (ranks0.sum() + pr0.sum() + start0.sum() + nseg0.sum()
                    + fb_start.sum() + fb_len.sum())

        whole = whole_piece_lookup(ranks0, nseg0, enc._piece_packed,
                                   enc._token_words, enc._piece_k,
                                   enc._pseed1, enc._pseed2)
        hit = whole >= 0
        lane0 = jnp.arange(P_LANES, dtype=jnp.int32)[None, :] == 0
        ranks0 = jnp.where(hit[:, None] & lane0, whole[:, None],
                           jnp.where(hit[:, None], -1, ranks0))
        pr0 = jnp.where(hit[:, None], INF, pr0)
        nseg0 = jnp.where(hit, 1, nseg0)
        if upto == 4:
            return ranks0.sum() + pr0.sum() + nseg0.sum()

        pos = jnp.arange(P_LANES, dtype=jnp.int32)[None, :]
        rank, n_seg = merge_rows_compact(ranks0, pr0, nseg0, enc._packed,
                                         enc._seed1, enc._seed2)
        if upto == 5:
            return rank.sum() + n_seg.sum()

        tok_flat = jnp.full(N, -1, jnp.int32)
        single = is_pstart & (plen == 1)
        tok_flat = jnp.where(single, byte_rank, tok_flat)
        lane_byte_pos = start0[:, None] + pos
        lane_ok = (pos < n_seg[:, None]) & (start0[:, None] >= 0)
        tok_flat = tok_flat.at[
            jnp.where(lane_ok, lane_byte_pos, N)].set(
            jnp.where(lane_ok, rank, -1), mode="drop")
        if upto == 6:
            return tok_flat.sum()

        has_tok = tok_flat >= 0
        order = jnp.cumsum(has_tok.astype(jnp.int32)) - 1
        sidx = jnp.where(has_tok, order, N)
        op = jnp.full((N, 2), -1, jnp.int32).at[sidx].set(
            jnp.stack([tok_flat, idx], axis=1), mode="drop")
        n_out = jnp.sum(has_tok.astype(jnp.int32))
        return op.sum() + n_out + fb_start.sum() + fb_len.sum() + n_mp

    names = ["boundaries", "+scans", "+dense-probe", "+scatter-matrices",
             "+whole-piece", "+merge-loop", "+lane-scatter", "+final-pack"]

    prev = 0.0
    for k, name in enumerate(names):
        def make(k):
            def run(byts, lengths):
                def body(i, acc):
                    b2 = jnp.where(byts == 0x61,
                                   (0x61 + (i & 1)).astype(byts.dtype), byts)
                    return acc + pipeline(b2, lengths, k)
                return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))
            return jax.jit(run)
        fn = make(k)
        _ = int(fn(jbuf, jlen))
        t0 = time.time()
        _ = int(fn(jbuf, jlen))
        dt = (time.time() - t0) / REPS
        print(f"{name:20s} cum {dt * 1e3:7.2f} ms  delta {(dt - prev) * 1e3:7.2f} ms"
              f"  ({nbytes / dt / 1e6:7.1f} MB/s cum)", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
