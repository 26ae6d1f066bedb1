"""Per-stage device timing of the packed encode kernel.

Builds the exact bench setup, then times cumulative prefixes of the
pipeline, each jitted with an internal fori_loop repeat (carry-threaded to
defeat CSE) and synchronized by a scalar readback — the only reliable
timing method through the axon tunnel (see CLAUDE.md).

Usage: python tools/profile_packed_stages.py [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPS = int(os.environ.get("PROF_REPS", 4))


def build_setup():
    import random

    from bench import build_bench_vocab, build_corpus, tpu_healthy

    if "--cpu" in sys.argv or not tpu_healthy():
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    rng = random.Random(1234)
    words = ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                     for _ in range(rng.randint(2, 11)))
             for _ in range(40_000)]
    from tekken_tpu import Tekkenizer, TokenizerVersion
    from tekken_tpu.special_tokens import get_deprecated_special_tokens

    vocab = build_bench_vocab(words)
    tok = Tekkenizer(
        vocab=vocab, special_tokens=get_deprecated_special_tokens(),
        pattern=".*", vocab_size=len(vocab) + 1000,
        num_special_tokens=1000, version=TokenizerVersion.V7)
    B, R = int(os.environ.get("BENCH_ROWS", 128)), 2048
    from tekken_tpu.ops.packed import PackedEncoder
    enc = PackedEncoder(tok, rows=B, row_len=R, np_cap=B * R // 8)
    docs = build_corpus(words, rng, n_docs=B, doc_len=R)
    buf, lengths = enc.pack(docs)
    return enc, buf, lengths, sum(len(d.encode()) for d in docs)


def staged_fns(enc):
    """Return list of (name, fn(buf, lengths) -> scalar) cumulative stages."""
    import jax
    import jax.numpy as jnp

    from tekken_tpu.ops.bpe import INF, merge_rows_compact
    from tekken_tpu.ops.flat import _seg_first
    from tekken_tpu.ops.packed import P_LANES, whole_piece_lookup
    from tekken_tpu.ops.pretokenize import byte_boundaries

    packed_table = enc._packed
    dense_tab = enc._dense
    piece_slots = enc._piece_slots
    token_words = enc._token_words
    seed1, seed2 = enc._seed1, enc._seed2
    basis, probes = enc._piece_basis, enc._piece_probes
    NP = enc._np_cap

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
        pstart = _seg_first(idx, boundary)
        offset = idx - pstart
        boundary_next = jnp.concatenate([boundary[1:],
                                         jnp.ones(1, dtype=bool)])
        is_last = (boundary_next | ~jnp.concatenate(
            [valid[1:], jnp.zeros(1, dtype=bool)])) & valid
        plen_val = jnp.where(is_last, offset + 1, 0)
        plen = _seg_first(plen_val[::-1], is_last[::-1])[::-1]
        plen = jnp.where(valid, plen, 0)
        mergeable = valid & (plen >= 2)
        is_pstart = boundary & valid
        mp_mark = is_pstart & mergeable
        mp_id_at_start = jnp.cumsum(mp_mark.astype(jnp.int32)) - 1
        mp_id = _seg_first(jnp.where(mp_mark, mp_id_at_start, -1), boundary)
        if upto == 1:
            return mp_id.sum() + plen.sum()

        in_matrix = mergeable & (offset < P_LANES) & (mp_id < NP)
        fb_piece = mergeable & ((plen > P_LANES) | (mp_id >= NP))
        nxt_rank = jnp.concatenate([byte_rank[1:],
                                    jnp.full(1, -1, jnp.int32)])
        same_piece = jnp.concatenate([boundary[1:] == False,  # noqa: E712
                                      jnp.zeros(1, dtype=bool)]) & valid
        q_ok = same_piece & mergeable & (nxt_rank >= 0)
        dense_idx = jnp.where(q_ok, byte_rank * 256 + nxt_rank, 0)
        flat_pr = jnp.where(q_ok, dense_tab[dense_idx], INF)
        if upto == 2:
            return (flat_pr == INF).astype(jnp.int32).sum()

        ok = in_matrix & ~fb_piece
        tgt_row = jnp.where(ok, mp_id, NP)
        tgt = (tgt_row, jnp.where(ok, offset, 0))
        ranks0 = jnp.full((NP, P_LANES), -1, jnp.int32).at[tgt].set(
            byte_rank, mode="drop")
        pr0 = jnp.full((NP, P_LANES), INF, jnp.int32).at[tgt].set(
            flat_pr, mode="drop")
        start0 = jnp.full((NP,), -1, jnp.int32).at[
            jnp.where(mp_mark & ~fb_piece, mp_id, NP)].set(
            pstart, mode="drop")
        nseg0 = jnp.full((NP,), 0, jnp.int32).at[
            jnp.where(mp_mark & ~fb_piece, mp_id, NP)].set(
            plen, mode="drop")
        if upto == 3:
            return ranks0.sum() + pr0.sum() + start0.sum() + nseg0.sum()

        whole = whole_piece_lookup(ranks0, nseg0, piece_slots, token_words,
                                   basis, probes)
        hit = whole >= 0
        lane0 = jnp.arange(P_LANES, dtype=jnp.int32)[None, :] == 0
        ranks1 = jnp.where(hit[:, None] & lane0, whole[:, None],
                           jnp.where(hit[:, None], -1, ranks0))
        pr1 = jnp.where(hit[:, None], INF, pr0)
        nseg1 = jnp.where(hit, 1, nseg0)
        if upto == 4:
            return ranks1.sum() + pr1.sum() + nseg1.sum()

        pos = jnp.arange(P_LANES, dtype=jnp.int32)[None, :]
        rank, n_seg = merge_rows_compact(ranks1, pr1, nseg1, packed_table,
                                         seed1, seed2)
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
        has_tok = tok_flat >= 0
        order = jnp.cumsum(has_tok.astype(jnp.int32)) - 1
        sidx = jnp.where(has_tok, order, N)
        out = jnp.full(N, -1, jnp.int32).at[sidx].set(tok_flat, mode="drop")
        n_out = jnp.sum(has_tok.astype(jnp.int32))
        return out.sum() + n_out

    fns = []
    names = ["boundaries", "+scans(pstart/plen/mpid)", "+dense-pair-probe",
             "+scatter-matrices", "+whole-piece", "+merge-loop",
             "+final-scatter"]
    for k, name in enumerate(names):
        def make(k):
            def run(byts, lengths):
                def body(i, carry):
                    acc, byts = carry
                    b2 = byts.at[0, 0].set(
                        (byts[0, 0].astype(jnp.int32) + i % 1)
                        .astype(byts.dtype))
                    return acc + pipeline(b2, lengths, k), byts
                acc, _ = jax.lax.fori_loop(
                    0, REPS, body,
                    (jnp.int32(0), byts))
                return acc
            return jax.jit(run)
        fns.append((name, make(k)))
    return fns


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    enc, buf, lengths, nbytes = build_setup()
    jbuf = jax.numpy.asarray(buf)
    jlen = jax.numpy.asarray(lengths)
    print(f"platform={jax.devices()[0].platform} bytes/iter={nbytes} "
          f"reps={REPS}", flush=True)
    prev = 0.0
    for name, fn in staged_fns(enc):
        _ = int(fn(jbuf, jlen))  # compile+warm
        t0 = time.time()
        _ = int(fn(jbuf, jlen))
        dt = (time.time() - t0) / REPS
        print(f"{name:28s} cum {dt * 1e3:8.2f} ms  "
              f"delta {(dt - prev) * 1e3:8.2f} ms  "
              f"({nbytes / dt / 1e6:7.1f} MB/s cum)", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
