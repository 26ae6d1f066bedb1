"""Microbench: the P23 tier (2-3-byte miss resolution) in ISOLATION.

Round-4 motivation: the per-stage profile charges ~10 ms per 1 MB batch
to the P23 stage at B=512 (tier 16384), ~5x the op-model estimate
(7T gather rows + one 3T scatter ~= 2 ms).  This tool rebuilds the exact
structure on synthetic tables and bisects:

  full    5-tier cond ladder + n23==0 cond, exact run23 body
  tier1   single static tier (no conds), same body
  gath    the three gathers only (byte triple, dense, cuckoo), no scatter
  scat    the un-scatter only
  probe   the cuckoo probe2 gather only

Usage: python tools/bench_p23_isolated.py [--cpu] [B] [T] [n23]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROF_REPS", 64))
INF = 2**31 - 1


def main():
    from bench import tpu_healthy

    if "--cpu" in sys.argv or not tpu_healthy():
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tekken_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from tekken_tpu.ops.packed import probe2

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(args[0]) if len(args) > 0 else 512
    TIER = int(args[1]) if len(args) > 1 else 16384
    n23 = int(args[2]) if len(args) > 2 else 12302
    R = 2048
    N = B * R
    NP3 = N // 16

    rng = np.random.default_rng(0)
    byte_rank = jnp.asarray(rng.integers(0, 256, N, dtype=np.int32))
    dense_tab = jnp.asarray(rng.integers(0, 1 << 20, 65536, dtype=np.int32))
    packed = jnp.asarray(rng.integers(0, 1 << 20, (1 << 20, 4),
                                      dtype=np.int32))
    # w23: n23 live rows packing random byte positions + is3 flags
    w23_np = np.zeros(NP3, np.int32)
    posr = rng.permutation(N - 4)[:n23].astype(np.int32)
    is3 = (rng.random(n23) < 0.5).astype(np.int32)
    w23_np[:n23] = (posr << 2) | (is3 << 1) | 1
    w23 = jnp.asarray(w23_np)
    seed1, seed2 = 0x12345, 0x6789B

    print(f"platform={jax.devices()[0].platform} B={B} tier={TIER} "
          f"n23={n23} reps={REPS}", flush=True)

    def run23_body(t, wv, salt):
        T = wv.shape[0]
        livev = (wv & 1) == 1
        pr = jnp.where(livev, jax.lax.shift_right_logical(wv, 2), -1)
        pr = jnp.where(livev, (pr + salt) % (N - 4), -1)
        is3v = livev & ((wv & 2) != 0)
        pc = jnp.clip(pr, 0, N - 1)
        bs = byte_rank[jnp.concatenate(
            [pc, jnp.clip(pc + 1, 0, N - 1), jnp.clip(pc + 2, 0, N - 1)])]
        b0, b1, b2 = bs[:T], bs[T:2 * T], bs[2 * T:]
        q1ok = livev & (b0 >= 0) & (b1 >= 0)
        q2ok = is3v & (b2 >= 0)
        didx = jnp.concatenate([jnp.where(q1ok, b0 * 256 + b1, 0),
                                jnp.where(q2ok, b1 * 256 + b2, 0)])
        dd = dense_tab[didx]
        p1 = jnp.where(q1ok, dd[:T], INF)
        p2 = jnp.where(q2ok, dd[T:], INF)
        any3 = is3v & ((p1 < INF) | (p2 < INF))
        first = p1 <= p2
        ql = jnp.where(any3, jnp.where(first, p1, b0), -1)
        qr = jnp.where(any3, jnp.where(first, b2, p2), -1)
        m = probe2(ql, qr, packed, seed1, seed2)
        hitp = m < INF
        two = livev & ~is3v
        t0 = jnp.where(
            two, jnp.where(p1 < INF, p1, b0),
            jnp.where(is3v, jnp.where(
                any3, jnp.where(hitp, m, jnp.where(first, p1, b0)), b0), -1))
        t1 = jnp.where(
            two & (p1 >= INF), b1,
            jnp.where(is3v & any3 & ~hitp & ~first, p2,
                      jnp.where(is3v & ~any3, b1, -1)))
        t2 = jnp.where(is3v & ((any3 & ~hitp & first) | ~any3), b2, -1)
        src = jnp.concatenate([t0, t1, t2])
        dst = jnp.concatenate([pr, pr + 1, pr + 2])
        ok = (src >= 0) & (jnp.concatenate([pr, pr, pr]) >= 0)
        return t.at[jnp.where(ok, dst, N)].set(src, mode="drop")

    def bench(name, body):
        @jax.jit
        def outer(salt):
            def it(i, acc):
                t = jnp.full(N, -1, jnp.int32)
                t = body(t, i + salt)
                return acc + t[0] + t[N - 1]
            return jax.lax.fori_loop(0, REPS, it, jnp.int32(0))
        _ = int(outer(0))
        best = None
        for _ in range(3):
            t0 = time.time()
            _ = int(outer(1))
            dt = (time.time() - t0) / REPS
            best = dt if best is None else min(best, dt)
        print(f"{name:6s} {best*1e3:7.3f} ms", flush=True)

    n23j = jnp.int32(n23)

    def full(t, salt):
        tiers = sorted({64, max(64, NP3 // 64), max(64, NP3 // 16),
                        max(64, NP3 // 4), NP3})
        br = lambda tt: run23_body(tt, w23[:tiers[-1]], salt)  # noqa: E731
        for T in reversed(tiers[:-1]):
            br = (lambda small, big, T: lambda tt: jax.lax.cond(
                n23j <= T, small, big, tt))(
                    (lambda T: lambda tt: run23_body(
                        tt, w23[:T], salt))(T), br, T)
        return jax.lax.cond(n23j == 0, lambda tt: tt, br, t)
    bench("full", full)

    def benchsum(name, body):
        @jax.jit
        def outer(salt):
            def it(i, acc):
                t = jnp.full(N, -1, jnp.int32)
                t = body(t, i + salt)
                return acc + t.sum()
            return jax.lax.fori_loop(0, REPS, it, jnp.int32(0))
        _ = int(outer(0))
        best = None
        for _ in range(3):
            t0 = time.time()
            _ = int(outer(1))
            dt = (time.time() - t0) / REPS
            best = dt if best is None else min(best, dt)
        print(f"{name:6s} {best*1e3:7.3f} ms", flush=True)

    # full ladder but with the kernel's FULL-ARRAY checksum (stage cuts
    # reduce tok.sum(), not two elements)
    benchsum("fsum", full)

    # closest in-situ shape: t is a LIVE scatter result (emission-like,
    # BC sources) threaded through the ladder, full-sum reduced
    BC = N // 5
    epos = jnp.asarray(rng.permutation(N)[:BC].astype(np.int32))
    esrc = jnp.asarray(rng.integers(0, 1 << 20, BC, dtype=np.int32))

    def chain_body(t, salt):
        t = t.at[(epos + salt) % N].set(esrc, mode="drop")
        return full(t, salt)
    benchsum("chain", chain_body)

    bench("tier1", lambda t, salt: run23_body(t, w23[:TIER], salt))

    def gath(t, salt):
        wv = w23[:TIER]
        T = TIER
        livev = (wv & 1) == 1
        pr = jnp.where(livev, jax.lax.shift_right_logical(wv, 2), -1)
        pr = jnp.where(livev, (pr + salt) % (N - 4), -1)
        is3v = livev & ((wv & 2) != 0)
        pc = jnp.clip(pr, 0, N - 1)
        bs = byte_rank[jnp.concatenate(
            [pc, jnp.clip(pc + 1, 0, N - 1), jnp.clip(pc + 2, 0, N - 1)])]
        b0, b1, b2 = bs[:T], bs[T:2 * T], bs[2 * T:]
        dd = dense_tab[jnp.concatenate(
            [jnp.where(livev, b0 * 256 + b1, 0),
             jnp.where(is3v, b1 * 256 + b2, 0)])]
        m = probe2(jnp.where(is3v, dd[:T], -1),
                   jnp.where(is3v, b2, -1), packed, seed1, seed2)
        return t.at[0].set(m.sum() + dd.sum() + bs.sum())
    bench("gath", gath)

    def scat(t, salt):
        wv = w23[:TIER]
        livev = (wv & 1) == 1
        pr = jnp.where(livev, jax.lax.shift_right_logical(wv, 2), -1)
        pr = jnp.where(livev, (pr + salt) % (N - 4), -1)
        src = jnp.concatenate([wv, wv, wv])
        dst = jnp.concatenate([pr, pr + 1, pr + 2])
        ok = jnp.concatenate([pr, pr, pr]) >= 0
        return t.at[jnp.where(ok, dst, N)].set(src, mode="drop")
    bench("scat", scat)

    def probe_only(t, salt):
        wv = w23[:TIER]
        livev = (wv & 1) == 1
        pr = jnp.where(livev, jax.lax.shift_right_logical(wv, 2), -1)
        m = probe2((pr + salt) & 0xFFFF, pr & 0xFFFF, packed, seed1, seed2)
        return t.at[0].set(m.sum())
    bench("probe", probe_only)


if __name__ == "__main__":
    main()
