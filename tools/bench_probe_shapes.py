"""Microbench: the word-probe row gather and the emission scatter at the
EXACT shapes the compact pipeline uses, across index/layout formulations.

Round-4 motivation: the per-stage profile says the (B, C) word-probe
gather runs at ~39 M rows/s at B=512 — far below the ~157-243 M rows/s
the round-2 row-gather microbenches measured with 1D indices.  Candidate
explanations: 2D index arrays lowering to a slower gather, the C-tier
cond blocking fusion, or table size.  This tool isolates the op.

Variants (word table (S, W) int32, indices (B, C) uniform-random):
  g2d    table[idx]                      -> (B, C, W)
  g1d    table[idx.reshape(-1)].reshape  -> (B, C, W)
  gcols  W width-1 gathers from a flat (S*W,) table at idx*W+k
  scat   emission scatter: BC sources into an N-target buffer
  scat2  same but 2 concatenated source blocks (2BC)

Usage: python tools/bench_probe_shapes.py [--cpu] [B] [C] [W]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROF_REPS", 64))
S = int(os.environ.get("PROBE_TABLE_SIZE", 1 << 18))


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

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(args[0]) if len(args) > 0 else 512
    C = int(args[1]) if len(args) > 1 else 512
    W = int(args[2]) if len(args) > 2 else 4
    R = 2048
    N = B * R

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 20, (S, W), dtype=np.int32))
    tflat = table.reshape(-1)
    idx = jnp.asarray(rng.integers(0, S, (B, C), dtype=np.int32))
    pos = jnp.asarray(rng.permutation(N)[:B * C].astype(np.int32))
    src = jnp.asarray(rng.integers(0, 1 << 20, B * C, dtype=np.int32))

    print(f"platform={jax.devices()[0].platform} B={B} C={C} W={W} S={S} "
          f"reps={REPS}", flush=True)

    def bench(name, fn):
        jfn = jax.jit(fn)
        _ = int(jfn(0))
        best = None
        for _ in range(3):
            t0 = time.time()
            _ = int(jfn(1))
            dt = (time.time() - t0) / REPS
            best = dt if best is None else min(best, dt)
        rows = B * C
        print(f"{name:6s} {best*1e3:7.3f} ms  {rows/best/1e6:8.1f} M rows/s",
              flush=True)

    def loop(body):
        def outer(salt):
            def it(i, acc):
                return acc + body((idx + i + salt) % S)
            return jax.lax.fori_loop(0, REPS, it, jnp.int32(0))
        return outer

    bench("g2d", loop(lambda ix: table[ix].sum(dtype=jnp.int32)))
    bench("g1d", loop(lambda ix: table[ix.reshape(-1)].reshape(
        B, C, W).sum(dtype=jnp.int32)))

    def gcols(ix):
        ixf = ix.reshape(-1)
        acc = jnp.int32(0)
        for k in range(W):
            acc = acc + tflat[ixf * W + k].sum(dtype=jnp.int32)
        return acc
    bench("gcols", loop(gcols))

    def gflat(ix):
        # ONE width-1 gather of all W columns (indices concatenated):
        # per-op overhead amortizes over W*BC rows
        ixf = ix.reshape(-1)
        allix = jnp.concatenate([ixf * W + k for k in range(W)])
        return tflat[allix].sum(dtype=jnp.int32)
    bench("gflat", loop(gflat))

    def grow2(ix):
        # row gather at HALF width from a (2S, W//2) reshape: two rows per
        # logical row, fetched in one gather of 2BC rows
        if W % 2:
            return jnp.int32(0)
        t2 = table.reshape(2 * S, W // 2)
        ixf = ix.reshape(-1)
        allix = jnp.concatenate([ixf * 2, ixf * 2 + 1])
        return t2[allix].sum(dtype=jnp.int32)
    bench("grow2", loop(grow2))

    def scat(salt):
        def it(i, acc):
            dst = (pos + i + salt) % N
            out = jnp.full(N, -1, jnp.int32).at[dst].set(src, mode="drop")
            return acc + out[0] + out[N - 1]
        return jax.lax.fori_loop(0, REPS, it, jnp.int32(0))
    bench("scat", scat)

    def scat2(salt):
        def it(i, acc):
            dst = jnp.concatenate([(pos + i + salt) % N,
                                   (pos + i + salt + 7) % N])
            s2 = jnp.concatenate([src, src])
            out = jnp.full(N, -1, jnp.int32).at[dst].set(s2, mode="drop")
            return acc + out[0] + out[N - 1]
        return jax.lax.fori_loop(0, REPS, it, jnp.int32(0))
    bench("scat2", scat2)


if __name__ == "__main__":
    main()
