"""How do cumsum / N-source scatter / row gather scale with N on v5e?

Round-3 stage profile: the matrix-scatter stage (2 N-cumsums + 1 N-source
scatter + small gather) cost 1.8 ms at N=256K but 20.3 ms at N=1M —
superlinear by ~2.8x.  This isolates which primitive degrades.

Usage: python tools/bench_scatter_scaling.py   (live TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tekken_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    REPS = int(os.environ.get("AB_REPS", 64))
    print(f"platform={jax.devices()[0].platform} reps={REPS}", flush=True)

    rng = np.random.default_rng(0)
    cases = {}
    for N in (1 << 18, 1 << 20, 1 << 21):
        NT = max(64, N // 16)
        mark = (rng.random(N) < 0.05)
        vals = rng.integers(0, 1 << 20, N, dtype=np.int32)
        jv = jnp.asarray(vals)
        jm = jnp.asarray(mark)

        def cumsum_fn(v, m, N=N):
            def body(i, acc):
                c = jnp.cumsum((m & (v > i)).astype(jnp.int32))
                return acc + c[-1] + c[N // 2]
            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

        def scat_fn(v, m, N=N, NT=NT):
            idx = jnp.arange(N, dtype=jnp.int32)

            def body(i, acc):
                mk = m & (v > i)
                ids = jnp.cumsum(mk.astype(jnp.int32)) - 1
                tgt = jnp.where(mk & (ids < NT), ids, NT)
                w = jnp.zeros(NT, jnp.int32).at[tgt].set(
                    (idx << 1) | 1, mode="drop")
                return acc + w.sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

        def scat_only_fn(v, m, N=N, NT=NT):
            # scatter with PRECOMPUTED targets (no cumsum in the loop body
            # beyond a cheap perturb) — isolates the scatter op
            ids0 = jnp.cumsum(m.astype(jnp.int32)) - 1
            tgt0 = jnp.where(m & (ids0 < NT), ids0, NT)
            idx = jnp.arange(N, dtype=jnp.int32)

            def body(i, acc):
                w = jnp.zeros(NT, jnp.int32).at[tgt0].set(
                    (idx << 1) | (i & 1), mode="drop")
                return acc + w.sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

        def rg8_fn(v, m, N=N):
            tab = jnp.asarray(
                rng.integers(0, 1 << 20, (1 << 18, 8), dtype=np.int32))

            def body(i, acc):
                slot = (v + i) & ((1 << 18) - 1)
                r = tab[slot]
                return acc + r[:, 0].sum() + r[:, 7].sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

        cases[N] = {"cumsum": jax.jit(cumsum_fn), "cumsum+scat": jax.jit(scat_fn),
                    "scat-only": jax.jit(scat_only_fn), "rg8": jax.jit(rg8_fn)}
        for name, fn in cases[N].items():
            _ = int(fn(jv, jm))  # compile+warm
            t0 = time.time()
            _ = int(fn(jv, jm))
            dt = (time.time() - t0) / REPS
            print(f"N={N:8d} {name:12s} {dt*1e3:7.3f} ms "
                  f"({N/dt/1e6:8.1f} M elems/s)", flush=True)


if __name__ == "__main__":
    main()
