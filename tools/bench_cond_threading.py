"""Microbench: what does a lax.cond COST when a large buffer is threaded
through it (carried into the branches and returned)?

Round-4 motivation: the per-stage profile charges +1.6 ms to the P23 tier
and +2.2 ms to merge buckets that are EMPTY on the bench corpus.  Both
structures are nested lax.cond tiers that carry the (N,) token stream in
and out of every branch.  If XLA materializes copies (or just pays
dispatch latency) per cond level, the tier machinery costs more than the
work it saves.  This tool measures, at bench shapes:

  base    one unconditional small scatter into an (N,) buffer
  cond1   the same scatter behind ONE taken lax.cond threading (N,)
  cond4   behind FOUR nested conds (innermost taken), like a 4-tier chain
  cskip   four nested conds, OUTERMOST short-circuits (empty-bucket shape)
  csmall  four nested conds threading only the small (T,) arrays, with
          one unconditional final scatter into (N,) (the candidate fix)

Usage: python tools/bench_cond_threading.py [--cpu] [B] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROF_REPS", 64))


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
    B = int(args[0]) if len(args) > 0 else 128
    T = int(args[1]) if len(args) > 1 else 4096
    R = 2048
    N = B * R

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.permutation(N)[:T].astype(np.int32))
    src = jnp.asarray(rng.integers(0, 1 << 20, T, dtype=np.int32))

    print(f"platform={jax.devices()[0].platform} B={B} T={T} N={N} "
          f"reps={REPS}", flush=True)

    def scatter(t, salt):
        return t.at[(pos + salt) % N].set(src, mode="drop")

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
        print(f"{name:7s} {best*1e3:7.3f} ms", flush=True)

    bench("base", scatter)

    def cond1(t, salt):
        return jax.lax.cond(salt >= 0, lambda x: scatter(x, salt),
                            lambda x: x, t)
    bench("cond1", cond1)

    def cond4(t, salt):
        f = lambda x: scatter(x, salt)                     # noqa: E731
        for lvl in range(4):
            f = (lambda inner, lvl: lambda x: jax.lax.cond(
                salt >= -lvl, inner, lambda y: y, x))(f, lvl)
        return f(t)
    bench("cond4", cond4)

    def cskip(t, salt):
        f = lambda x: scatter(x, salt)                     # noqa: E731
        for lvl in range(4):
            f = (lambda inner, lvl: lambda x: jax.lax.cond(
                salt < -lvl, inner, lambda y: y, x))(f, lvl)
        return f(t)                                        # nothing taken
    bench("cskip", cskip)

    def csmall(t, salt):
        # conds produce only the (T,) dst/src; one unconditional scatter
        def leaf(_):
            return (pos + salt) % N, src
        f = leaf
        for lvl in range(4):
            f = (lambda inner, lvl: lambda x: jax.lax.cond(
                salt >= -lvl, inner,
                lambda y: (jnp.full(T, N, jnp.int32),
                           jnp.zeros(T, jnp.int32)), x))(f, lvl)
        d, s = f(0)
        return t.at[d].set(s, mode="drop")
    bench("csmall", csmall)


if __name__ == "__main__":
    main()
