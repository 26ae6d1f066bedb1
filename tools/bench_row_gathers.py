"""Microbenchmark: row-gather widths + rate scaling with N (design data for
the word-exact whole-piece probe).

Rules (CLAUDE.md): REPS inside one jit dispatch, iteration-perturbed input,
scalar readback for real synchronization.

  rg1/rg4/rg8/rg16 : (N,) row gathers of width 1/4/8/16 from a 2^20-row table
  scat1            : N-source width-1 int32 scatter into an N buffer
  cummax           : native cummax over N
  shifts           : static-slice shift + or (word assembly proxy)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N = int(os.environ.get("MB_N", 262144))
REPS = int(os.environ.get("MB_REPS", 64))
ROWS = 1 << 20


def main():
    from bench import tpu_healthy
    if "--cpu" in sys.argv or not tpu_healthy():
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, ROWS, size=N, dtype=np.int32))
    tab16 = jnp.asarray(rng.randint(0, 1 << 30, size=(ROWS, 16),
                                    dtype=np.int32))
    tab8 = tab16[:, :8]
    tab4 = tab16[:, :4]
    tab1 = tab16[:, 0]
    vals = jnp.asarray(rng.randint(0, 1 << 30, size=N, dtype=np.int32))

    def repeat(body):
        def run(x):
            def step(i, acc):
                x2 = x + (i & 1).astype(x.dtype)
                return acc + body(x2)
            return jax.lax.fori_loop(0, REPS, step, jnp.int32(0))
        return jax.jit(run)

    cases = {}
    cases["rg1"] = (repeat(lambda i: tab1[i & (ROWS - 1)].sum()), idx)
    cases["rg4"] = (repeat(
        lambda i: tab4[i & (ROWS - 1)].sum(dtype=jnp.int32)), idx)
    cases["rg8"] = (repeat(
        lambda i: tab8[i & (ROWS - 1)].sum(dtype=jnp.int32)), idx)
    cases["rg16"] = (repeat(
        lambda i: tab16[i & (ROWS - 1)].sum(dtype=jnp.int32)), idx)
    cases["scat1"] = (repeat(
        lambda v: jnp.zeros(N, jnp.int32).at[v & (N - 1)].set(v).sum()), vals)

    def shifts(v):
        w = v
        for k in (1, 2, 3):
            w = w | jnp.concatenate([v[k:], jnp.zeros(k, v.dtype)])
        return w.sum()
    cases["shifts"] = (repeat(shifts), vals)
    cases["cummax"] = (repeat(lambda v: jax.lax.cummax(v).sum()), vals)
    cases["cummaxR"] = (repeat(lambda v: jax.lax.cummax(
        v, reverse=True).sum()), vals)
    cases["cumsum"] = (repeat(lambda v: jnp.cumsum(v).sum()), vals)

    # 2D axis-1 scans: rows are independent on row-local geometry (pieces
    # never cross document rows), so no carry is even needed there
    R = 2048
    v2d = vals.reshape(N // R, R)
    cases["cummax2d"] = (repeat(
        lambda v: jax.lax.cummax(v, axis=1).sum()), v2d)
    cases["cumsum2d"] = (repeat(
        lambda v: jnp.cumsum(v, axis=1).sum()), v2d)
    v2ds = vals.reshape(N // 512, 512)
    cases["cummax512"] = (repeat(
        lambda v: jax.lax.cummax(v, axis=1).sum()), v2ds)

    # bounded-window lookback max (window 32 via doubling shifts): replaces
    # a full scan when the quantity is known to live within 32 positions
    def winmax32(v):
        m = v
        for k in (1, 2, 4, 8, 16):
            m = jnp.maximum(m, jnp.concatenate(
                [jnp.full(k, -(1 << 30), m.dtype), m[:-k]]))
        return m.sum()
    cases["winmax32"] = (repeat(winmax32), vals)

    def flip(v):
        return v[::-1].sum() + v.sum()
    cases["flip"] = (repeat(flip), vals)

    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    for name, (fn, arg) in cases.items():
        if only and name not in only:
            continue
        r = int(fn(arg))  # compile+warm
        t0 = time.time()
        r = int(fn(arg))
        dt = time.time() - t0
        rate = N * REPS / dt
        print(f"{name:9s} {rate/1e6:10.1f} M/s  ({dt*1e3/REPS:8.4f} ms/pass"
              f" @ N={N})  [{r}]", flush=True)


if __name__ == "__main__":
    main()
