"""Microbenchmark: table-lookup strategies on TPU for the encode pipeline.

Times (one jitted dispatch each, REPS inside the jit, scalar readback):
  g256    : N-gather from a 256-entry uint8->int32 table
  mxu256  : same lookup as one-hot int8 matmul on the MXU
  g64k    : N-gather from a 65536-entry table (dense byte-pair)
  mxu2    : same via two-step one-hot (onehot(l) @ T256x256, then row-dot)
  g1m     : N-gather from a 1.1M-entry table (unicode cls)
  scat    : N-scatter into an N buffer
  shiftg  : byts[idx+1] via clip-gather (current nxt(k))
  shiftsl : byts[idx+1] via static slice + pad
  cumsum  : jnp.cumsum over N int32
  segscan : associative_scan (seg_first) over N
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N = int(os.environ.get("MB_N", 262144))
REPS = int(os.environ.get("MB_REPS", 16))


def main():
    from bench import tpu_healthy
    if "--cpu" in sys.argv or not tpu_healthy():
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    byts = jnp.asarray(rng.randint(0, 256, size=N, dtype=np.uint8))
    t256 = jnp.asarray(rng.randint(0, 127, size=256, dtype=np.int32))
    t64k = jnp.asarray(rng.randint(0, 1 << 30, size=65536, dtype=np.int32))
    t1m = jnp.asarray(rng.randint(0, 127, size=0x110000, dtype=np.int32))
    cps = jnp.asarray(rng.randint(0, 0x110000, size=N, dtype=np.int32))
    lr = jnp.asarray(rng.randint(0, 256, size=(2, N), dtype=np.int32))

    def repeat(body):
        def run(x):
            def step(i, acc):
                # genuinely iteration-dependent input: defeats CSE AND
                # while-loop invariant code motion (i % 1 would fold to 0
                # and let XLA hoist the body out of the loop)
                x2 = x + (i & 1).astype(x.dtype)
                return acc + body(x2)
            return jax.lax.fori_loop(0, REPS, step, jnp.int32(0))
        return jax.jit(run)

    cases = {}

    cases["g256"] = (repeat(lambda b: t256[b.astype(jnp.int32)].sum()), byts)

    def mxu256(b):
        oh = (b[:, None] == jnp.arange(256, dtype=jnp.uint8)[None, :]
              ).astype(jnp.bfloat16)
        return (oh @ t256.astype(jnp.bfloat16)).astype(jnp.int32).sum()
    cases["mxu256"] = (repeat(mxu256), byts)

    cases["g64k"] = (repeat(
        lambda p: t64k[(p[0] * 256 + p[1])].sum()), lr)

    t2d = t64k.reshape(256, 256).astype(jnp.bfloat16)

    def mxu2(p):
        ohl = (p[0][:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]
               ).astype(jnp.bfloat16)
        rows = ohl @ t2d                       # (N, 256)
        ohr = (p[1][:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]
               ).astype(jnp.bfloat16)
        return (rows * ohr).sum(axis=1).astype(jnp.int32).sum()
    cases["mxu2"] = (repeat(mxu2), lr)

    cases["g1m"] = (repeat(lambda c: t1m[c].sum()), cps)

    def scat(b):
        i = b.astype(jnp.int32) * 1021 % N
        return jnp.zeros(N, jnp.int32).at[i].set(
            b.astype(jnp.int32), mode="drop").sum()
    cases["scat"] = (repeat(scat), byts)

    def scat2(b):
        v = b.astype(jnp.int32)
        i = v * 1021 % N
        return jnp.zeros((N, 2), jnp.int32).at[i].set(
            jnp.stack([v, v + 1], axis=1), mode="drop").sum()
    cases["scat2"] = (repeat(scat2), byts)

    def scat4(b):
        v = b.astype(jnp.int32)
        i = v * 1021 % N
        return jnp.zeros((N, 4), jnp.int32).at[i].set(
            jnp.stack([v, v + 1, v + 2, v + 3], axis=1), mode="drop").sum()
    cases["scat4"] = (repeat(scat4), byts)

    def stack2(b):
        v = b.astype(jnp.int32)
        return jnp.stack([v, v + 1], axis=1).sum()
    cases["stack2"] = (repeat(stack2), byts)

    def scat1x2(b):
        v = b.astype(jnp.int32)
        i = v * 1021 % N
        a = jnp.zeros(N, jnp.int32).at[i].set(v, mode="drop")
        c = jnp.zeros(N, jnp.int32).at[i].set(v + 1, mode="drop")
        return a.sum() + c.sum()
    cases["scat1x2"] = (repeat(scat1x2), byts)

    idx = jnp.arange(N, dtype=jnp.int32)
    cases["shiftg"] = (repeat(
        lambda b: b[jnp.clip(idx + 1, 0, N - 1)].astype(jnp.int32).sum()),
        byts)
    cases["shiftsl"] = (repeat(
        lambda b: jnp.concatenate(
            [b[1:], jnp.zeros(1, b.dtype)]).astype(jnp.int32).sum()), byts)
    cases["cumsum"] = (repeat(
        lambda b: jnp.cumsum(b.astype(jnp.int32)).sum()), byts)

    def segscan(b):
        v = b.astype(jnp.int32)
        r = (v & 7) == 0

        def comb(a, c):
            va, ra = a
            vc, rc = c
            return jnp.where(rc, vc, va), ra | rc
        out, _ = jax.lax.associative_scan(comb, (v, r))
        return out.sum()
    cases["segscan"] = (repeat(segscan), byts)

    print(f"platform={jax.devices()[0].platform} N={N} reps={REPS}",
          flush=True)
    for name, (fn, arg) in cases.items():
        _ = int(fn(arg))  # compile+warm
        t0 = time.time()
        _ = int(fn(arg))
        dt = (time.time() - t0) / REPS
        print(f"{name:8s} {dt * 1e6:9.1f} us  ({N / dt / 1e6:8.1f} M elems/s)",
              flush=True)


if __name__ == "__main__":
    main()
