"""One-off: compare matrix-build scatter strategies at the packed kernel's
exact shapes (N=262144 source rows, ~6% land, target NP*P=524288 rows)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N = 262144
NPP = 524288
REPS = int(os.environ.get("MB_REPS", 256))


def main():
    from bench import tpu_healthy
    if "--cpu" in sys.argv or not tpu_healthy():
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    # ~6% of source rows land; rest dropped
    land = rng.rand(N) < 0.06
    tgt_np = np.where(land, rng.randint(0, NPP, N), NPP).astype(np.int32)
    tgt0 = jnp.asarray(tgt_np)
    v_np = rng.randint(0, 1 << 20, (N, 4)).astype(np.int32)
    vals4 = jnp.asarray(v_np)
    INF = jnp.int32(2**31 - 1)

    def repeat(body):
        def run(t):
            def step(i, acc):
                t2 = jnp.where(t < NPP, t ^ (i & 1), t)
                return acc + body(t2)
            return jax.lax.fori_loop(0, REPS, step, jnp.int32(0))
        return jax.jit(run)

    init4 = jnp.broadcast_to(
        jnp.array([-1, INF, -1, 0], jnp.int32)[None, :], (NPP, 4))

    def v4(t):
        m = init4.at[t].set(vals4, mode="drop")
        m = m.reshape(NPP // 32, 32, 4)
        return (m[:, :, 0].sum() + m[:, :, 1].sum() + m[:, 0, 2].sum()
                + m[:, 0, 3].sum())

    def v1x4(t):
        a = jnp.full(NPP, -1, jnp.int32).at[t].set(vals4[:, 0], mode="drop")
        b = jnp.full(NPP, INF, jnp.int32).at[t].set(vals4[:, 1], mode="drop")
        c = jnp.full(NPP, -1, jnp.int32).at[t].set(vals4[:, 2], mode="drop")
        d = jnp.zeros(NPP, jnp.int32).at[t].set(vals4[:, 3], mode="drop")
        c = c.reshape(NPP // 32, 32)[:, 0]
        d = d.reshape(NPP // 32, 32)[:, 0]
        return a.sum() + b.sum() + c.sum() + d.sum()

    def v4_col0(t):
        m = init4.at[t].set(vals4, mode="drop")
        return m.reshape(NPP // 32, 32, 4)[:, :, 0].sum()

    def v1_col0(t):
        a = jnp.full(NPP, -1, jnp.int32).at[t].set(vals4[:, 0], mode="drop")
        return a.sum()

    cases = [("v4 (one width-4)", v4), ("v1x4 (four width-1)", v1x4),
             ("v4-col0", v4_col0), ("v1-col0", v1_col0)]
    print(f"platform={jax.devices()[0].platform} reps={REPS}", flush=True)
    for name, body in cases:
        fn = repeat(body)
        _ = int(fn(tgt0))
        t0 = time.time()
        _ = int(fn(tgt0))
        dt = (time.time() - t0) / REPS
        print(f"{name:22s} {dt * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
