"""Interleaved A/B of packed-kernel variants in ONE process/session.

Cross-session tunnel variance is +-25% (CLAUDE.md), so config comparisons
are only valid interleaved in the same session: compile every variant,
then time them round-robin with the in-jit REPS loop, 3 samples each.

Usage: python tools/bench_ab.py  (live TPU; ~10-20 min first compile)
Env: AB_REPS (default 32), AB_SAMPLES (default 3), BENCH_ROWS (128).
"""

import functools as ft
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tekken_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from tools.profile_packed_stages import build_setup
    enc, buf, lengths, nbytes = build_setup()
    jbuf, jlen = jnp.asarray(buf), jnp.asarray(lengths)
    REPS = int(os.environ.get("AB_REPS", 32))
    SAMPLES = int(os.environ.get("AB_SAMPLES", 3))
    print(f"platform={jax.devices()[0].platform} bytes={nbytes} "
          f"reps={REPS}", flush=True)

    from tekken_tpu.ops.packed import host_route, packed_encode_impl
    route = host_route(buf)

    def make(pallas: str, r):
        def outer(byts, lens):
            os.environ["TEKKEN_TPU_PALLAS"] = pallas

            def body(i, acc):
                o = packed_encode_impl(
                    byts, lens - (i & 1), enc._packed, enc._dense,
                    enc._word_rows, enc._seed1, enc._seed2,
                    wseed=enc._wseed, np_cap=enc._np_cap, route=r)
                return acc + o[1]
            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))
        return jax.jit(outer)

    variants = {
        "pallas+route": make("1", route),
        "pallas+devroute": make("1", None),
    }
    for name, fn in variants.items():
        t0 = time.time()
        n = int(fn(jbuf, jlen))
        print(f"compiled {name} in {time.time()-t0:.1f}s (n={n})",
              flush=True)

    results = {k: [] for k in variants}
    for s in range(SAMPLES):
        for name, fn in variants.items():
            t0 = time.time()
            _ = int(fn(jbuf, jlen))
            dt = (time.time() - t0) / REPS
            results[name].append(nbytes / dt / 1e6)
            print(f"sample {s} {name:14s} {nbytes/dt/1e6:7.1f} MB/s",
                  flush=True)
    print("---")
    for name, v in results.items():
        print(f"{name:14s} mean {sum(v)/len(v):7.1f}  "
              f"min {min(v):7.1f}  max {max(v):7.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
