"""Interleaved batch-size sweep of the packed kernel in ONE session.

Hypothesis (round-3): the merge stage is launch-latency-bound (a fixed
~4-5 ms of dispatches per batch regardless of size), so throughput should
rise sharply with batch bytes until the element-bound ops (word-probe row
gather ~243 M rows/s, the one N-source scatter ~300 M/s) dominate.

Cross-session tunnel variance is +-25% (CLAUDE.md), so sizes are compiled
once and timed round-robin in the same session, 3+ samples each.

Usage: python tools/bench_batchscale.py          (live TPU)
Env: AB_REPS (default 16), AB_SAMPLES (default 3),
     AB_SIZES (default "128,512,1024" document rows at R=2048).
"""

import functools as ft
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import random

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tekken_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from bench import build_bench_vocab, build_corpus, tpu_healthy

    if "--cpu" in sys.argv or (
            "--force-tpu" not in sys.argv and not tpu_healthy()):
        os.environ["JAX_PLATFORMS"] = "cpu"
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

    from tekken_tpu.ops.packed import PackedEncoder, packed_encode_impl

    R = 2048
    REPS = int(os.environ.get("AB_REPS", 16))
    SAMPLES = int(os.environ.get("AB_SAMPLES", 3))
    sizes = [int(s) for s in
             os.environ.get("AB_SIZES", "128,512,1024").split(",")]
    print(f"platform={jax.devices()[0].platform} R={R} reps={REPS} "
          f"sizes={sizes}", flush=True)

    from tekken_tpu.ops.packed import host_route

    variants = {}
    for B in sizes:
        enc = PackedEncoder(tok, rows=B, row_len=R, np_cap=B * R // 16)
        docs = build_corpus(words, rng, n_docs=B, doc_len=R)
        buf, lengths = enc.pack(docs)
        nbytes = sum(len(d.encode()) for d in docs)
        route = host_route(buf)

        def outer(byts, lens, enc=enc, route=route):
            def body(i, acc):
                o = packed_encode_impl(
                    byts, lens - (i & 1), enc._packed, enc._dense,
                    enc._word_rows, enc._seed1, enc._seed2,
                    wseed=enc._wseed, np_cap=enc._np_cap, route=route)
                return acc + o[1]
            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

        variants[B] = (jax.jit(outer), jnp.asarray(buf),
                       jnp.asarray(lengths), nbytes)

    for B, (fn, jbuf, jlen, nbytes) in variants.items():
        t0 = time.time()
        n = int(fn(jbuf, jlen))
        print(f"compiled B={B} ({nbytes} bytes) in {time.time()-t0:.1f}s "
              f"(n={n})", flush=True)

    results = {B: [] for B in variants}
    for s in range(SAMPLES):
        for B, (fn, jbuf, jlen, nbytes) in variants.items():
            t0 = time.time()
            _ = int(fn(jbuf, jlen))
            dt = (time.time() - t0) / REPS
            results[B].append(nbytes / dt / 1e6)
            print(f"sample {s} B={B:5d} {nbytes/dt/1e6:7.1f} MB/s "
                  f"({dt*1e3:.2f} ms/iter)", flush=True)
    print("---")
    for B, v in results.items():
        print(f"B={B:5d} mean {sum(v)/len(v):7.1f}  min {min(v):7.1f}  "
              f"max {max(v):7.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
