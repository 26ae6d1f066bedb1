"""Device timing of the packed encode kernel (bench setup, real code).

Measures, each as one jitted dispatch with REPS in-jit repetitions (inputs
perturbed per iteration to defeat CSE and while-loop invariant code motion)
and a scalar readback:
  boundaries : the vectorized pretokenizer alone
  full       : packed_encode_impl end to end (checksums of all outputs)

Per-op attribution comes from tools/bench_lookup_primitives.py.

Usage: python tools/profile_packed_stages.py [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROF_REPS", 64))


def build_setup():
    import random

    from bench import build_bench_vocab, build_corpus, tpu_healthy

    if "--cpu" in sys.argv or (
            "--force-tpu" not in sys.argv and not tpu_healthy()):
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
    enc = PackedEncoder(tok, rows=B, row_len=R,
                        np_cap=B * R // 16)
    docs = build_corpus(words, rng, n_docs=B, doc_len=R)
    buf, lengths = enc.pack(docs)
    return enc, buf, lengths, sum(len(d.encode()) for d in docs)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tekken_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    enc, buf, lengths, nbytes = build_setup()
    jbuf = jnp.asarray(buf)
    jlen = jnp.asarray(lengths)
    print(f"platform={jax.devices()[0].platform} bytes/iter={nbytes} "
          f"reps={REPS}", flush=True)

    from tekken_tpu.ops.packed import packed_encode_impl
    from tekken_tpu.ops.pretokenize import byte_boundaries

    def perturb(lengths, i):
        # vary lengths by one byte: defeats CSE/loop-invariant code motion
        # while preserving the work profile (same corpus, same hit rates)
        return lengths - (i & 1)

    @jax.jit
    def run_boundaries(byts, lengths):
        def body(i, acc):
            l2 = perturb(lengths, i)
            rb = jax.vmap(byte_boundaries)(byts, l2)
            return acc + rb.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    from tekken_tpu.ops.packed import host_route
    route = None if os.environ.get("PROF_DEVICE_ROUTE") else host_route(buf)
    print(f"route={route}", flush=True)

    def make_stage(stage):
        @jax.jit
        def run(byts, lengths):
            def body(i, acc):
                l2 = perturb(lengths, i)
                r = packed_encode_impl(
                    byts, l2, enc._packed, enc._dense, enc._word_rows,
                    enc._seed1, enc._seed2, wseed=enc._wseed,
                    np_cap=enc._np_cap, route=route, _stage=stage)
                if stage is None:
                    tok, n_out, fb_s, fb_l, overflow, row_bad = r
                    r = (tok.sum() + n_out
                         + fb_s.sum() + fb_l.sum() + overflow
                         + row_bad.sum())
                return acc + r
            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))
        return run

    # PROF_STAGES: comma list from {bnd,1,2,3,4,5,full} to bound compile
    # time per run (each merge-bearing stage compiles ~minutes on the
    # tunnel); default all
    sel = os.environ.get("PROF_STAGES", "bnd,1,2,3,4,5,full").split(",")
    cases = []
    if "bnd" in sel:
        cases.append(("boundaries", run_boundaries))
    stage_names = {1: "scans", 2: "+content-words", 3: "+word-probe",
                   35: "+token-base", 4: "+matrix-scatter",
                   42: "+p3-probe", 45: "+short-merge",
                   5: "+merge+unscatter", None: "full"}
    for st in [1, 2, 3, 35, 4, 42, 45, 5, None]:
        if ("full" if st is None else str(st)) in sel:
            cases.append((stage_names[st], make_stage(st)))

    prev = 0.0
    for name, fn in cases:
        _ = int(fn(jbuf, jlen))  # compile+warm
        t0 = time.time()
        _ = int(fn(jbuf, jlen))
        dt = (time.time() - t0) / REPS
        print(f"{name:16s} {dt * 1e3:8.2f} ms/iter  delta "
              f"{(dt - prev) * 1e3:7.2f}  ({nbytes / dt / 1e6:8.1f} MB/s)",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
