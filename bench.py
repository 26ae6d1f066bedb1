"""Throughput benchmark: device encode bytes/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bytes/s", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
1 GB/s/chip (the reference publishes no numbers of its own — BASELINE.md).

The bench vocabulary is synthetic at real V7 scale (130,872 inner ranks,
byte tokens + prefix-chain merge trees over the corpus word list), so merge
cascades behave like worst-case natural text (every word fully merges,
depth = word length).  Parity of every benchmarked batch is spot-checked
against the scalar oracle.
"""

import base64
import json
import os
import random
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

TARGET = 1e9  # bytes/s north-star


def tpu_healthy(timeout_s: int | None = None) -> bool:
    """Probe the TPU tunnel in a subprocess (it can wedge and hang any jax
    call indefinitely); fall back to CPU when unhealthy.

    IMPORTANT: a probe that hangs is ABANDONED, not killed — killing a
    client mid-RPC corrupts the shared tunnel session for everyone (the
    observed wedge mode).  The orphan finishes on its own later.
    """
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    if timeout_s is None:
        timeout_s = int(os.environ.get("TEKKEN_PROBE_TIMEOUT_S", 450))
    import time as _time
    code = ("import jax.numpy as jnp, numpy as np;"
            "np.asarray(jnp.ones(8)*2); print('ok')")
    try:
        p = subprocess.Popen([sys.executable, "-c", code],
                             stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL,
                             start_new_session=True, text=True)
    except OSError:
        return False
    deadline = _time.time() + timeout_s
    while _time.time() < deadline:
        if p.poll() is not None:
            out = p.stdout.read() if p.stdout else ""
            return "ok" in out
        _time.sleep(2)
    return False  # leave the probe running; do NOT kill it


def build_bench_vocab(words, inner_vocab=130_872):
    """Byte tokens + prefix-chain tokens for corpus words (valid BPE merge
    trees: each token splits into (prefix, last-byte)).  Both bare and
    space-prefixed word chains are included, like real byte-level BPE
    vocabularies, so whole-piece hit rates are representative."""
    from tekken_tpu.config import TokenInfo

    tokens: list[bytes] = [bytes([i]) for i in range(256)]
    seen = set(tokens)
    full = False
    for w in words:
        for b in (b" " + w.encode("utf-8"), w.encode("utf-8")):
            for k in range(2, len(b) + 1):
                t = b[:k]
                if t not in seen:
                    seen.add(t)
                    tokens.append(t)
                if len(tokens) >= inner_vocab:
                    full = True
                    break
            if full:
                break
        if full:
            break
    return [
        TokenInfo(rank=r, token_bytes=base64.b64encode(t).decode(),
                  token_str=None)
        for r, t in enumerate(tokens)
    ]


def build_corpus(words, rng, n_docs, doc_len):
    docs = []
    for _ in range(n_docs):
        parts = []
        size = 0
        while size < doc_len - 16:
            w = words[min(int(rng.paretovariate(1.1)) - 1, len(words) - 1)]
            parts.append(w)
            size += len(w) + 1
            if rng.random() < 0.1:
                parts.append(str(rng.randint(0, 999)))
                size += 4
            if rng.random() < 0.15:
                parts[-1] += rng.choice(".,!?;:")
        docs.append(" ".join(parts)[:doc_len])
    return docs


def main():
    platform_note = "tpu"
    # the tunnel has intermittent multi-minute stalls: give it two chances
    if not (tpu_healthy() or tpu_healthy()):
        sys.stderr.write("[bench] TPU tunnel unhealthy — falling back to "
                         "CPU device path\n")
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        platform_note = "cpu-fallback"

    # persistent local compile cache: kernel variants survive process
    # restarts (the axon backend's remote compile of a new variant can take
    # minutes; repeats are instant)
    import jax as _jax
    try:
        _jax.config.update("jax_compilation_cache_dir",
                           os.path.expanduser("~/.cache/tekken_jax"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    rng = random.Random(1234)
    words = ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                     for _ in range(rng.randint(2, 11)))
             for _ in range(40_000)]

    t0 = time.time()
    from tekken_tpu import Tekkenizer, TokenizerVersion
    from tekken_tpu.special_tokens import get_deprecated_special_tokens
    from tekken_tpu.oracle import encode_ranks

    vocab = build_bench_vocab(words)
    tok = Tekkenizer(
        vocab=vocab,
        special_tokens=get_deprecated_special_tokens(),
        pattern=".*",
        vocab_size=len(vocab) + 1000,
        num_special_tokens=1000,
        version=TokenizerVersion.V7,
    )
    sys.stderr.write(f"[bench] vocab {len(vocab)} built in "
                     f"{time.time()-t0:.1f}s; cuckoo pair table...\n")
    t1 = time.time()
    table = tok.cuckoo_table()
    sys.stderr.write(f"[bench] cuckoo table: {table.num_pairs} pairs, size "
                     f"{table.size} ({time.time()-t1:.1f}s)\n")

    # np_cap counts vocab misses (~bytes/80 on this corpus) — N/16 leaves
    # a wide margin, asserted after warmup.  B=4096 (8 MB batches): the
    # row-gather rate itself rises with batch, and the post-gather-fix
    # interleaved sweep (tools/bench_batchscale.py) measured 104.9 /
    # 119.5 / 146.2 MB/s at B=1024/2048/4096 — serving batches this size
    # are realistic for corpus tokenization, and compile time is tracked
    # in compile_seconds (the route sweep below stays at 1024 rows to
    # bound it).
    B, R = int(os.environ.get("BENCH_ROWS", 4096)), 2048
    docs = build_corpus(words, rng, n_docs=B, doc_len=R)
    batch_bytes = sum(len(d.encode("utf-8")) for d in docs)

    # --- device path, guarded: ANY device failure (compile, Mosaic,
    # tunnel) degrades to the next variant; the JSON line always prints
    # (VERDICT.md round-2 weak #7: an unguarded device call handed the
    # driver rc=1 and no number at all). ---
    bps = bps_dispatched = None
    out = None
    device_error = None
    compile_s = {}
    try:
        from tekken_tpu.ops.packed import PackedEncoder, packed_encode_fn
        enc = PackedEncoder(tok, rows=B, row_len=R, np_cap=B * R // 16)

        # parity spot check on a small prefix batch
        got = enc.encode_batch(docs[:2])
        for d, g in zip(docs[:2], got):
            want = encode_ranks(d, tok.ranks)
            assert g == want, "parity failure in bench batch"

        import jax
        import jax.numpy as jnp
        buf, lengths = enc.pack(docs)
        from tekken_tpu.ops.packed import host_route
        route = host_route(buf)   # static routing: +44% at B>=512 vs the
        # device cond chain (see ops/packed.py encode_batch)
        fn = packed_encode_fn(enc._seed1, enc._seed2, enc._np_cap,
                              enc._wseed, False, route)  # device-merge
        tables = (enc._packed, enc._dense, enc._word_rows)
        jbuf = jnp.asarray(buf)
        jlen = jnp.asarray(lengths)

        # warmup / compile (int() readback = real synchronization; the axon
        # tunnel's block_until_ready does not reliably block)
        t2 = time.time()
        out = fn(jbuf, jlen, *tables)
        n0 = int(out[1])
        compile_s["encode_warmup"] = round(time.time() - t2, 1)
        assert int(out[4]) == 0, (
            "bench batch overflows device merge capacity; the measured run "
            "would be incomplete")
        sys.stderr.write(f"[bench] compile+warmup {time.time()-t2:.1f}s on "
                         f"{jax.devices()[0].platform}; n_out {n0}\n")
        # full parity of the device token stream, once, untimed (fb spans
        # — vocab misses past the device-merge length limit — are host-
        # spliced exactly as PackedEncoder.encode_batch does)
        from tekken_tpu.ops.packed import oracle_merge_fn, splice_host_merges
        st = np.asarray(out[0])
        pos0 = np.flatnonzero(st >= 0).astype(np.int64)
        got_ranks, got_pos = splice_host_merges(
            st[pos0], pos0, buf.reshape(-1), np.asarray(out[2]),
            np.asarray(out[3]), oracle_merge_fn(tok.ranks))
        want = []
        for d in docs:
            want.extend(encode_ranks(d, tok.ranks))
        assert got_ranks.tolist() == want, "device stream != oracle"
        sys.stderr.write("[bench] full-batch parity of the device stream "
                         "OK\n")

        # the measured loop: pure device encode, tokens device-resident
        # (the production serving shape — tokens feed a model on device).
        # The headline repeats the kernel INSIDE one jit (fori_loop,
        # per-iteration perturbed lengths so XLA cannot hoist the body)
        # with one scalar readback: on real hardware dispatch costs ~50us,
        # but the axon tunnel charges ~3-4ms per dispatch, which is an
        # environment artifact, not kernel time.  The host-dispatched loop
        # is reported in detail.
        import functools as ft

        from tekken_tpu.ops.packed import packed_encode_impl

        iters = int(os.environ.get("BENCH_ITERS", 8))
        reps = int(os.environ.get("BENCH_INNER_REPS", 16))
        impl = ft.partial(packed_encode_impl, seed1=enc._seed1,
                          seed2=enc._seed2, wseed=enc._wseed,
                          np_cap=enc._np_cap, route=route)

        @jax.jit
        def run_inner(byts, lens, packed, dense, wrows):
            def body(i, acc):
                o = impl(byts, lens - (i & 1), packed, dense, wrows)
                return acc + o[1]
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        t3 = time.time()
        _ = int(run_inner(jbuf, jlen, *tables))  # compile + warm
        compile_s["inner_loop"] = round(time.time() - t3, 1)
        sys.stderr.write(f"[bench] inner-loop compile+warm "
                         f"{time.time()-t3:.1f}s\n")
        t4 = time.time()
        _ = int(run_inner(jbuf, jlen, *tables))
        dt_in = (time.time() - t4) / reps
        bps = batch_bytes / dt_in

        t3 = time.time()
        for _ in range(iters):
            out = fn(jbuf, jlen, *tables)
        n0 = int(out[1])
        dt = time.time() - t3
        bps_dispatched = batch_bytes * iters / dt
    except Exception as e:
        device_error = f"{type(e).__name__}: {e}"
        sys.stderr.write(f"[bench] DEVICE PATH FAILED — degrading to host "
                         f"variants: {device_error}\n")

    # --- route-2 / route-3 / mixed-corpus device throughput (VERDICT r4
    # item 4: the headline measured only the best-case route; these pin
    # the general-ASCII and UTF-8 kernels and the per-doc-group routing
    # on a 1%-non-ASCII corpus).  BENCH_ROUTES=0 skips. ---
    route_bps = {}
    mixed_ratio = None
    if bps is not None and os.environ.get("BENCH_ROUTES", "1") != "0":
        try:
            import functools as ft

            import jax
            import jax.numpy as jnp
            from tekken_tpu.ops.packed import host_route, packed_encode_impl

            def make_runner(route2, np_cap2):
                @jax.jit
                def run2(byts, lens, packed, dense, wrows):
                    def body(i, acc):
                        o = packed_encode_impl(
                            byts, lens - (i & 1), packed, dense, wrows,
                            enc._seed1, enc._seed2, wseed=enc._wseed,
                            np_cap=np_cap2, route=route2)
                        return acc + o[1]
                    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
                return run2

            def measure(texts2, want_route, label, rows=B):
                buf2 = np.zeros((rows, R), dtype=np.uint8)
                lens2 = np.zeros(rows, dtype=np.int32)
                for i, t in enumerate(texts2):
                    d = t.encode("utf-8")
                    buf2[i, :len(d)] = np.frombuffer(d, dtype=np.uint8)
                    lens2[i] = len(d)
                assert host_route(buf2) == want_route, label
                # parity spot check through the public grouped path
                got2 = enc.encode_batch(texts2[:2])
                for d, g in zip(texts2[:2], got2):
                    assert g == encode_ranks(d, tok.ranks), label
                cap2 = max(64, enc._np_cap * rows // B)
                run2 = make_runner(want_route, cap2)
                jb2, jl2 = jnp.asarray(buf2), jnp.asarray(lens2)
                t0 = time.time()
                _ = int(run2(jb2, jl2, *tables))
                compile_s[f"route{want_route}_{label}"] = round(
                    time.time() - t0, 1)
                t0 = time.time()
                _ = int(run2(jb2, jl2, *tables))
                dt2 = (time.time() - t0) / reps
                nbytes2 = int(lens2.sum())
                return nbytes2 / dt2, dt2

            # the sweep runs at <= 1024 rows (compile-time bound); the
            # mixed ratio uses a same-shape route-1 reference
            Bk = min(B, 1024)
            docs_k = docs[:Bk]
            r2x = random.Random(77)
            docs2 = []
            for d in docs_k:
                parts = d.split(" ")
                for k in range(3, len(parts), 7):
                    parts[k] += " "          # ws run of 2 when joined
                parts.insert(0, str(r2x.randint(10000, 99999)))
                docs2.append(" ".join(parts)[:R])
            route_bps["route2"], _ = measure(docs2, 2, "general-ascii",
                                             rows=Bk)
            sys.stderr.write(f"[bench] route-2 (general ASCII): "
                             f"{route_bps['route2']/1e6:.1f} MB/s\n")

            r3x = random.Random(88)
            cjk = "中文字符测试数据漢字"
            docs3 = []
            for d in docs_k:
                parts = d.split(" ")[:-8]
                for k in range(2, len(parts), 9):
                    parts[k] = r3x.choice(cjk) + parts[k]
                docs3.append(" ".join(parts)[:R - 64])
            route_bps["route3"], _ = measure(docs3, 3, "utf8", rows=Bk)
            sys.stderr.write(f"[bench] route-3 (UTF-8): "
                             f"{route_bps['route3']/1e6:.1f} MB/s\n")

            # mixed corpus: 1% of docs get one CJK char -> per-doc-group
            # routing runs the majority at route 1 plus one small route-3
            # call; ratio vs pure route 1 on the same total bytes
            n_mix = max(1, Bk // 100)
            docs_m1 = docs_k[:Bk - n_mix]
            docs_m3 = [d[:R - 8] + "中" for d in docs_k[Bk - n_mix:]]
            _, dt_ref = measure(docs_k, 1, "route1-ref", rows=Bk)
            bps_m1, dt_m1 = measure(docs_m1, 1, "mixed-major", rows=Bk)
            rows3 = 8
            while rows3 < n_mix:
                rows3 <<= 1
            bps_m3, dt_m3 = measure(docs_m3, 3, "mixed-minor", rows=rows3)
            mixed_bytes = (sum(len(d.encode()) for d in docs_m1)
                           + sum(len(d.encode()) for d in docs_m3))
            mixed_bps = mixed_bytes / (dt_m1 + dt_m3)
            mixed_ratio = round((dt_m1 + dt_m3) / dt_ref, 3)
            route_bps["mixed_1pct_nonascii"] = mixed_bps
            sys.stderr.write(
                f"[bench] mixed corpus (1% non-ASCII): "
                f"{mixed_bps/1e6:.1f} MB/s ({mixed_ratio:.2f}x pure "
                f"route-1 time)\n")
        except Exception as e:
            sys.stderr.write(f"[bench] route sweep unavailable: {e}\n")

    # decode throughput.  Two numbers:
    #  - device_decode (headline): the decode KERNEL in-jit (fori_loop,
    #    bytes stay device-resident — the serving shape where decoded
    #    bytes feed device post-processing), same methodology as encode.
    #  - decode_batch end-to-end (detail): tokens -> Python strings
    #    through the public API, including the tunnel readback and host
    #    UTF-8 — warmed AT FULL SHAPE (the round-3 number timed the 64K-
    #    bucket jit compile inside the loop: 47 KB/s was compile time).
    # Parity is asserted on ALL docs (VERDICT r3 item 3).
    decode_bps = decode_api_bps = None
    try:
        from tekken_tpu.special_tokens import SpecialTokenPolicy
        shift = tok.num_special_tokens()
        if out is not None:
            # the spliced stream (device tokens + host-merged fb spans);
            # ids stay numpy arrays — the serving payload type (list
            # conversion alone costed ~40 ms per 2 MB batch)
            rows = got_pos // R
            cut = np.searchsorted(rows, np.arange(B + 1))
            id_lists = [got_ranks[cut[i]:cut[i + 1]] + shift
                        for i in range(B)]
        else:
            id_lists = [np.asarray(encode_ranks(d, tok.ranks),
                                   np.int64) + shift for d in docs]
        texts_out = tok.decode_batch(id_lists, SpecialTokenPolicy.IGNORE)
        assert texts_out == docs, "decode parity failure in bench"
        sys.stderr.write("[bench] decode_batch parity on all docs OK\n")
        out_bytes = sum(len(t.encode("utf-8")) for t in texts_out)

        # in-jit kernel measurement (device-resident bytes); same engine
        # selection as DeviceDecoder.decode_stream (Pallas block-compact
        # kernel when available, else the XLA delta-cumsum kernel)
        import jax
        import jax.numpy as jnp
        from tekken_tpu.ops.decode import (decode_bytes_impl,
                                           decode_bytes_pallas_impl)
        from tekken_tpu.ops.pallas_stage1 import pallas_enabled
        dec = tok._get_device_decoder()
        stream = np.concatenate(
            [np.asarray(ids, np.int64) - shift for ids in id_lists]
        ).astype(np.int32)
        cap = 256
        while cap < stream.size:
            cap <<= 1
        sbuf = np.zeros(cap, np.int32)
        sbuf[:stream.size] = stream
        jstream = jnp.asarray(sbuf)
        n_tok = jnp.int32(stream.size)
        out_cap = dec.out_cap_for(stream)
        d_reps = int(os.environ.get("BENCH_DECODE_REPS", 32))

        use_pallas_dec = dec._sw4 is not None and pallas_enabled()

        @jax.jit
        def run_decode(toks, n, t1, t2):
            def body(i, acc):
                if use_pallas_dec:
                    o, total = decode_bytes_pallas_impl(
                        toks, n - (i & 1), t1, t2, out_cap, dec._sw4)
                else:
                    o, total = decode_bytes_impl(toks, n - (i & 1), t1,
                                                 t2, out_cap)
                return acc + total + o[0].astype(jnp.int32)
            return jax.lax.fori_loop(0, d_reps, body, jnp.int32(0))

        dtabs = ((dec._bytes32, dec._lentab) if use_pallas_dec
                 else (dec._flat, dec._offsets))
        _ = int(run_decode(jstream, n_tok, *dtabs))
        t5 = time.time()
        _ = int(run_decode(jstream, n_tok, *dtabs))
        decode_bps = out_bytes / ((time.time() - t5) / d_reps)
        sys.stderr.write(f"[bench] device decode kernel (in-jit): "
                         f"{decode_bps/1e6:.1f} MB/s\n")

        # end-to-end API path (includes tunnel readback + host UTF-8)
        d_iters = int(os.environ.get("BENCH_DECODE_ITERS", 4))
        t6 = time.time()
        for _ in range(d_iters):
            texts_out = tok.decode_batch(id_lists, SpecialTokenPolicy.IGNORE)
        decode_api_bps = out_bytes / ((time.time() - t6) / d_iters)
        sys.stderr.write(f"[bench] decode_batch end-to-end: "
                         f"{decode_api_bps/1e6:.1f} MB/s (text out)\n")
    except Exception as e:  # pragma: no cover
        sys.stderr.write(f"[bench] decode bench unavailable: {e}\n")

    # host-native engine detail (same corpus; thread-pooled C++ engine)
    native_bps = None
    try:
        from tekken_tpu.native import NativeEncoder
        ne = NativeEncoder(tok)
        ne.encode_batch(docs[:4])  # warm
        t4 = time.time()
        ne.encode_batch(docs, n_threads=0)
        native_bps = batch_bytes / (time.time() - t4)
        sys.stderr.write(f"[bench] native host engine: "
                         f"{native_bps/1e6:.1f} MB/s\n")
    except Exception as e:  # pragma: no cover
        sys.stderr.write(f"[bench] native engine unavailable: {e}\n")

    # headline: device path if it survived, else the best host variant —
    # the metric line ALWAYS prints, degraded runs say so in detail.
    headline = bps
    headline_variant = "device-packed"
    if headline is None:
        if native_bps is not None:
            headline, headline_variant = native_bps, "native-host-fallback"
        else:
            t6 = time.time()
            for d in docs[:8]:
                encode_ranks(d, tok.ranks)
            headline = sum(len(d.encode("utf-8")) for d in docs[:8]) / (
                time.time() - t6)
            headline_variant = "oracle-fallback"

    print(json.dumps({
        "metric": "encode_bytes_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": "bytes/s",
        "vs_baseline": round(headline / TARGET, 4),
        "detail": {
            "headline_variant": headline_variant,
            "device_packed_path_bytes_per_sec": (
                round(bps, 1) if bps else None),
            "host_dispatched_loop_bytes_per_sec": (
                round(bps_dispatched, 1) if bps_dispatched else None),
            "device_decode_bytes_per_sec": (
                round(decode_bps, 1) if decode_bps else None),
            "decode_batch_end_to_end_bytes_per_sec": (
                round(decode_api_bps, 1) if decode_api_bps else None),
            "native_host_engine_bytes_per_sec": (
                round(native_bps, 1) if native_bps else None),
            "route2_bytes_per_sec": (
                round(route_bps["route2"], 1)
                if "route2" in route_bps else None),
            "route3_bytes_per_sec": (
                round(route_bps["route3"], 1)
                if "route3" in route_bps else None),
            "mixed_1pct_nonascii_bytes_per_sec": (
                round(route_bps["mixed_1pct_nonascii"], 1)
                if "mixed_1pct_nonascii" in route_bps else None),
            "mixed_vs_route1_time_ratio": mixed_ratio,
            "device_error": device_error,
            # compile-time tracking (VERDICT r3 weak #7): the compact
            # pipeline multiplies cond branches; regressions show here
            # before they hurt (first run cold; cached runs near-zero
            # via the persistent compile cache)
            "compile_seconds": compile_s if bps else None,
            "target_bytes_per_sec": TARGET,
            "platform": platform_note,
        },
    }))


if __name__ == "__main__":
    main()
