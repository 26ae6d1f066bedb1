"""TPU smoke gate: compile + run every device-kernel variant on the LIVE
device at tiny shapes, with oracle parity checks.

MANDATORY before committing kernel changes (CLAUDE.md): round 2 shipped a
default-on Pallas kernel that had never compiled on a real TPU, and the
driver bench crashed with a Mosaic internal assert (BENCH_r02.json rc=1,
VERDICT.md weak #5).  Tests run Pallas in interpret mode on CPU, so CI
green CANNOT catch Mosaic lowering failures — only this gate can.

Variants:
  packed-wide      packed kernel, wide (8-dword) word rows  [gating]
  packed-narrow    packed kernel, narrow (4-dword) word rows [gating]
  packed-hostmerge packed kernel, host-merge span recording  [gating]
  decode           device span-gather decoder                [gating]
  packed-pallas    packed kernel with the fused Pallas boundary
                   kernel enabled.  Gating iff TEKKEN_TPU_PALLAS
                   defaults on; otherwise reported but non-gating.

Run: python tools/tpu_smoke.py            (on the live TPU; ~2-5 min)
     JAX_PLATFORMS=cpu python tools/tpu_smoke.py   (logic check only)

Exit code 0 iff all gating variants pass.  Tiny shapes (8x256) keep each
compile through the axon tunnel short; one process, generous waits, no
mid-RPC kills (tunnel etiquette, CLAUDE.md).
"""

import functools as ft
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, R = 8, 256

TEXTS = [
    "hello world, this is a smoke test 123!",
    "the quick brown fox jumps over the lazy dog",
    "numbers 1 22 333 4444 and   spaced   runs",
    "punctuation?! (parens) [brackets] {braces}",
    "",
    "unicode: café naïve 中文 \U0001f600",
    "a",
    "trailing space ",
]

# ASCII but NOT simple (ws runs > 1 / digit runs > 3): the static
# general-ASCII route — exercises the compact kernel's in-kernel scan
# rules (round 4)
GENERAL_TEXTS = [
    "double  spaces   and 12345 long digit runs",
    "tabs\tand\nnewlines\r\nmixed   up",
    "  leading and trailing whitespace  ",
    "big number 1234567890 inline",
    "",
    "normal words between the runs",
    "x",
    "   whitespace   handling   ",
]

# contains non-ASCII: the static UTF-8 route — XLA char path feeding the
# compact kernel externally (round 4)
UTF8_TEXTS = [
    "unicode: café naïve 中文 \U0001f600",
    "Русский текст и עברית",
    "mixed ascii and 日本語 words",
    "emoji runs \U0001f600\U0001f601\U0001f602",
    "",
    "plain ascii row in a utf-8 batch",
    "ü",
    "combining á accents",
]

# qualifies for the static simple-ASCII route (no ws run > 1, no digit
# run > 3) — exercises the piece-compact pipeline
SIMPLE_TEXTS = [
    "hello world, this is a smoke test 123!",
    "the quick brown fox jumps over the lazy dog",
    "numbers 1 22 333 mixed with words",
    "punctuation?! (parens) [brackets] {braces}",
    "",
    "it's a contraction we'll check",
    "a",
    "supercalifragilisticexpialidocious word",
]


def build_tok():
    from tekken_tpu.models import build_synthetic_tokenizer
    return build_synthetic_tokenizer(num_merges=400)


def run_packed(tok, texts, wide: bool, pallas: bool, host_merge: bool,
               route: int | None = None):
    """Jit packed_encode_impl fresh (no lru cache) so env toggles retrace."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tekken_tpu.ops.packed import (PackedEncoder, host_route,
                                       packed_encode_impl,
                                       splice_host_merges, oracle_merge_fn)
    from tekken_tpu.vocab import WordDirectMap

    os.environ["TEKKEN_TPU_PALLAS"] = "1" if pallas else "0"
    enc = PackedEncoder(tok, rows=B, row_len=R, merge="host" if host_merge
                        else "device")
    wm = WordDirectMap.build(tok.ranks, wide=wide)
    word_rows = jnp.asarray(wm.rows)
    impl = ft.partial(packed_encode_impl, seed1=enc._seed1,
                      seed2=enc._seed2, wseed=int(wm.seed),
                      np_cap=enc._np_cap, host_merge=host_merge,
                      route=route)
    fn = jax.jit(impl)
    buf, lengths = enc.pack(texts)
    if route is not None:
        assert host_route(buf) == route, (host_route(buf), route)
    t0 = time.time()
    out = fn(jnp.asarray(buf), jnp.asarray(lengths), enc._packed,
             enc._dense, word_rows)
    n_out = int(out[1])  # real sync through the tunnel
    dt = time.time() - t0
    assert int(out[4]) == 0, "smoke batch overflowed merge capacity"
    st = np.asarray(out[0])
    pos = np.flatnonzero(st >= 0).astype(np.int64)
    got, pos = splice_host_merges(
        st[pos], pos, buf.reshape(-1), np.asarray(out[2]),
        np.asarray(out[3]), oracle_merge_fn(tok.ranks))
    rows = pos // R
    cut = np.searchsorted(rows, np.arange(len(texts) + 1))
    got_lists = [got[cut[i]:cut[i + 1]].tolist() for i in range(len(texts))]

    from tekken_tpu.oracle import encode_ranks
    want = [encode_ranks(t, tok.ranks) for t in texts]
    assert got_lists == want, (
        f"parity failure (wide={wide} pallas={pallas} host={host_merge}):\n"
        f"got  {got_lists}\nwant {want}")
    return dt, n_out


def run_decode(tok, texts, pallas=True):
    import numpy as np

    from tekken_tpu.ops.decode import DeviceDecoder
    from tekken_tpu.oracle import encode_ranks

    os.environ["TEKKEN_TPU_PALLAS"] = "1" if pallas else "0"
    dec = DeviceDecoder(tok)
    ranks = np.concatenate([
        np.asarray(encode_ranks(t, tok.ranks), np.int32)
        for t in texts if t]).astype(np.int32)
    t0 = time.time()
    data = dec.decode_stream(ranks)
    dt = time.time() - t0
    want = "".join(t for t in texts if t).encode("utf-8")
    assert data == want, "device decode parity failure"
    return dt, len(data)


def main():
    import jax

    # the image pins JAX_PLATFORMS=axon; env overrides do not stick, so
    # honor an explicit cpu request via jax.config (CLAUDE.md gotcha)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    results = {}
    failures = []
    platform = jax.devices()[0].platform
    sys.stderr.write(f"[smoke] platform: {platform}\n")

    tok = build_tok()
    from tekken_tpu.ops.pallas_stage1 import pallas_enabled
    os.environ.pop("TEKKEN_TPU_PALLAS", None)
    pallas_default_on = pallas_enabled()

    variants = [
        ("packed-wide", True,
         lambda: run_packed(tok, TEXTS, wide=True, pallas=False,
                            host_merge=False)),
        ("packed-narrow", True,
         lambda: run_packed(tok, TEXTS, wide=False, pallas=False,
                            host_merge=False)),
        ("packed-hostmerge", True,
         lambda: run_packed(tok, TEXTS, wide=True, pallas=False,
                            host_merge=True)),
        ("decode", True, lambda: run_decode(tok, TEXTS, pallas=False)),
        # round 5: the Pallas block-compaction decode kernel
        ("decode-pallas", pallas_default_on,
         lambda: run_decode(tok, TEXTS, pallas=True)),
        ("packed-pallas", pallas_default_on,
         lambda: run_packed(tok, TEXTS, wide=True, pallas=True,
                            host_merge=False)),
        # the piece-compact pipeline (static simple-ASCII route + Pallas):
        # production's hot path for typical prose
        ("packed-compact", pallas_default_on,
         lambda: run_packed(tok, SIMPLE_TEXTS, wide=True, pallas=True,
                            host_merge=False, route=1)),
        ("packed-compact-hostmerge", pallas_default_on,
         lambda: run_packed(tok, SIMPLE_TEXTS, wide=True, pallas=True,
                            host_merge=True, route=1)),
        # round 4: the compact pipeline covers ALL routes — general
        # ASCII (in-kernel scan rules) and UTF-8 (XLA char path feeding
        # the kernel's external-boundary variant)
        ("packed-compact-general", pallas_default_on,
         lambda: run_packed(tok, GENERAL_TEXTS, wide=True, pallas=True,
                            host_merge=False, route=2)),
        ("packed-compact-utf8", pallas_default_on,
         lambda: run_packed(tok, UTF8_TEXTS, wide=True, pallas=True,
                            host_merge=False, route=3)),
    ]

    for name, gating, fn in variants:
        t0 = time.time()
        try:
            dt, n = fn()
            results[name] = {"ok": True, "compile_plus_run_s": round(
                time.time() - t0, 1), "run_s": round(dt, 2), "n": n}
            sys.stderr.write(f"[smoke] {name}: OK "
                             f"({time.time()-t0:.1f}s, n={n})\n")
        except Exception as e:
            results[name] = {"ok": False, "gating": gating,
                             "error": f"{type(e).__name__}: {e}"}
            sys.stderr.write(f"[smoke] {name}: "
                             f"{'FAIL' if gating else 'fail (non-gating)'} "
                             f"— {type(e).__name__}: {e}\n")
            if gating:
                failures.append(name)
        finally:
            os.environ.pop("TEKKEN_TPU_PALLAS", None)

    print(json.dumps({"platform": platform, "pass": not failures,
                      "failures": failures, "variants": results}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
