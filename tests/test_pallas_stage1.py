"""Fused Pallas stage-1 kernel: bit-parity with the XLA formulation and
end-to-end packed-encoder parity with Pallas enabled (interpret mode on
CPU; tools/tpu_smoke.py covers the real-device Mosaic compile)."""

import random
import string

import numpy as np
import pytest

from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.oracle import encode_ranks


@pytest.fixture(scope="module")
def tok():
    return build_synthetic_tokenizer(num_merges=300, num_special_tokens=20)


def _simple_ascii_texts(rng, n, max_len):
    """Texts that qualify for the simple branch: single spaces, digit runs
    <= 3 (and ASCII only)."""
    words = []
    alpha = string.ascii_letters
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(0, max_len // 5)):
            w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.2:
                w += str(rng.randint(0, 999))
            if rng.random() < 0.2:
                w += rng.choice(".,!?;:'")
            parts.append(w)
        out.append(" ".join(parts)[:max_len])
    return out


def test_stage1_fused_bit_parity(tok, monkeypatch):
    """plen/slot/dwords from the fused kernel equal the XLA stage-1 values
    bit-for-bit on qualifying batches."""
    import jax
    import jax.numpy as jnp

    from tekken_tpu.ops import packed as packed_mod
    from tekken_tpu.ops.packed import PackedEncoder, packed_encode_impl

    B, R = 8, 256
    enc = PackedEncoder(tok, rows=B, row_len=R)
    rng = random.Random(42)
    texts = _simple_ascii_texts(rng, B, R - 1)
    buf, lengths = enc.pack(texts)

    wm = tok.word_map()
    n_words = wm.n_words
    from tekken_tpu.ops.pallas_stage1 import stage1_fused
    fused = stage1_fused(jnp.asarray(buf), jnp.asarray(lengths), n_words,
                         wm.size, int(wm.seed))

    # the XLA formulation, via the packed impl's own stage1_xla: force
    # pallas OFF and re-derive the same outputs through a tiny harness
    monkeypatch.setenv("TEKKEN_TPU_PALLAS", "0")
    import jax.numpy as jnp
    from tekken_tpu.ops.pretokenize import (ascii_classes_arith,
                                            byte_boundaries_ascii_simple)
    jb, jl = jnp.asarray(buf), jnp.asarray(lengths)
    N = B * R
    row_bound = jax.vmap(byte_boundaries_ascii_simple)(
        jb, jl, ascii_classes_arith(jb))
    boundary = np.asarray(row_bound).reshape(N)
    idx = np.arange(N, dtype=np.int64)
    valid = (idx % R) < np.asarray(lengths)[idx // R]
    flat = buf.reshape(N).astype(np.int64)

    # scalar reference for plen/ws/slot
    plen_ref = np.zeros(N, np.int64)
    starts = np.flatnonzero(boundary & valid)
    for si, s in enumerate(starts):
        e = starts[si + 1] if si + 1 < len(starts) else None
        seg_end = s
        while (seg_end + 1 < N and valid[seg_end + 1]
               and not boundary[seg_end + 1]
               and (seg_end + 1) // R == s // R):
            seg_end += 1
        plen_ref[s] = seg_end - s + 1

    got_plen = np.asarray(fused[0]).reshape(N)
    assert (got_plen == plen_ref).all()

    got_slot = np.asarray(fused[1]).reshape(N)
    got_ws = [np.asarray(x).reshape(N) for x in fused[2:]]

    # dword + slot parity at every piece start against the host builder
    from tekken_tpu.vocab import word_hash, _le_words
    for s in starts:
        L = int(plen_ref[s])
        piece = bytes(buf.reshape(N)[s:s + L].tolist())
        ws_ref = _le_words(piece.ljust(4 * n_words, b"\0")[:4 * n_words],
                           n_words)
        for k in range(n_words):
            want = ws_ref[k] if 4 * k < L else 0
            # mask beyond plen
            keep = max(0, min(4, L - 4 * k))
            m = (1 << (8 * keep)) - 1 if keep < 4 else 0xFFFFFFFF
            want = ws_ref[k] & m
            got = int(got_ws[k][s]) & 0xFFFFFFFF
            assert got == want, (s, k, piece)
        w0, w1, w2 = (int(got_ws[0][s]) & 0xFFFFFFFF,
                      int(got_ws[1][s]) & 0xFFFFFFFF,
                      int(got_ws[2][s]) & 0xFFFFFFFF)
        want_slot = int(word_hash(w0, w1, w2, L, int(wm.seed), wm.size))
        assert got_slot[s] == want_slot, (s, piece)


def test_packed_parity_with_pallas_enabled(tok, monkeypatch):
    monkeypatch.setenv("TEKKEN_TPU_PALLAS", "1")
    from tekken_tpu.ops.packed import PackedEncoder
    enc = PackedEncoder(tok, rows=8, row_len=256)
    rng = random.Random(99)
    texts = _simple_ascii_texts(rng, 7, 200) + ["中文 mixed"]
    got = enc.encode_batch(texts)
    for t, g in zip(texts, got):
        assert g == encode_ranks(t, tok.ranks), repr(t)


def test_packed_parity_pallas_fuzz(tok, monkeypatch):
    """Fuzz the full packed path with the fused kernel enabled, including
    inputs that FAIL the simple predicate (double spaces, long digit runs,
    UTF-8) so every cond branch route is taken."""
    monkeypatch.setenv("TEKKEN_TPU_PALLAS", "1")
    from tekken_tpu.ops.packed import PackedEncoder
    enc = PackedEncoder(tok, rows=16, row_len=512)
    rng = random.Random(7)
    alpha = string.ascii_letters + string.digits + " .,!?'\n\r\t"
    for _ in range(4):
        texts = ["".join(rng.choice(alpha)
                         for _ in range(rng.randint(0, 200)))
                 for _ in range(rng.randint(1, 16))]
        got = enc.encode_batch(texts)
        for t, g in zip(texts, got):
            assert g == encode_ranks(t, tok.ranks), repr(t)


def test_stage1_compact_matches_flat(tok, monkeypatch):
    """The in-kernel binary-gap compaction network (stage1_compact) yields
    exactly the flat stage-1 records gathered at piece starts, left-packed
    per row with -1 padding — the piece-compact pipeline's foundation."""
    import jax.numpy as jnp

    from tekken_tpu.ops.pallas_stage1 import stage1_compact, stage1_fused

    rng = random.Random(5)
    B, R = 8, 256
    for trial in range(8):
        texts = _simple_ascii_texts(rng, B, R - 8)
        buf = np.zeros((B, R), np.uint8)
        lens = np.zeros(B, np.int32)
        for i, t in enumerate(texts):
            d = t.encode()
            buf[i, :len(d)] = np.frombuffer(d, np.uint8)
            lens[i] = len(d)

        plen, slot, *ws = stage1_fused(
            jnp.asarray(buf), jnp.asarray(lens), 6, 1 << 14, 77)
        plen = np.asarray(plen).reshape(B, R)
        slot = np.asarray(slot).reshape(B, R)
        ws = [np.asarray(w).reshape(B, R) for w in ws]

        st_c, pl_c, sl_c, *wsc, cnt = stage1_compact(
            jnp.asarray(buf), jnp.asarray(lens), 6, 1 << 14, 77)
        st_c, pl_c, sl_c, cnt = map(np.asarray, (st_c, pl_c, sl_c, cnt))
        wsc = [np.asarray(w) for w in wsc]

        for r in range(B):
            starts = np.flatnonzero(plen[r] > 0)
            assert cnt[r] == len(starts), (trial, r)
            k = len(starts)
            assert (st_c[r, :k] == starts).all(), (trial, r)
            assert (pl_c[r, :k] == plen[r, starts]).all(), (trial, r)
            assert (sl_c[r, :k] == slot[r, starts]).all(), (trial, r)
            for j in range(6):
                assert (wsc[j][r, :k] == ws[j][r, starts]).all(), (trial, r)
            assert (st_c[r, k:] == -1).all(), (trial, r)


def test_compact_pipeline_dense_rows(tok, monkeypatch):
    """Rows dense in pieces (alternating 1-byte pieces) push cmax to the
    top C tier; parity must hold through every tier branch."""
    monkeypatch.setenv("TEKKEN_TPU_PALLAS", "1")
    from tekken_tpu.ops.packed import PackedEncoder, host_route

    enc = PackedEncoder(tok, rows=8, row_len=128)
    texts = ["a1" * 60, "b2" * 64, "the quick brown fox", "x", ""]
    buf, _ = enc.pack(texts)
    assert host_route(buf) == 1
    got = enc.encode_batch(texts)
    for t, g in zip(texts, got):
        assert g == encode_ranks(t, tok.ranks), repr(t)


def test_char_boundaries_general_matches_reference():
    """The row-local log-doubling formulation (the compact kernel's
    general-ASCII rules) is bit-identical to _char_boundaries on
    adversarial ASCII: ws runs, digit runs, newline runs, contractions."""
    import jax.numpy as jnp

    from tekken_tpu.ops.pretokenize import (_char_boundaries,
                                            _char_boundaries_general,
                                            ascii_packed_lookup)

    rng = np.random.default_rng(123)
    L = 256
    for trial in range(60):
        n = int(rng.integers(0, 200))
        chars: list[int] = []
        while len(chars) < n:
            kind = rng.integers(0, 6)
            rl = int(rng.integers(1, 6))
            if kind == 0:
                chars += [int(rng.choice([9, 10, 13, 32]))] * rl
            elif kind == 1:
                chars += [int(x) for x in rng.integers(48, 58, rl)]
            elif kind == 2:
                chars += [int(x) for x in rng.integers(97, 123, rl)]
            elif kind == 3:
                chars += [39] + [int(rng.choice(
                    [ord(c) for c in "strelvmd"])) for _ in range(rl)]
            elif kind == 4:
                chars += [int(rng.choice([33, 44, 46, 59, 10, 13]))
                          for _ in range(rl)]
            else:
                chars += [int(x) for x in rng.integers(32, 127, rl)]
        chars = chars[:n]
        buf = np.zeros(L, np.uint8)
        buf[:n] = np.asarray(chars, np.uint8)
        valid = jnp.arange(L) < n
        cp = jnp.asarray(buf).astype(jnp.int32)
        pk = ascii_packed_lookup(jnp.asarray(buf))
        a = np.asarray(_char_boundaries(cp, valid, pk=pk))
        b = np.asarray(_char_boundaries_general(cp, valid, pk))
        assert (a == b).all(), (trial, bytes(chars))


def test_compact_general_route_parity(tok, monkeypatch):
    """Route-2 (general ASCII) batches through the compact pipeline."""
    monkeypatch.setenv("TEKKEN_TPU_PALLAS", "1")
    from tekken_tpu.ops.packed import PackedEncoder, host_route

    enc = PackedEncoder(tok, rows=8, row_len=256)
    texts = [
        "double  spaces   and 12345 digit runs",
        "tabs\tand\nnewlines\r\nmixed   up",
        "  leading ws  ",
        "big 1234567890 numbers",
        "",
        "   whitespace   handling   ",
        "a",
        "plain words too",
    ]
    buf, _ = enc.pack(texts)
    assert host_route(buf) == 2
    got = enc.encode_batch(texts)
    for t, g in zip(texts, got):
        assert g == encode_ranks(t, tok.ranks), repr(t)


def test_compact_utf8_route_parity(tok, monkeypatch):
    """Route-3 (UTF-8) batches: XLA char path feeding the compact
    kernel's external-boundary variant."""
    monkeypatch.setenv("TEKKEN_TPU_PALLAS", "1")
    from tekken_tpu.ops.packed import PackedEncoder, host_route

    enc = PackedEncoder(tok, rows=8, row_len=256)
    texts = [
        "unicode: café naïve 中文 \U0001f600",
        "Русский текст и עברית",
        "mixed ascii and 日本語 words",
        "emoji runs \U0001f600\U0001f601\U0001f602",
        "",
        "plain ascii row inside a utf-8 batch",
        "ü",
        "tricky   runs  12345 et café",
    ]
    buf, _ = enc.pack(texts)
    assert host_route(buf) == 3
    got = enc.encode_batch(texts)
    for t, g in zip(texts, got):
        assert g == encode_ranks(t, tok.ranks), repr(t)


def test_compact_route_fuzz(tok, monkeypatch):
    """Random batches across all three routes through encode_batch (the
    production path routes statically on host)."""
    monkeypatch.setenv("TEKKEN_TPU_PALLAS", "1")
    from tekken_tpu.ops.packed import PackedEncoder

    enc = PackedEncoder(tok, rows=16, row_len=512)
    rng = random.Random(17)
    alpha = (string.ascii_letters + string.digits + " .,!?'\n\r\t"
             + "中文日本語éü\U0001f600")
    for _ in range(6):
        texts = ["".join(rng.choice(alpha)
                         for _ in range(rng.randint(0, 150)))
                 for _ in range(rng.randint(1, 16))]
        got = enc.encode_batch(texts)
        for t, g in zip(texts, got):
            assert g == encode_ranks(t, tok.ranks), repr(t)
