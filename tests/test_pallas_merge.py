"""Fused merge-round kernel: differential parity with merge_rows_compact
(interpret mode on CPU; tools/tpu_smoke.py covers the device compile)."""

import random
import string

import numpy as np
import pytest

from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.oracle import encode_ranks


@pytest.fixture(scope="module")
def tok():
    return build_synthetic_tokenizer(num_merges=300, num_special_tokens=20)


def _random_rows(tok, rng, B2, P):
    """Random byte-segment rows + initial pair ranks, like merge_tier
    builds them."""
    import jax.numpy as jnp

    from tekken_tpu.ops.bpe import INF

    table = tok.cuckoo_table()
    dense = np.asarray(table.byte_pair_dense())
    rank = np.full((B2, P), -1, np.int32)
    n0 = np.zeros(B2, np.int32)
    for i in range(B2):
        n = rng.randint(0, P)
        n0[i] = n
        for j in range(n):
            rank[i, j] = rng.randint(0, 255)
    right = np.concatenate([rank[:, 1:], np.full((B2, 1), -1, np.int32)],
                           axis=1)
    lanes = np.arange(P)[None, :]
    q_ok = (lanes + 1 < n0[:, None]) & (rank >= 0) & (right >= 0)
    pr0 = np.where(q_ok, dense[np.where(q_ok, rank * 256 + right, 0)],
                   INF).astype(np.int32)
    return (jnp.asarray(rank), jnp.asarray(pr0), jnp.asarray(n0),
            jnp.asarray(table.packed), int(table.seed1), int(table.seed2))


@pytest.mark.parametrize("P,fixed", [(8, 7), (8, None), (32, None)])
def test_fused_merge_matches_xla(tok, P, fixed):
    import jax

    from tekken_tpu.ops.bpe import merge_rows_compact
    from tekken_tpu.ops.pallas_merge import merge_rows_compact_fused

    rng = random.Random(1000 + P)
    rank, pr0, n0, packed, s1, s2 = _random_rows(tok, rng, 64, P)

    want_r, want_n = jax.jit(
        lambda a, b, c, t: merge_rows_compact(a, b, c, t, s1, s2,
                                              fixed_rounds=fixed))(
        rank, pr0, n0, packed)
    got_r, got_n = jax.jit(
        lambda a, b, c, t: merge_rows_compact_fused(a, b, c, t, s1, s2,
                                                    fixed_rounds=fixed))(
        rank, pr0, n0, packed)

    want_n = np.asarray(want_n)
    got_n = np.asarray(got_n)
    assert (want_n == got_n).all()
    want_r = np.asarray(want_r)
    got_r = np.asarray(got_r)
    for i in range(want_r.shape[0]):
        n = want_n[i]
        assert (want_r[i, :n] == got_r[i, :n]).all(), i


def test_packed_end_to_end_with_fused_merge(tok, monkeypatch):
    monkeypatch.setenv("TEKKEN_TPU_PALLAS", "1")
    from tekken_tpu.ops.packed import PackedEncoder
    enc = PackedEncoder(tok, rows=16, row_len=512)
    rng = random.Random(5)
    alpha = string.ascii_letters + string.digits + " .,!?'\n\r\t"
    for _ in range(3):
        texts = ["".join(rng.choice(alpha)
                         for _ in range(rng.randint(0, 300)))
                 for _ in range(rng.randint(1, 16))]
        got = enc.encode_batch(texts)
        for t, g in zip(texts, got):
            assert g == encode_ranks(t, tok.ranks), repr(t)
