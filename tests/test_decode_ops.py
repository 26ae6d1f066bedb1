"""Device decode op parity."""

import random
import string

import pytest

from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.oracle import decode_bytes, encode_ranks
from tekken_tpu.ops.decode import DeviceDecoder


@pytest.fixture(scope="module")
def tok():
    return build_synthetic_tokenizer(num_merges=300)


def test_device_decode_round_trip(tok):
    dd = DeviceDecoder(tok, capacity=4096)
    rng = random.Random(9)
    alpha = string.ascii_letters + " .,!'\n中é"
    for _ in range(25):
        t = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 150)))
        ranks = encode_ranks(t, tok.ranks)
        got = dd.decode_ranks(ranks)
        assert got == decode_bytes(ranks, tok.decode_table)
        assert got == t.encode("utf-8"), repr(t)


def test_device_decode_empty_and_capacity(tok):
    dd = DeviceDecoder(tok, capacity=64)
    assert dd.decode_ranks([]) == b""
    with pytest.raises(ValueError, match="exceed capacity"):
        dd.decode_ranks(list(range(100)))


def test_decode_kernels_differential():
    """XLA delta-cumsum kernel and Pallas block-compaction kernel produce
    identical bytes on random rank streams."""
    import jax.numpy as jnp
    import numpy as np
    from tekken_tpu.models import build_synthetic_tokenizer
    from tekken_tpu.ops.decode import (DeviceDecoder, decode_bytes_impl,
                                       decode_bytes_pallas_impl)

    tok = build_synthetic_tokenizer(num_merges=200)
    dec = DeviceDecoder(tok)
    assert dec._sw4 is not None
    rng = np.random.default_rng(11)
    n_ranks = len(dec._np_offsets) - 1
    for T, n in [(256, 256), (256, 100), (512, 511), (256, 1)]:
        ranks = rng.integers(0, n_ranks, T, dtype=np.int32)
        cap = dec.out_cap_for(ranks[:n])
        o1, t1 = decode_bytes_impl(jnp.asarray(ranks), n, dec._flat,
                                   dec._offsets, cap)
        o2, t2 = decode_bytes_pallas_impl(jnp.asarray(ranks), n,
                                          dec._bytes32, dec._lentab,
                                          cap, dec._sw4)
        assert int(t1) == int(t2)
        tt = int(t1)
        assert np.asarray(o1)[:tt].tolist() == \
            np.asarray(o2)[:tt].tolist(), (T, n)
