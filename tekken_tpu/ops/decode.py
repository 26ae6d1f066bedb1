"""Batched device decode: token ids -> byte stream via span gathers.

The reference's decode concatenates rank byte-spans with lossy UTF-8
(reference: src/tekkenizer.rs:548-557).  Here the byte materialization is a
device op: for each token, gather its span from the flat vocab byte array
(DecodeTable, replicated in HBM) into an output byte buffer; UTF-8
decoding/policy handling stays on host (it is inherently stringy).

Layout: each token expands to at most ``max_token_len`` bytes; the kernel
computes exact output offsets with a cumsum and scatters bytes at
(offset + lane) positions, masked by span length.
"""

from __future__ import annotations

import functools

import numpy as np


def decode_bytes_impl(tokens, n_tokens, flat, offsets, max_token_len: int):
    """tokens i32[T] (engine ranks; padding ignored beyond n_tokens) ->
    (bytes u8[T*max_token_len] left-aligned, total_len)."""
    import jax.numpy as jnp

    T = tokens.shape[0]
    L = max_token_len

    valid = jnp.arange(T, dtype=jnp.int32) < n_tokens
    tok = jnp.where(valid, tokens, 0)
    start = offsets[tok]
    length = jnp.where(valid, offsets[tok + 1] - start, 0)

    out_off = jnp.cumsum(length) - length          # exclusive prefix sum
    total = jnp.sum(length)

    lane = jnp.arange(L, dtype=jnp.int32)[None, :]          # (1, L)
    src = start[:, None] + lane                             # (T, L)
    ok = lane < length[:, None]
    vals = flat[jnp.clip(src, 0, flat.shape[0] - 1)]
    dst = jnp.where(ok, out_off[:, None] + lane, T * L)
    out = jnp.zeros(T * L, dtype=jnp.uint8).at[dst.reshape(-1)].set(
        vals.reshape(-1), mode="drop")
    return out, total


@functools.lru_cache(maxsize=8)
def decode_bytes_fn(max_token_len: int):
    import functools as ft
    import jax

    return jax.jit(ft.partial(decode_bytes_impl, max_token_len=max_token_len))


class DeviceDecoder:
    """Batched rank-stream decoder against a tokenizer's DecodeTable."""

    def __init__(self, tokenizer, capacity: int = 1 << 16):
        import jax.numpy as jnp

        dt = tokenizer.decode_table
        self._flat = jnp.asarray(dt.flat)
        self._offsets = jnp.asarray(dt.offsets)
        self._max_len = max(1, int(dt.max_token_len))
        self._cap = capacity

    def decode_ranks(self, ranks) -> bytes:
        """Engine ranks -> concatenated bytes (device gathers)."""
        ranks = np.asarray(ranks, dtype=np.int32)
        if ranks.size > self._cap:
            raise ValueError(f"{ranks.size} tokens exceed capacity "
                             f"{self._cap}")
        return self.decode_stream(ranks)

    def decode_stream(self, ranks: np.ndarray) -> bytes:
        """Engine ranks of any length -> concatenated bytes; streams in
        capacity-sized device calls (bytes concatenate freely, so chunking
        at token granularity is exact).

        Buffers are power-of-two BUCKETED (256..capacity), not padded to
        the full capacity: a 10-token decode launches a 256-row kernel, not
        a 64K-row one (jax.jit caches one executable per bucket shape)."""
        import jax.numpy as jnp

        ranks = np.asarray(ranks, dtype=np.int32)
        if ranks.size == 0:
            return b""
        fn = decode_bytes_fn(self._max_len)
        parts = []
        for lo in range(0, ranks.size, self._cap):
            chunk = ranks[lo:lo + self._cap]
            cap = 256
            while cap < chunk.size:
                cap <<= 1
            buf = np.zeros(cap, dtype=np.int32)
            buf[:chunk.size] = chunk
            out, total = fn(jnp.asarray(buf), chunk.size, self._flat,
                            self._offsets)
            parts.append(np.asarray(out)[:int(total)].tobytes())
        return b"".join(parts)
