"""Batched device decode: token ids -> byte stream, output-proportional.

The reference's decode concatenates rank byte-spans with lossy UTF-8
(reference: src/tekkenizer.rs:548-557).  Here the byte materialization is a
device op; UTF-8 decoding/policy handling stays on host (inherently
stringy).

Kernel design (round 5 — the round-4 kernel scattered T x max_token_len
lanes, mostly masked waste: 20 MB/s in-jit).  Decode is re-cast as a
GATHER per OUTPUT byte, the TPU-native expansion idiom:

  1. per-token spans: start/length from the offsets table (2 gathers of
     T rows), exclusive cumsum -> out_off
  2. head markers: scatter token index i at out_off[i] (ONE width-1
     T-source scatter), then a native cummax fills t_j = "token owning
     output byte j" (token indices are non-decreasing along the output)
  3. src_j = (start - out_off)[t_j] + j, out_j = flat32[src_j] — two
     width-1 gathers per output byte, both at the fast width-1 rate
     (~700 M rows/s on v5e vs ~85 M rows/s for the old lane scatter)

Every op is proportional to the OUTPUT CAPACITY (a power-of-two bucket
over the actual byte total, chosen host-side from the numpy offsets
table), never to T x max_token_len.
"""

from __future__ import annotations

import functools

import numpy as np


def decode_bytes_impl(tokens, n_tokens, flat32, offsets, out_cap: int):
    """tokens i32[T] (engine ranks; padding ignored beyond n_tokens) ->
    (bytes u8[out_cap] left-aligned, total_len).  ``flat32`` is the
    decode-table byte array widened to int32 (width-1 gathers lower best
    in int32); ``out_cap`` a static output capacity >= the byte total
    (callers bucket it; bytes past total are zero)."""
    import jax
    import jax.numpy as jnp

    T = tokens.shape[0]
    M = out_cap

    valid = jnp.arange(T, dtype=jnp.int32) < n_tokens
    tok = jnp.where(valid, tokens, 0)
    start = offsets[tok]
    length = jnp.where(valid, offsets[tok + 1] - start, 0)

    out_off = jnp.cumsum(length) - length          # exclusive prefix sum
    total = jnp.sum(length)

    # head markers + cummax fill: t_j = index of the token owning byte j
    ii = jnp.arange(T, dtype=jnp.int32)
    head = jnp.zeros(M, jnp.int32).at[
        jnp.where(valid & (length > 0), out_off, M)].set(ii, mode="drop")
    t_j = jax.lax.cummax(head)

    # source byte address per output byte
    d = start - out_off                            # i32[T]
    j = jnp.arange(M, dtype=jnp.int32)
    src = d[t_j] + j
    vals = flat32[jnp.clip(src, 0, flat32.shape[0] - 1)]
    out = jnp.where(j < total, vals, 0).astype(jnp.uint8)
    return out, total


@functools.lru_cache(maxsize=32)
def decode_bytes_fn(out_cap: int):
    import functools as ft
    import jax

    return jax.jit(ft.partial(decode_bytes_impl, out_cap=out_cap))


class DeviceDecoder:
    """Batched rank-stream decoder against a tokenizer's DecodeTable."""

    def __init__(self, tokenizer, capacity: int = 1 << 16):
        import jax.numpy as jnp

        dt = tokenizer.decode_table
        self._flat = jnp.asarray(dt.flat.astype(np.int32))
        self._offsets = jnp.asarray(dt.offsets)
        self._np_offsets = np.asarray(dt.offsets)
        self._max_len = max(1, int(dt.max_token_len))
        self._cap = capacity

    def decode_ranks(self, ranks) -> bytes:
        """Engine ranks -> concatenated bytes (device gathers)."""
        ranks = np.asarray(ranks, dtype=np.int32)
        if ranks.size > self._cap:
            raise ValueError(f"{ranks.size} tokens exceed capacity "
                             f"{self._cap}")
        return self.decode_stream(ranks)

    def out_cap_for(self, chunk: np.ndarray) -> int:
        """Power-of-two output-byte bucket for a rank chunk (host-side
        numpy total over the offsets table)."""
        offs = self._np_offsets
        total = int((offs[chunk + 1] - offs[chunk]).sum())
        cap = 256
        while cap < total:
            cap <<= 1
        return cap

    def decode_stream(self, ranks: np.ndarray) -> bytes:
        """Engine ranks of any length -> concatenated bytes; streams in
        capacity-sized device calls (bytes concatenate freely, so chunking
        at token granularity is exact).

        Buffers are power-of-two BUCKETED on both the token count
        (256..capacity) and the output byte total, so a small decode
        launches a small kernel (jax.jit caches one executable per
        bucket pair)."""
        import jax.numpy as jnp

        ranks = np.asarray(ranks, dtype=np.int32)
        if ranks.size == 0:
            return b""
        parts = []
        for lo in range(0, ranks.size, self._cap):
            chunk = ranks[lo:lo + self._cap]
            cap = 256
            while cap < chunk.size:
                cap <<= 1
            buf = np.zeros(cap, dtype=np.int32)
            buf[:chunk.size] = chunk
            fn = decode_bytes_fn(self.out_cap_for(chunk))
            out, total = fn(jnp.asarray(buf), chunk.size, self._flat,
                            self._offsets)
            parts.append(np.asarray(out)[:int(total)]
                         .astype(np.uint8).tobytes())
        return b"".join(parts)
