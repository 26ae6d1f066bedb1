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
  2. the per-byte source displacement d_j = (start - out_off)[t_j] is
     built WITHOUT a per-byte gather: scatter the per-token DELTA
     d_i - d_{i-1} at each token's first output byte (ONE width-1
     T-source .add scatter) and run a native cumsum over the output —
     the prefix sum of deltas at j IS d of the owning token
  3. out_j = flat32[d_j + j] — ONE gather per output byte (gathers cost
     ~70 M indices/s on v5e regardless of width, so per-byte gathers
     are the term to minimize; the old kernel paid two)

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

    # per-byte source displacement via delta scatter + cumsum: d_j equals
    # d of the token owning byte j because exactly the deltas of tokens
    # starting at or before j have been summed (.add is collision-safe)
    d = start - out_off                            # i32[T]
    delta = d - jnp.concatenate([jnp.zeros(1, d.dtype), d[:-1]])
    # every VALID token contributes its delta (a zero-length token's
    # delta lands on the next token's first byte and telescopes out)
    dfill = jnp.cumsum(
        jnp.zeros(M, jnp.int32).at[
            jnp.where(valid, out_off, M)
        ].add(jnp.where(valid, delta, 0), mode="drop"))

    j = jnp.arange(M, dtype=jnp.int32)
    src = dfill + j
    vals = flat32[jnp.clip(src, 0, flat32.shape[0] - 1)]
    out = jnp.where(j < total, vals, 0).astype(jnp.uint8)
    return out, total


@functools.lru_cache(maxsize=32)
def decode_bytes_fn(out_cap: int):
    import functools as ft
    import jax

    return jax.jit(ft.partial(decode_bytes_impl, out_cap=out_cap))


def _compact_store_kernel(vals_ref, gap_ref, base_ref, out_ref, *,
                          lanes: int):
    """Binary-gap left-compaction of one token block's byte lanes + store
    at the block's dynamic output offset.

    The gap network is the stage-1 compaction network run on BYTE lanes:
    token i's live lanes share gap g_i = i*SW4 - rel_i, non-decreasing
    (len_i <= SW4) with adjacent differences bounded by the dead-lane
    count between tokens, so moving records left by bit k of their
    remaining gap, LSB to MSB, is collision-free.

    Grid steps run sequentially on TPU and every step maps to the SAME
    resident output block, so each block's store lands after the
    previous block's — junk lanes past a block's byte count are
    overwritten by the next block (its base is exactly this block's
    base + count), and the final tail is masked by the caller.

    Mosaic requires dynamic minor-dim store offsets to be provably
    128-aligned, so the store is an aligned read-modify-write: the
    compacted lanes are rotated right by ``base % 128`` (pltpu.roll),
    the first 128 lanes below the true base keep the previous block's
    bytes, and the whole window stores at the 128-aligned base.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BIG = jnp.int32(1 << 30)
    v = vals_ref[...]                       # (RG, LANES) int32 byte values
    g = gap_ref[...]                        # (RG, LANES) int32; BIG = dead
    RG = v.shape[0]                         # 8 token-blocks per grid step
    # (Mosaic wants the last-2 block dims divisible by (8, 128))
    k = 0
    step = 1
    while step < lanes:                     # network vectorized over rows
        g_in = _shl(g, step, BIG)
        v_in = _shl(v, step, -1)
        sel = (g_in < BIG) & (((g_in >> k) & 1) == 1)
        stay = (g < BIG) & (((g >> k) & 1) == 0)
        v = jnp.where(sel, v_in, jnp.where(stay, v, -1))
        g = jnp.where(sel, g_in - step, jnp.where(stay, g, BIG))
        k += 1
        step <<= 1

    l_full = jax.lax.broadcasted_iota(jnp.int32, (1, lanes + 128), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    for r in range(RG):                     # sequential stores, row order
        base = base_ref[r, 0]
        s = base & 127
        base_al = (base >> 7) * 128         # provably 128-aligned
        # row extraction via masked sum — a v[r:r+1] slice carries a
        # sublane layout offset that Mosaic's concatenate rejects
        vr = jnp.sum(jnp.where(row_ids == r, v, 0), axis=0,
                     keepdims=True)
        vv = jnp.concatenate(
            [vr, jnp.full((1, 128), -1, jnp.int32)], axis=-1)
        sv = pltpu.roll(vv, s, axis=1)      # sv[i] = vv[i - s], i >= s
        old = out_ref[pl.ds(0, 1), pl.ds(base_al, 128)]
        old_pad = jnp.concatenate(
            [old, jnp.zeros((1, lanes), jnp.int32)], axis=-1)
        # bytes below the true base keep the previous block's data
        w = jnp.where(l_full < s, old_pad, sv)
        out_ref[pl.ds(0, 1), pl.ds(base_al, lanes + 128)] = w


def _shl(arr, k: int, fill):
    """Row-local static shift along the last axis (value at lane+k)."""
    import jax.numpy as jnp

    if k == 0:
        return arr
    pad = jnp.full(arr.shape[:-1] + (abs(k),), fill, dtype=arr.dtype)
    if k > 0:
        return jnp.concatenate([arr[..., k:], pad], axis=-1)
    return jnp.concatenate([pad, arr[..., :k]], axis=-1)


@functools.lru_cache(maxsize=32)
def _compact_store_fn(nb: int, lanes: int, out_cap: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    return pl.pallas_call(
        functools.partial(_compact_store_kernel, lanes=lanes),
        grid=(nb // 8,),
        in_specs=[pl.BlockSpec((8, lanes), lambda i: (i, 0)),
                  pl.BlockSpec((8, lanes), lambda i: (i, 0)),
                  pl.BlockSpec((8, 1), lambda i: (i, 0))],
        # every step maps to the SAME full-size block: the output stays
        # VMEM-resident across the sequential grid and flushes once
        # (+128 margin for the aligned-RMW store window)
        out_specs=pl.BlockSpec((1, out_cap + lanes + 128),
                               lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, out_cap + lanes + 128),
                                       jnp.int32),
        interpret=interpret,
    )


def decode_bytes_pallas_impl(tokens, n_tokens, bytes32, lentab,
                             out_cap: int, sw4: int):
    """Pallas decode: tokens i32[T] -> (bytes u8[out_cap], total).

    ONE row gather fetches each token's padded byte content ((T, SW4)
    int32 from ``bytes32``), and a Pallas kernel left-compacts each
    K-token block's lanes and stores them at the block's output offset —
    no per-output-byte gather at all (the XLA kernel's remaining cost;
    gathers run at ~70 M indices/s on v5e while this path's only
    random access is the T-row content gather).
    """
    import jax.numpy as jnp

    T = tokens.shape[0]
    # NB must be a multiple of 8 (the kernel packs 8 token-blocks per
    # grid step to satisfy Mosaic's (8, 128) block-divisibility rule)
    K = max(8, min(T // 8, 16384 // sw4))
    while T % (8 * K):
        K >>= 1
    NB = T // K
    LANES = K * sw4

    valid = jnp.arange(T, dtype=jnp.int32) < n_tokens
    tok = jnp.where(valid, tokens, 0)
    length = jnp.where(valid, lentab[tok], 0)
    out_off = jnp.cumsum(length) - length
    total = jnp.sum(length)

    content = bytes32[tok]                        # (T, SW4) int32 bytes
    jl = jnp.arange(sw4, dtype=jnp.int32)[None, :]
    live = valid[:, None] & (jl < length[:, None])

    base = out_off.reshape(NB, K)[:, 0]           # (NB,)
    rel = (out_off - jnp.repeat(base, K))[:, None] + jl
    lane_in_block = ((jnp.arange(T, dtype=jnp.int32) % K)[:, None]
                    * sw4 + jl)
    BIG = jnp.int32(1 << 30)
    gap = jnp.where(live, lane_in_block - rel, BIG)

    import jax
    interpret = jax.default_backend() == "cpu"
    out32 = _compact_store_fn(NB, LANES, out_cap, interpret)(
        content.reshape(NB, LANES), gap.reshape(NB, LANES),
        base.reshape(NB, 1))
    j = jnp.arange(out_cap, dtype=jnp.int32)
    out = jnp.where(j < total, out32[0, :out_cap] & 255, 0).astype(
        jnp.uint8)
    return out, total


@functools.lru_cache(maxsize=32)
def decode_bytes_pallas_fn(out_cap: int, sw4: int):
    import functools as ft
    import jax

    return jax.jit(ft.partial(decode_bytes_pallas_impl, out_cap=out_cap,
                              sw4=sw4))


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

        # Pallas-path tables: per-token padded byte content as int32
        # (one row gather per token) + lengths.  SW4 = pow2 slot width;
        # vocabs with tokens beyond 32 bytes use the XLA kernel instead.
        self._sw4 = None
        if self._max_len <= 32:
            sw4 = 4
            while sw4 < self._max_len:
                sw4 <<= 1
            offs = self._np_offsets
            n_ranks = len(offs) - 1
            lens = (offs[1:] - offs[:-1]).astype(np.int32)
            b32 = np.zeros((n_ranks, sw4), np.int32)
            flat = np.asarray(dt.flat)
            cols = np.arange(sw4)
            src = offs[:-1, None] + cols[None, :]
            ok = cols[None, :] < lens[:, None]
            b32[ok] = flat[src[ok]]
            self._sw4 = sw4
            self._bytes32 = jnp.asarray(b32)
            self._lentab = jnp.asarray(lens)

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
        from .pallas_stage1 import pallas_enabled
        use_pallas = self._sw4 is not None and pallas_enabled()
        parts = []
        for lo in range(0, ranks.size, self._cap):
            chunk = ranks[lo:lo + self._cap]
            cap = 256
            while cap < chunk.size:
                cap <<= 1
            buf = np.zeros(cap, dtype=np.int32)
            buf[:chunk.size] = chunk
            out_cap = self.out_cap_for(chunk)
            if use_pallas:
                fn = decode_bytes_pallas_fn(out_cap, self._sw4)
                out, total = fn(jnp.asarray(buf), chunk.size,
                                self._bytes32, self._lentab)
            else:
                fn = decode_bytes_fn(out_cap)
                out, total = fn(jnp.asarray(buf), chunk.size, self._flat,
                                self._offsets)
            parts.append(np.asarray(out)[:int(total)]
                         .astype(np.uint8).tobytes())
        return b"".join(parts)
