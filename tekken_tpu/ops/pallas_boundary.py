"""Fused Pallas boundary kernel for simple ASCII batches.

The scan-free boundary rules (pretokenize._char_boundaries_simple) are
~40 elementwise/shift passes; as separate XLA ops each pass is
launch-latency-bound (CLAUDE.md round-2 measurements).  This kernel runs
the SAME rule function — shape-generic over the last axis — inside one
``pl.pallas_call``: each grid step loads a block of document rows into
VMEM, evaluates every rule in registers, and writes the flags once.  One
HBM sweep instead of dozens.

Rows are independent (pieces never cross documents), so blocks need no
halo.  On the CPU backend the kernel runs in interpret mode (tests);
``TEKKEN_TPU_PALLAS=1`` opts in on device.

DEFAULT OFF on device: round 2 shipped this default-on without a single
real-TPU compile and the driver bench crashed with a Mosaic internal
assert (``in_bounds_vreg.getType() == native_vreg_ty`` — BENCH_r02.json,
VERDICT.md weak #1).  The kernel must pass tools/tpu_smoke.py on the live
device before the default can flip back.
"""

from __future__ import annotations

import functools
import os


def pallas_enabled() -> bool:
    return os.environ.get("TEKKEN_TPU_PALLAS", "0") == "1"


def _kernel(byts_ref, len_ref, out_ref):
    """All int32 in/out: Mosaic's vreg-layout assert rejects uint8
    arithmetic, uint8 casts, and bool concatenates at (8, n) block shapes
    (bisected on v5e, round 3 — the BENCH_r02 crash)."""
    import jax
    import jax.numpy as jnp

    from .pretokenize import _char_boundaries_simple, ascii_classes_arith

    b = byts_ref[...]                       # (RB, R) int32
    L = len_ref[...]                        # (RB, 1) int32
    idx = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    valid = idx < L
    pk = ascii_classes_arith(b, out_dtype=jnp.int32)
    flags = _char_boundaries_simple(b, valid, pk)
    out_ref[...] = flags.astype(jnp.int32)


@functools.lru_cache(maxsize=8)
def _boundary_fn(B: int, R: int, RB: int, interpret: bool):
    import jax
    from jax.experimental import pallas as pl

    return pl.pallas_call(
        _kernel,
        grid=(B // RB,),
        in_specs=[pl.BlockSpec((RB, R), lambda i: (i, 0)),
                  pl.BlockSpec((RB, 1), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((RB, R), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, R), jax.numpy.int32),
        interpret=interpret,
    )


def boundary_simple_pallas(byts, lengths):
    """(B, R) uint8 + (B,) int32 -> (B, R) int32 piece-start flags (simple
    ASCII rule set), fused into one Pallas kernel."""
    import jax
    import jax.numpy as jnp

    B, R = byts.shape
    RB = 8 if B % 8 == 0 else 1
    interpret = jax.default_backend() == "cpu"
    return _boundary_fn(B, R, RB, interpret)(
        byts.astype(jnp.int32), lengths.reshape(B, 1))
