"""Device-mesh helpers for data-parallel scale-out.

The reference has no parallelism (SURVEY.md section 2.3); the north star
mandates: device mesh over a pod slice, merge table replicated in HBM,
corpus shards data-parallel, counters reduced via psum over ICI.
"""

from __future__ import annotations

from typing import Optional


def make_dp_mesh(n_devices: Optional[int] = None, devices=None):
    """Build a 1-D data-parallel mesh over ``n_devices`` (default: all)."""
    import jax

    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), ("dp",), devices=devices)


def replicated(mesh, arr):
    """Place an array fully replicated over the mesh (the merge/rank tables
    are broadcast once and live in every chip's HBM)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(arr, NamedSharding(mesh, P()))


def dp_sharded(mesh, arr):
    """Shard the leading (document/batch) axis over the dp mesh axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P("dp", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
