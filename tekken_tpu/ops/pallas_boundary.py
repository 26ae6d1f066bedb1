"""Pallas enablement toggle for the fused device kernels.

The fused kernels themselves live in ops/pallas_stage1.py (boundary rules
+ piece geometry + word assembly + probe hash in one HBM sweep) and
ops/pallas_merge.py (one fused dispatch per merge round); this module
holds the shared default-on switch.

DEFAULT ON (round 3): unlike round 2's untested default-on (the Mosaic
crash in BENCH_r02), the Pallas path now (a) passes tools/tpu_smoke.py on
the live v5e (all variants, oracle parity), (b) measures faster than the
XLA path in interleaved same-session A/B (32.8 vs 29.4 MB/s, variance
<2%), and (c) is wrapped in the runtime loud-fallback (tekkenizer
encode_batch catches first-call compile failures and degrades to host
with a RuntimeWarning).  ``TEKKEN_TPU_PALLAS=0`` falls back to the plain
XLA formulations; on the CPU backend the kernels run in interpret mode
(tests).
"""

from __future__ import annotations

import os


def pallas_enabled() -> bool:
    return os.environ.get("TEKKEN_TPU_PALLAS", "1") != "0"
