"""Scaling report + timing meter utilities."""

import time

import pytest

from tekken_tpu.models import build_synthetic_tokenizer
from tekken_tpu.utils.timing import Meter, StageTimer


def test_meter():
    m = Meter()
    with m.measure(n_bytes=1000, n_tokens=100):
        time.sleep(0.01)
    assert m.bytes_total == 1000
    assert m.tokens_total == 100
    assert m.seconds >= 0.01
    assert m.bytes_per_sec > 0
    s = m.summary()
    assert s["bytes"] == 1000 and s["tokens"] == 100


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.005)
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep and "total" in rep


@pytest.mark.slow
def test_measure_scaling_virtual_devices():
    import jax
    from tekken_tpu.parallel.scaling import measure_scaling

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    tok = build_synthetic_tokenizer(num_merges=200)
    report = measure_scaling(tok, device_counts=[1, 2],
                             rows_per_device=4, row_len=256, iters=2)
    assert len(report.points) == 2
    assert report.points[0].n_devices == 1
    assert report.points[1].n_devices == 2
    assert report.points[0].total_bytes > 0
    summ = report.summary()
    assert "scaling_efficiency" in summ


def test_measure_dp_overhead_virtual_devices():
    """The fixed-total-work dp-overhead sweep runs on a virtual mesh and
    produces sane ratios (MULTICHIP_SCALE.json's metric)."""
    from tekken_tpu.models import build_synthetic_tokenizer
    from tekken_tpu.parallel.scaling import measure_dp_overhead

    tok = build_synthetic_tokenizer(num_merges=200)
    out = measure_dp_overhead(tok, device_counts=[1, 2], rows=8,
                              row_len=256, iters=1, repeats=2)
    assert out["total_bytes"] > 0
    assert len(out["points"]) == 2
    assert out["points"][0]["overhead_ratio_vs_single"] == 1.0
    assert out["max_overhead_ratio"] > 0
