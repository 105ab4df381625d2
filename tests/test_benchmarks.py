"""Benchmark-harness smoke tests (CPU, tiny sizes).

The r2 round shipped 0-byte benchmark artifacts because the bench code
paths were only ever exercised on the TPU at full size.  These smoke the
same entry points at toy sizes so import errors, signature drift, and
DCE'd-measurement bugs fail in CI, not on the chip.
"""

import json

import numpy as np


def test_config1_standing_short():
    from benchmarks.configs import config1_standing

    m = config1_standing(seconds=0.1)
    assert m["passed"] and m["fallen_frac"] == 0.0


def test_config2_walking_chained_segments():
    from benchmarks.configs import config2_walking64

    m = config2_walking64(seconds=0.25, segment_periods=25)
    assert m["segments"] == 2
    assert m["fallen_frac"] == 0.0
    assert m["sim_seconds_per_wall_second"] > 0


def test_config5_scaling_single_row():
    from benchmarks.configs import config5_scaling

    m = config5_scaling(max_batch=512, chain_len=2)
    assert len(m["rows"]) == 1
    assert m["rows"][0]["solves_per_s"] > 0
    assert m["rows"][0]["throughput_vs_peak"] == 1.0


def test_latency_one_period_tiny():
    from benchmarks.latency import one_period_latency_ms

    raw, net = one_period_latency_ms(4, reps=3)
    assert raw > 0 and net >= 0 and net <= raw + 1e-6


def test_roofline_report_math():
    from hector.io.profiling import roofline_report

    rep = roofline_report(1e6, iterations=14)
    assert rep["bytes_per_solve"] > 0 and rep["flops_per_solve"] > 0
    assert 0 < rep["fraction_of_speed_of_light"] < 10


def test_perf_md_renders_committed_artifact():
    """PERF.md regenerates from the committed raw document."""
    import os
    from benchmarks import perf_md

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    doc = json.load(open(os.path.join(root, "perf", "PERF_r3.json")))
    weak = json.load(open(os.path.join(root, "perf", "parts",
                                       "weak_scaling.json")))
    text = perf_md.render(doc, weak, "PERF_r3.json")
    assert "solves/s/chip" in text and "Real-time budget" in text
    assert "NOT RECORDED" not in text        # every section has data
