"""Benchmark-harness smoke tests (CPU, tiny sizes).

The r2 round shipped 0-byte benchmark artifacts because the bench code
paths were only ever exercised on the TPU at full size.  These smoke the
same entry points at toy sizes so import errors, signature drift, and
DCE'd-measurement bugs fail in CI, not on the chip.
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow


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


def test_vpu_peak_microbenchmarks_tiny():
    """The peak-measurement kernels run and return sane positive numbers
    (CPU: values are meaningless, shapes/paths are what's under test)."""
    from benchmarks import vpu_peak

    r = vpu_peak.measure_vpu_f32(n=1 << 12, k=8, outer=2)
    assert r["vpu_f32_tflops"] > 0
    r = vpu_peak.measure_vpu_div(n=1 << 12, k=8, outer=2)
    assert r["vpu_f32_div_gops"] > 0
    r = vpu_peak.measure_hbm_bw(n=1 << 14, outer=2)
    assert r["hbm_gbps"] > 0


def test_roofline_report_measured_peaks_labeling():
    from hector.io.profiling import roofline_report

    rep = roofline_report(1e6, iterations=14, hbm_gbps=700.0,
                          vpu_tflops=2.5, peaks_measured=True)
    assert "speed_of_light_compute_measured" in rep
    assert "speed_of_light_compute_est" not in rep
    assert rep["vpu_peak_tflops"] == 2.5
    assert "MEASURED" in rep["note"]


def test_cycle_accounting_op_mix():
    from benchmarks.cycle_accounting import op_mix

    m = op_mix(14)
    assert m["slow_ops_per_solve"] > 0
    assert m["fma_flops_per_solve"] > m["slow_ops_per_solve"]


def test_lateral_sweep_one_lane_short():
    """The sweep harness end to end at toy size: 1 variant x 1 vy,
    20 periods."""
    from benchmarks.lateral_sweep import sweep

    rows = sweep(n_substeps=2, periods=20, variants=[("base", {})],
                 vys=[0.1])
    assert len(rows) == 1
    r = rows[0]
    assert r["fell"] in (False, True) and r["min_height"] > 0
    assert r["solver"] == "default"


def test_multihost_scaling_single_process_row():
    """The 1-process row of the DCN scaling harness (the 2-process row is
    exercised by tests/test_multihost.py's coordinator path)."""
    from benchmarks.multihost_scaling import run_row

    row = run_row(nproc=1, pdb=8, n_periods=2)
    assert row["processes"] == 1 and row["global_devices"] == 2
    assert row["closed_loop_solves_per_s"] > 0
    assert row["fallen"] == 0.0


def test_standing_sag_production_vs_oracle():
    """Standing-sag adjudication (VERDICT r4 weak-item 7): the sub-target
    standing equilibrium (~0.496 m vs the 0.55 m command, the reference's
    9 kg mass quirk) must be MEASURED parity with the reference's own
    solver, not an artifact of ours: qpOASES in the loop settles at the
    same height as the production-equivalent Riccati arm."""
    from hector.qp import ref_check
    from benchmarks.standing_sag import settled_height

    prod = settled_height("riccati", seconds=1.5)
    assert not prod["fallen"]
    # sags below the command but stands (the documented quirk)
    assert 0.42 < prod["mean_height_tail"] < 0.53

    if not ref_check.qpoases_available():
        pytest.skip("reference qpOASES checkout unavailable")
    oracle = settled_height("qpoases", seconds=1.5)
    assert not oracle["fallen"]
    assert abs(prod["mean_height_tail"] - oracle["mean_height_tail"]) < 5e-3


def test_weak_scaling_collective_accounting():
    """The compiled sharded step's cross-device traffic is scalar metric
    reductions only: a handful of all-reduces, O(10 B) payload,
    independent of batch (VERDICT r4 weak-item 4 artifact)."""
    import jax
    from benchmarks.weak_scaling import collective_stats
    from hector import parallel as PL
    from hector.config import DEFAULT_CONFIG

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device (virtual) mesh")
    mesh = PL.data_mesh(2)
    stats = []
    for pdb in (4, 8):
        carry, plant, cmd = PL.make_batch(2 * pdb, cfg=DEFAULT_CONFIG,
                                          mesh=mesh)
        roll = PL.make_sharded_rollout(1, mesh, DEFAULT_CONFIG)
        txt = roll.lower(carry, plant, cmd).compile().as_text()
        stats.append(collective_stats(txt))
    for s in stats:
        assert sum(s["ops"].values()) >= 1            # psum/pmax present
        assert 0 < s["payload_bytes_per_step"] <= 64  # scalars only
    # volume independent of per-device batch
    assert (stats[0]["payload_bytes_per_step"]
            == stats[1]["payload_bytes_per_step"])


def test_campaign_toy_with_resume(tmp_path):
    """Config-5 campaign harness end to end at toy size: wave streaming
    through the native host pipeline, mid-campaign orbax checkpoint and a
    REAL restore-from-disk resume, JSONL health metrics."""
    from benchmarks.campaign import run_campaign

    out = tmp_path / "campaign.json"
    jsonl = tmp_path / "campaign.jsonl"
    rep = run_campaign(batch=4, waves=2, periods=2, checkpoint_after=1,
                       out=str(out), jsonl=str(jsonl))
    assert rep["total_scenarios"] == 8
    assert rep["total_solves"] == 16
    assert rep["resume"] and rep["resume"]["checkpoint_step"] == 1
    assert rep["fallen_lanes_total"] == 0
    assert out.exists() and len(jsonl.read_text().splitlines()) == 2
