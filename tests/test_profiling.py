"""Profiling hooks: step timer semantics and the roofline cost model."""

import jax.numpy as jnp
import pytest

from hector.io import profiling as PF


def test_step_timer_records_phases():
    timer = PF.StepTimer()
    x = jnp.arange(8.0)
    with timer.phase("square", x * x):
        y = x * x
    out = timer.time_fn("sum", jnp.sum, y)
    assert float(out) == float(jnp.sum(x * x))
    s = timer.summary()
    assert set(s) == {"square", "sum"}
    assert s["sum"]["count"] == 1 and s["sum"]["mean_ms"] >= 0


def test_kernel_cost_model_scales():
    c14 = PF.riccati_kernel_cost(iterations=14)
    c28 = PF.riccati_kernel_cost(iterations=28)
    # flops scale with iterations; HBM bytes do not (VMEM-resident loop)
    assert c28.flops_per_solve == pytest.approx(2 * c14.flops_per_solve)
    assert c28.bytes_per_solve == c14.bytes_per_solve
    # the kernel is strongly compute-bound: intensity far beyond the ~5
    # flops/byte ridge point of any TPU generation
    assert c14.arithmetic_intensity > 100


def test_roofline_report_fields():
    rep = PF.roofline_report(measured_solves_per_s=450_000.0)
    assert rep["binding_resource"] == "compute(VPU)"
    assert 0 < rep["fraction_of_speed_of_light"] < 1
    assert rep["achieved_vpu_tflops"] < PF.V5E_VPU_F32_TFLOPS_EST
