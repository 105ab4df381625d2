"""Profiling hooks: step timers, device traces, kernel roofline accounting.

The reference's instrumentation is a CLOCK_MONOTONIC Timer printf'd in the
hot loops (include/common/Utilities/Timer.h:15-48 wrapping the QP solve at
SolverMPC.cpp:699,717 and the MPC update at ConvexMPCLocomotion.cpp:413-416).
TPU equivalent (SURVEY.md §5): `jax.profiler` traces for kernel-level views,
a fetch-synchronized phase timer for step-level accounting (on an async
runtime, wall-clocking an un-synced dispatch measures nothing), and an
analytic bytes/FLOPs model of the fused Riccati kernel for
roofline/speed-of-light reporting (BASELINE requires profiled kernels).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, List

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Step timing


class StepTimer:
    """Named-phase wall timer with device synchronization.

    Every stop() blocks on the phase's outputs (block_until_ready), so a
    phase's time includes its device work -- the analog of the reference's
    Timer around the qpOASES solve, but honest under async dispatch.

        timer = StepTimer()
        with timer.phase("plan", out := plan(carry, plant, cmd)):
            pass                    # context exit syncs on `out`
        timer.summary()  # {"plan": {"mean_ms": ..., "count": ...}, ...}
    """

    def __init__(self):
        self._samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str, *sync_on):
        t0 = time.perf_counter()
        yield
        for obj in sync_on:
            jax.block_until_ready(obj)
        self._samples.setdefault(name, []).append(time.perf_counter() - t0)

    def time_fn(self, name: str, fn, *args, **kwargs):
        """Run fn, sync on its outputs, record; returns the outputs."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self._samples.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: dict(mean_ms=1e3 * float(np.mean(s)),
                       p50_ms=1e3 * float(np.median(s)),
                       max_ms=1e3 * float(np.max(s)),
                       count=len(s))
            for name, s in self._samples.items()
        }


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with tensorboard/xprof.

    The kernel-level replacement for the reference's printf telemetry."""
    with jax.profiler.trace(logdir):
        yield


# ---------------------------------------------------------------------------
# Roofline model of the fused Riccati interior-point kernel
# (hector/qp/pallas_riccati.py).  Counts are analytic, from the kernel's
# algorithm structure; dims from the Hector QP family (SolverMPC.cpp):
# h=10 stages, nx=13, nu=12, nc=16 rows/stage.


@dataclasses.dataclass(frozen=True)
class KernelCost:
    bytes_per_solve: float     # HBM traffic (problem read + solution write)
    flops_per_solve: float     # VPU f32 flops
    arithmetic_intensity: float


def riccati_kernel_cost(iterations: int = 14, h: int = 10, nx: int = 13,
                        nu: int = 12, nc: int = 16) -> KernelCost:
    """Per-scenario cost of one fused interior-point solve.

    HBM bytes: the kernel is VMEM-resident; traffic is one problem-data read
    (StageQPData: structure blocks s69 (54) + b69 (54) + scalars (~8) +
    C rows (nc*nu sparse -> 40 stored) + per-stage masks/bounds
    h*(nu + 2*nc) + x0 (nx) + xd (h*nx)) and one solution write
    (h*nu + diagnostics 3), float32.

    FLOPs (per interior-point iteration, per scenario, counted from the
    kernel's stage loops):
      - residual/rollout passes: ~4 sweeps of h stages of A x (+~60 madds
        sparse) and B u (~72 madds) and C u / C^T y (~80 madds sparse)
      - backward Riccati sweep: per stage, form Re (nu^2 * nx madds
        structure-reduced ~ nu^2*6), Cholesky nu^3/3, two triangular solves
        nu^3 (W formation dominates: nu^2 * nx), W^T W rank-nx update nu^2*nx
      - forward rollout + line search + iterate updates: ~h*(nc*8 + nu*6)
    The dominant stage term is ~(nu^3/3 + 2*nu^2*nx + nu^2*6) ~ 2700 madds
    -> ~5400 flops/stage; plus ~1500 flops/stage of sweeps/updates.
    """
    problem_floats = (54 + 54 + 8 + 40 + h * (nu + 2 * nc) + nx + h * nx)
    solution_floats = h * nu + 3
    bytes_per_solve = 4.0 * (problem_floats + solution_floats)

    stage_factor = (nu ** 3 / 3 + 2 * nu ** 2 * nx + 6 * nu ** 2) * 2
    sweep_flops = (60 + 72 + 80) * 2 * 4          # 4 passes/iter, madds*2
    misc = (nc * 8 + nu * 6) * 2
    flops_per_iter = h * (stage_factor + sweep_flops + misc)
    flops = float(iterations * flops_per_iter)
    return KernelCost(
        bytes_per_solve=bytes_per_solve,
        flops_per_solve=flops,
        arithmetic_intensity=flops / bytes_per_solve)


# v5e single-chip peaks.  HBM BW and bf16 MXU are published (819 GB/s,
# 197 TFLOP/s); the f32 VPU peak is not published -- 4 TFLOP/s is the
# conventional estimate (8x128 lanes x ~4 ALUs x 2 flops x ~1 GHz) and is
# labeled as such in reports.
V5E_HBM_GBPS = 819.0
V5E_VPU_F32_TFLOPS_EST = 4.0


def roofline_report(measured_solves_per_s: float,
                    iterations: int = 14,
                    hbm_gbps: float = V5E_HBM_GBPS,
                    vpu_tflops: float = V5E_VPU_F32_TFLOPS_EST,
                    peaks_measured: bool = False) -> dict:
    """Speed-of-light comparison for the fused solve kernel.

    peaks_measured=True marks hbm_gbps / vpu_tflops as MEASURED on this
    chip (benchmarks/vpu_peak.py microbenchmarks) rather than the analytic
    estimates above; the emitted key names and note say which."""
    cost = riccati_kernel_cost(iterations)
    sol_bw = hbm_gbps * 1e9 / cost.bytes_per_solve
    sol_compute = vpu_tflops * 1e12 / cost.flops_per_solve
    bound = "compute(VPU)" if sol_compute < sol_bw else "bandwidth(HBM)"
    sol = min(sol_bw, sol_compute)
    compute_key = ("speed_of_light_compute_measured" if peaks_measured
                   else "speed_of_light_compute_est")
    rep = dict(
        measured_solves_per_s=measured_solves_per_s,
        bytes_per_solve=cost.bytes_per_solve,
        flops_per_solve=cost.flops_per_solve,
        arithmetic_intensity=round(cost.arithmetic_intensity, 1),
        speed_of_light_bandwidth=sol_bw,
        binding_resource=bound,
        fraction_of_speed_of_light=measured_solves_per_s / sol,
        achieved_hbm_gbps=measured_solves_per_s * cost.bytes_per_solve / 1e9,
        achieved_vpu_tflops=measured_solves_per_s * cost.flops_per_solve
        / 1e12,
        vpu_peak_tflops=vpu_tflops,
        hbm_peak_gbps=hbm_gbps,
        note=("peaks MEASURED on this chip (benchmarks/vpu_peak.py); MXU "
              "is idle by design (per-lane matrices share no operands)"
              if peaks_measured else
              "VPU f32 peak is an estimate; MXU is idle by design "
              "(per-lane matrices share no operands)"))
    rep[compute_key] = sol_compute
    return rep
