"""Cycle accounting for the fused Riccati interior-point kernel.

Answers VERDICT r3 weak-item 1's second half: WHERE do the cycles of the
fused kernel go relative to the measured VPU speed-of-light?  Method:

1. time vs ITERATIONS (7/14/28 at fixed batch): linear fit separates the
   per-IP-iteration cost (slope) from the out-of-loop cost (intercept:
   problem load, init, solution store, dispatch);
2. time vs BATCH (1..64 tiles at fixed iterations): occupancy curve -- how
   many 1024-lane tiles the chip needs in flight to hide latencies;
3. op-mix anchor: the kernel's per-iteration work counted from the
   algorithm (FMA flops vs divide/rsqrt ops), priced at the MEASURED FMA
   and divide throughputs (benchmarks/vpu_peak.py) -- slow-path ops buy
   far fewer ops/s, which is where most of the "missing" fraction goes.

Run on the real chip:    python -m benchmarks.cycle_accounting
Prints one JSON document (also usable via record()).
"""

from __future__ import annotations

import json

import numpy as np


def _time_solver(sqp, scfg, q_diag, r_diag, chain_len: int = 16,
                 reps: int = 3) -> float:
    """Median seconds per batched solve, via the SHARED chained harness
    (benchmarks/roofline.py time_chained_solver -- one implementation of
    the bench.py discipline for both reports)."""
    from hector.qp import pallas_riccati
    from benchmarks.roofline import time_chained_solver

    solver = lambda s: pallas_riccati.solve_batched(
        s, scfg, q_diag=q_diag, r_diag=r_diag)
    return time_chained_solver(sqp, solver, chain_len, reps)


def op_mix(iterations: int = 14, h: int = 10, nu: int = 12, nc: int = 16,
           nx: int = 13) -> dict:
    """Per-scenario per-solve op counts by VPU path, counted from the
    kernel's loops (hector/qp/pallas_riccati.py):

    - slow path (divide / rsqrt, ~1 op per VPU issue at div throughput):
      Cholesky: nu rsqrt + nu*(nu-1)/2 col divides per stage; barrier
      reciprocals: 12 lower + 8 upper per stage (the one-sided row
      specialization -- only rows whose bound side can be finite carry
      slack state); dual step ratios: 12 + 8 per stage (the primal step
      reuses the barrier reciprocals: ~2 divides per TILE per iteration,
      negligible per scenario).
    - FMA path: everything counted by riccati_kernel_cost.
    """
    chol_div = nu + nu * (nu - 1) // 2          # 12 rsqrt + 66 div
    barrier_div = 12 + 8                        # inv_s per one-sided row
    step_div = 12 + 8                           # dual ratio divides
    slow_per_stage = chol_div + barrier_div + step_div
    slow_ops = float(iterations * h * slow_per_stage)
    from hector.io.profiling import riccati_kernel_cost
    cost = riccati_kernel_cost(iterations)
    return dict(slow_ops_per_solve=slow_ops,
                fma_flops_per_solve=cost.flops_per_solve,
                bytes_per_solve=cost.bytes_per_solve)


def record() -> dict:
    from benchmarks.roofline import nominal_problem
    from benchmarks.vpu_peak import measure as measure_peaks
    import dataclasses

    peaks = measure_peaks()

    base_batch = 16384
    sqp, CFG = nominal_problem(base_batch)
    q_diag = tuple(CFG.mpc.weights) + (0.0,)
    r_diag = tuple(CFG.mpc.alpha)

    # --- 1. time vs iterations ---
    # chain_for: amortize the tunneled-dispatch floor below ~3% so the
    # slope/intercept fit prices DEVICE time, not tunnel round-trips
    # (with chain 16 the floor added ~1.6 ms to the intercept)
    from benchmarks.roofline import chain_for
    iter_rows = []
    for it in (7, 14, 28):
        scfg = dataclasses.replace(CFG.solver, iterations=it)
        dt = _time_solver(sqp, scfg, q_diag, r_diag,
                          chain_len=chain_for(base_batch))
        iter_rows.append(dict(iterations=it, seconds_per_solve=dt,
                              solves_per_s=base_batch / dt))
    its = np.array([r["iterations"] for r in iter_rows], float)
    ts = np.array([r["seconds_per_solve"] for r in iter_rows], float)
    slope, intercept = np.polyfit(its, ts, 1)

    # --- 2. time vs batch (occupancy) ---
    batch_rows = []
    for batch in (1024, 4096, 16384, 65536):
        s, _ = nominal_problem(batch)
        cl = chain_for(batch)
        dt = _time_solver(s, CFG.solver, q_diag, r_diag, chain_len=cl)
        batch_rows.append(dict(batch=batch, chain_len=cl,
                               solves_per_s=batch / dt))

    # --- 3. op-mix pricing at measured throughputs ---
    mix = op_mix(CFG.solver.iterations)
    fma_peak = peaks["vpu_f32_tflops"] * 1e12        # flops/s
    div_peak = peaks["vpu_f32_div_gops"] * 1e9       # divides/s
    t_fma = mix["fma_flops_per_solve"] / fma_peak
    t_slow = mix["slow_ops_per_solve"] / div_peak
    t_bw = mix["bytes_per_solve"] / (peaks["hbm_gbps"] * 1e9)
    best = max(r["solves_per_s"] for r in batch_rows)
    t_meas = 1.0 / best
    return dict(
        peaks=peaks,
        iteration_scaling=dict(
            rows=iter_rows,
            per_iteration_s=slope,
            out_of_loop_s=intercept,
            loop_fraction_at_14=14 * slope / (14 * slope + intercept)),
        occupancy=batch_rows,
        op_mix_pricing=dict(
            **mix,
            t_fma_s=t_fma, t_slow_s=t_slow, t_hbm_s=t_bw,
            t_priced_total_s=t_fma + t_slow,
            t_measured_s=t_meas,
            fma_only_fraction=t_fma / t_meas,
            priced_fraction=(t_fma + t_slow) / t_meas),
        note="priced_fraction = (FMA time + slow-path time) / measured: "
             "the share of measured cycles the op-mix model accounts for; "
             "the remainder is selects/compares/copies and loop overhead")


def main():
    try:
        from benchmarks._cache import enable_cache
        enable_cache()
    except Exception:
        pass
    doc = record()
    print(json.dumps(doc, default=float), flush=True)


if __name__ == "__main__":
    main()
