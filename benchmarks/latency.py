"""Real-time-budget report: per-dispatch latency of ONE MPC period vs batch.

BASELINE demands ~1 kHz whole-body / ~500 Hz MPC *per scenario* alongside
throughput.  Amortized throughput (chained scans) hides dispatch latency;
this report measures the wall time of a SINGLE dispatch of one MPC period
(5 control ticks, one 200 Hz QP solve -- the reference's
``iterationCounter % 5`` cadence, ConvexMPCLocomotion.cpp:277) across batch
sizes, and finds the largest batch that still fits the 5 ms period budget.

Because a single dispatch on the tunneled TPU runtime pays a fixed
host->device round-trip, the report also measures that floor with a trivial
jitted program and reports both raw and net-of-overhead latency: the NET
number is what a locally-attached (non-tunneled) chip would see; the RAW
number is this runtime's end-to-end reality.

    python -m benchmarks.latency [max_batch]

Prints one JSON object.  Anchors: main.cpp:30 (1 kHz loop),
SolverMPC.cpp:717 (the reference's per-solve printf timing).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BUDGET_MS = 5.0     # one MPC period of sim time (200 Hz MPC, 1 kHz WBC)


def _trivial():
    """A near-empty jitted program, fetch-synced: one sample of the
    dispatch+fetch floor."""
    f = jax.jit(lambda x: x + 1.0)
    x = f(jnp.zeros((8,), jnp.float32))
    float(x[0])

    def sample():
        t0 = time.perf_counter()
        y = f(x)
        float(y[0])
        return time.perf_counter() - t0

    return sample


def one_period_latency_ms(batch: int, reps: int = 20):
    """(raw_ms, net_ms): single-dispatch wall time of one closed-loop MPC
    period (5 ticks, one QP solve) at the given batch, dependency-chained
    and value-fetch-synced.  The tunnel's dispatch floor drifts by several
    ms between sessions, so the net column uses PAIRED differencing: each
    rep times a trivial dispatch immediately before the measured one and
    subtracts, killing the drift."""
    from hector import runtime as RT, parallel as PAR
    from hector.config import DEFAULT_CONFIG as CFG

    overhead = _trivial()
    carry, plant, cmd = PAR.make_batch(batch, cfg=CFG)
    roll = RT.make_rollout(1, cfg=CFG, batched=True)
    c, p, d = roll(carry, plant, cmd)          # compile (excluded)
    float(jnp.sum(d["height"]))
    raw, net = [], []
    for _ in range(reps):
        t_floor = overhead()
        t0 = time.perf_counter()
        c, p, d = roll(c, p, cmd)              # chained through (c, p)
        float(jnp.sum(d["height"]))            # value fetch
        dt = time.perf_counter() - t0
        raw.append(dt)
        net.append(dt - t_floor)
    return (1e3 * statistics.median(raw),
            max(0.0, 1e3 * statistics.median(net)))


def k_period_latency_ms(batch: int, k: int, reps: int = 10):
    """Amortized real-time serving row (VERDICT r4 item 3): ONE dispatch
    executes K device-resident MPC periods (the rollout already scans
    periods, runtime.make_rollout), then one value fetch.  The per-period
    end-to-end cost (dispatch + K periods + fetch)/K is what a serving
    deployment pays when it batches K control periods per round-trip --
    no dispatch-floor subtraction needed."""
    from hector import runtime as RT, parallel as PAR
    from hector.config import DEFAULT_CONFIG as CFG

    carry, plant, cmd = PAR.make_batch(batch, cfg=CFG)
    roll = RT.make_rollout(k, cfg=CFG, batched=True)
    c, p, d = roll(carry, plant, cmd)          # compile (excluded)
    float(jnp.sum(d["height"]))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c, p, d = roll(c, p, cmd)              # chained through (c, p)
        float(jnp.sum(d["height"]))            # value fetch
        times.append(time.perf_counter() - t0)
    total_ms = 1e3 * statistics.median(times)
    return total_ms, total_ms / k


def main(max_batch: int = 16384):
    from benchmarks._cache import enable_cache
    enable_cache()
    overhead = _trivial()
    floor = 1e3 * statistics.median([overhead() for _ in range(20)])
    rows = []
    batch = 64
    while batch <= max_batch:
        lat, net = one_period_latency_ms(batch)
        rows.append(dict(batch=batch, latency_ms=round(lat, 3),
                         net_ms=round(net, 3),
                         meets_budget=bool(lat <= BUDGET_MS),
                         meets_budget_net=bool(net <= BUDGET_MS)))
        batch *= 4
    fit = [r["batch"] for r in rows if r["meets_budget"]]
    fit_net = [r["batch"] for r in rows if r["meets_budget_net"]]
    # floor variance: the tunnel floor has been observed anywhere from
    # ~25 ms (r4 session) to ~215 ms (r5 session); record the spread so
    # the raw rows can be read against the session's actual floor
    floor_samples = sorted(1e3 * overhead() for _ in range(10))
    # K=512 exists to show the serving recipe absorbs even a degraded
    # (~200 ms) tunnel: floor/512 < 0.5 ms against the 5 ms budget
    k_rows = []
    for k in (8, 32, 128, 512):
        total, per = k_period_latency_ms(4096, k)
        k_rows.append(dict(batch=4096, k_periods=k,
                           dispatch_total_ms=round(total, 3),
                           per_period_ms=round(per, 3),
                           meets_budget=bool(per <= BUDGET_MS)))
    serving = [r for r in k_rows if r["meets_budget"]]
    rep = dict(config="latency", budget_ms=BUDGET_MS,
               dispatch_overhead_ms=round(floor, 3),
               dispatch_overhead_spread_ms=dict(
                   min=round(floor_samples[0], 3),
                   median=round(floor_samples[len(floor_samples) // 2], 3),
                   max=round(floor_samples[-1], 3)),
               backend=jax.default_backend(), rows=rows,
               max_batch_within_budget=max(fit) if fit else 0,
               max_batch_within_budget_net=max(fit_net) if fit_net else 0,
               k_period_rows=k_rows,
               min_k_meeting_budget_end_to_end=(
                   min(r["k_periods"] for r in serving) if serving else 0))
    print(json.dumps(rep), flush=True)
    return rep


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
