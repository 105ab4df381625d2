"""Weak-scaling shape on the virtual CPU mesh (VERDICT r2 item 7).

Real multi-chip hardware is not available in this environment (one v5e chip
behind a tunnel), so the *shape* of multi-device scaling is recorded on an
8-device virtual CPU mesh: the sharded closed-loop rollout
(hector.parallel.make_sharded_rollout -- shard_map over a ('data',) mesh
with psum/pmax metric reductions) at FIXED per-device batch for 1/2/4/8
devices.  Ideal weak scaling = flat time per step as devices grow; the
efficiency column is t(1)/t(n).  CPU devices share the host's cores, so
the curve is a lower bound on what ICI-connected chips would show -- the
point is that the collective/sharding machinery adds no super-linear cost.

Also runs the fused Pallas kernel (interpret mode) through the same sharded
rollout for >= 2 periods, standing in for the production TPU kernel under
sharding.

    JAX_PLATFORMS=cpu python -m benchmarks.weak_scaling [per_device_batch]

Prints one JSON object.  Anchor: SURVEY.md §2.4 (scenario DP over
ICI/DCN).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import statistics
import sys
import time

# Collective-traffic accounting (VERDICT r4 weak-item 4): parse the
# COMPILED sharded program's HLO for cross-device collectives and price
# their byte volume.  The whole-step shard_map design reduces only scalar
# metrics across the mesh (parallel.py make_sharded_rollout psum/pmax), so
# the per-step collective volume should be O(10 B) and INDEPENDENT of both
# device count and per-device batch -- that, not the core-contended virtual
# timing curve, is the quantitative weak-scaling claim: on real ICI
# (~1e11 B/s per v5e link) the collective time is O(ns) against a
# multi-ms compute step, so scaling is compute-bound by construction.
_COLL_RE = re.compile(
    r"=\s*(\w+)\[([\d,]*)\][^\n=]*?\b"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"\b")
_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1}


def collective_stats(compiled_text: str) -> dict:
    """Count collective ops and their payload bytes in compiled HLO."""
    counts: dict[str, int] = {}
    total_bytes = 0
    for dtype, dims, op in _COLL_RE.findall(compiled_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        counts[op] = counts.get(op, 0) + 1
        total_bytes += n * _DTYPE_BYTES.get(dtype, 4)
    return dict(ops=counts, payload_bytes_per_step=total_bytes)


def _setup_cpu_mesh():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")


def main(per_device_batch: int = 64, n_periods: int = 5, reps: int = 3):
    _setup_cpu_mesh()
    import jax
    from benchmarks._cache import enable_cache
    enable_cache()
    import jax.numpy as jnp
    from hector import parallel as PL
    from hector.config import DEFAULT_CONFIG

    assert jax.default_backend() == "cpu" and jax.device_count() >= 8

    rows = []
    for n_dev in (1, 2, 4, 8):
        mesh = PL.data_mesh(n_dev)
        batch = per_device_batch * n_dev
        carry, plant, cmd = PL.make_batch(batch, cfg=DEFAULT_CONFIG,
                                          mesh=mesh)
        roll = PL.make_sharded_rollout(n_periods, mesh, DEFAULT_CONFIG)
        compiled = roll.lower(carry, plant, cmd).compile()
        coll = collective_stats(compiled.as_text())
        c, p, m = roll(carry, plant, cmd)          # compile (excluded)
        float(m["mean_height"])
        times = []
        for _ in range(reps):
            carry, plant = c, p                    # dependency-chain
            t0 = time.perf_counter()
            c, p, m = roll(carry, plant, cmd)
            float(m["mean_height"])                # value fetch
            times.append(time.perf_counter() - t0)
        dt = statistics.median(times)
        rows.append(dict(devices=n_dev, batch=batch, time_s=round(dt, 4),
                         solves_per_s=batch * n_periods / dt,
                         fallen_count=float(m["fallen_count"]),
                         collectives=coll))
    t1 = rows[0]["time_s"]
    for r in rows:
        r["weak_scaling_efficiency"] = round(t1 / r["time_s"], 3)

    # production kernel (interpret) through the same sharded path
    cfg_p = dataclasses.replace(
        DEFAULT_CONFIG,
        solver=dataclasses.replace(DEFAULT_CONFIG.solver,
                                   backend="riccati_pallas_interpret"))
    mesh = PL.data_mesh(8)
    carry, plant, cmd = PL.make_batch(16, cfg=cfg_p, mesh=mesh)
    roll_p = PL.make_sharded_rollout(2, mesh, cfg_p)
    c, p, m = roll_p(carry, plant, cmd)
    pallas_ok = bool(jnp.isfinite(m["mean_height"])
                     and m["fallen_count"] == 0.0)

    # the real weak-scaling prediction: collective payload vs ICI
    v5e_ici_bytes_per_s = 4.5e10          # one v5e ICI link, each direction
    worst = max(r["collectives"]["payload_bytes_per_step"] for r in rows)
    rep = dict(config="weak_scaling_cpu_mesh", backend="cpu",
               per_device_batch=per_device_batch, n_periods=n_periods,
               rows=rows,
               sharded_pallas_interpret_2periods_ok=pallas_ok,
               collective_payload_bytes_max=worst,
               predicted_ici_time_s=worst / v5e_ici_bytes_per_s,
               note=("virtual CPU devices share host cores, so the timing "
                     "curve is core contention, not interconnect; the "
                     "compiled-HLO collective accounting is the real "
                     "claim: per-step cross-device traffic is scalar "
                     "metric reductions only, O(10 B), independent of "
                     "device count -- O(ns) on real ICI against a "
                     "multi-ms compute step"))
    print(json.dumps(rep), flush=True)
    return rep


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
