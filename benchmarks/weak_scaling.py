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
import statistics
import sys
import time


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
                         fallen_count=float(m["fallen_count"])))
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

    rep = dict(config="weak_scaling_cpu_mesh", backend="cpu",
               per_device_batch=per_device_batch, n_periods=n_periods,
               rows=rows,
               sharded_pallas_interpret_2periods_ok=pallas_ok,
               note=("virtual CPU devices share host cores; shape only -- "
                     "ideal is flat time/step as devices grow"))
    print(json.dumps(rep), flush=True)
    return rep


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
