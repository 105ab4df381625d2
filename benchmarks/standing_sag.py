"""Standing-equilibrium sag adjudication: production solver vs qpOASES.

VERDICT r4 weak-item 7: the standing rollout settles at ~0.496 m instead of
the 0.55 m command -- a consequence the repo attributes to the reference's
9 kg mass quirk (ConvexMPCLocomotion.cpp uses mass 9.0 while the Gazebo
model weighs ~13 kg, so gravity feed-forward under-compensates and the
height-tracking term carries the deficit at a proportional offset).  That
attribution was asserted, never measured: nothing pinned what the
REFERENCE'S OWN solver settles at.

This harness measures it.  Same tier-1 standing scenario as BASELINE
config 1, three solver arms on the CPU backend:

  - ``riccati``  -- the pure-JAX stage-wise Riccati production equivalent
                    (kernel-vs-XLA equivalence <5e-5, PERF.md);
  - ``qpoases``  -- the reference's ACTUAL vendored qpOASES in the loop
                    (hector/qp/ref_check.qpoases_callback_solver, compiled
                    out-of-tree from the reference checkout), i.e. exactly
                    the per-period solve the reference robot runs
                    (SolverMPC.cpp:702-712);
  - ``polish``   -- the production solver driven to the exact optimum
                    (active-set polish, the 1e-3 N parity mode).

Reported: mean height over the settled tail (last third) of a ``seconds``
standing rollout per arm, plus pairwise deltas.  If the oracle arm sags to
the same height, the 0.496 m equilibrium is MEASURED reference parity --
the reference's Gazebo robot stands at the same deficit-offset height --
not an artifact of our solver.

    python -m benchmarks.standing_sag [--seconds 3.0]
        [--out perf/parts/standing_sag.json]

CPU-only (the qpOASES arm is a host callback); skips the oracle arm with a
note if the reference checkout is unavailable.
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np


def settled_height(solver: str, seconds: float = 3.0) -> dict:
    """Standing rollout (BASELINE config 1 scenario) under one solver arm;
    returns mean/min height over the settled tail (last third)."""
    from hector import runtime as RT
    from hector.plant import srb
    from hector.config import DEFAULT_CONFIG
    from benchmarks.lateral_sweep import _solver_cfg

    if solver == "riccati":
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, solver=dataclasses.replace(
                DEFAULT_CONFIG.solver, backend="riccati"))
    else:
        cfg = _solver_cfg(solver)

    n_periods = int(seconds / (cfg.plant.dt * cfg.mpc.mpc_cadence))
    plant = srb.init_plant_state(cfg)
    carry = RT.init_controller_carry(plant, cfg)
    roll = RT.make_rollout(n_periods, cfg=cfg, batched=False)
    _, _, diags = roll(carry, plant, RT.standing_command())
    h = np.asarray(diags["height"]).reshape(-1)
    tail = h[-(len(h) // 3):]
    return dict(solver=solver, seconds=seconds, periods=n_periods,
                mean_height_tail=float(tail.mean()),
                min_height_tail=float(tail.min()),
                std_height_tail=float(tail.std()),
                fallen=bool(np.asarray(diags["fallen"]).any()))


def run(seconds: float = 3.0, out: str | None = None) -> dict:
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hector.qp import ref_check

    assert jax.default_backend() == "cpu", (
        "standing_sag is a CPU harness (the qpOASES arm is a host "
        "callback)")

    arms = [settled_height("riccati", seconds),
            settled_height("polish", seconds)]
    if ref_check.qpoases_available():
        arms.append(settled_height("qpoases", seconds))
    rows = {a["solver"]: a for a in arms}
    target = 0.55
    rep = dict(
        config="standing_sag",
        command_height=target,
        arms=arms,
        sag_production_m=round(target - rows["riccati"]["mean_height_tail"], 5),
        note=("mean height over the settled tail of a standing rollout; "
              "'qpoases' is the reference's actual solver in the loop -- "
              "equal sag there makes the sub-target equilibrium measured "
              "reference parity (9 kg mass quirk), not a solver artifact"),
    )
    if "qpoases" in rows:
        rep["sag_oracle_m"] = round(
            target - rows["qpoases"]["mean_height_tail"], 5)
        rep["production_vs_oracle_m"] = round(
            rows["riccati"]["mean_height_tail"]
            - rows["qpoases"]["mean_height_tail"], 6)
    else:
        rep["oracle"] = "skipped: reference checkout unavailable"
    if out:
        with open(out, "w") as f:
            json.dump(rep, f, indent=1)
    print(json.dumps(rep), flush=True)
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--out", default="perf/parts/standing_sag.json")
    args = ap.parse_args()
    run(args.seconds, args.out)


if __name__ == "__main__":
    main()
