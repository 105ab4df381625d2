"""TPU confirmation of the literal qpOASES parity bar on the fused kernel.

Two phases (VERDICT r4 item 1 "TPU-confirmed"):

  --prepare <npz>   (CPU, x64): build the golden + operating-envelope
                    scenario battery, solve each with the REFERENCE's
                    vendored qpOASES (hector/qp/ref_check.py), and store
                    the float32 stage-form QP arrays + reference
                    solutions.
  --check <npz>     (real TPU): run the fused Pallas Riccati kernel with
                    the active-set polish (SolverConfig.polish_rounds=8)
                    on the stored problems THROUGH THE REAL pallas_call
                    path and report max |u - qpOASES| -- the bar is
                    1e-3 N.  Writes perf/parts/kernel_polish_tpu.json.

    python -m benchmarks.kernel_polish_check --prepare /tmp/kp.npz
    python -m benchmarks.kernel_polish_check --check /tmp/kp.npz
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def prepare(path: str, n_fresh: int = 24):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from hector import kinematics as K
    from hector import math as HM
    from hector.config import MPCConfig, JOINT_OFFSETS
    from hector.qp.builder import build_qp, build_stage_qp
    from hector.qp import ref_check
    import hector.gait as G

    CFG = MPCConfig()
    I_BODY = jnp.diag(jnp.asarray([0.5413, 0.5200, 0.0691]))
    OFFS = np.array(JOINT_OFFSETS)
    GOLD = np.load(os.path.join(os.path.dirname(__file__), "..", "tests",
                                "golden", "solver.npz"))

    def golden_args(k, dtype):
        r_body = HM.quat_to_rot(jnp.asarray(GOLD[f's{k}_quat'], dtype))
        r_foot = K.foot_rotation(jnp.asarray(
            GOLD[f's{k}_joint_angles'].reshape(2, 5) + OFFS, dtype))
        return (jnp.asarray(GOLD[f's{k}_x0'], dtype),
                jnp.asarray(GOLD[f's{k}_traj'], dtype), r_body, r_foot,
                jnp.asarray(GOLD[f's{k}_r_feet'], dtype),
                I_BODY.astype(dtype),
                jnp.asarray(GOLD[f's{k}_gait'], dtype), CFG)

    def fresh_args(trial, dtype):
        rng = np.random.default_rng(4242 + trial)
        rpy = rng.uniform(-0.1, 0.1, 3)
        x0 = jnp.asarray(np.concatenate([
            rpy, rng.uniform(-0.1, 0.1, 2).tolist()
            + [rng.uniform(0.5, 0.58)],
            rng.uniform(-0.3, 0.3, 3), rng.uniform(-0.3, 0.3, 3),
            [9.81]]), dtype)
        vx = rng.uniform(-0.75, 0.75)
        vy = rng.uniform(-0.25, 0.25)
        traj = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0.55, 0, 0, 0,
                                     vx, vy, 0.0], dtype), (10, 1))
        q_eff = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 5)) + 3 * OFFS,
                            dtype)
        r_foot = K.foot_rotation(q_eff)
        r_feet = jnp.asarray(rng.uniform(-0.12, 0.12, (2, 3)), dtype
                             ).at[:, 2].set(rng.uniform(-0.58, -0.48))
        if trial % 4 == 0:
            gait = jnp.ones((10, 2), dtype)
        else:
            gait = G.mpc_gait_table(
                jnp.asarray(trial % 10), jnp.asarray([0., 5.]),
                jnp.asarray([5., 5.]), 10).astype(dtype)
        return (x0, traj, HM.quat_to_rot(HM.rpy_to_quat(
            jnp.asarray(rpy, dtype))), r_foot, r_feet,
            I_BODY.astype(dtype), gait, CFG), gait

    sqps, refs = [], []
    for k in range(3):
        args64 = golden_args(k, jnp.float64)
        refs.append(ref_check.solve_qpdata_qpoases(
            build_qp(*args64), GOLD[f's{k}_gait']))
        sqps.append(build_stage_qp(*golden_args(k, jnp.float32)))
    for t in range(n_fresh):
        args64, gait = fresh_args(t, jnp.float64)
        refs.append(ref_check.solve_qpdata_qpoases(
            build_qp(*args64), np.asarray(gait)))
        args32, _ = fresh_args(t, jnp.float32)
        sqps.append(build_stage_qp(*args32))
    sqp = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                       *sqps)
    np.savez(path, refs=np.stack(refs),
             **{f'f{i}': leaf for i, leaf in enumerate(sqp)})
    print(f"prepared {len(refs)} scenarios -> {path}", flush=True)


def check(path: str, out: str | None = None):
    import jax
    import jax.numpy as jnp
    from hector.config import SolverConfig
    from hector.qp import pallas_riccati as PR
    from hector.qp.riccati import StageQPData
    from benchmarks._cache import enable_cache
    enable_cache()

    data = np.load(path)
    refs = data["refs"]
    sqp = StageQPData(*[jnp.asarray(data[f'f{i}']) for i in range(10)])
    backend = jax.default_backend()
    interpret = backend != "tpu"
    scfg = SolverConfig(iterations=14, mehrotra=False, sigma_fixed=0.1,
                        polish_rounds=8)
    sol = PR.solve_batched(sqp, scfg, interpret=interpret)
    errs = np.abs(np.asarray(sol.u, np.float64) - refs).max(axis=1)
    rep = dict(config="kernel_polish_parity", backend=backend,
               interpret=bool(interpret),
               scenarios=int(len(refs)),
               max_err_N=float(errs.max()),
               median_err_N=float(np.median(errs)),
               n_over_1e3=int((errs > 1e-3).sum()),
               bar="1e-3 N vs reference qpOASES (SolverMPC.cpp:702-712)",
               passed=bool(errs.max() < 1e-3))
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            json.dump(rep, f, indent=1)
    print(json.dumps(rep), flush=True)
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", default=None)
    ap.add_argument("--check", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--fresh", type=int, default=24)
    args = ap.parse_args()
    if args.prepare:
        prepare(args.prepare, n_fresh=args.fresh)
    if args.check:
        check(args.check, out=args.out)


if __name__ == "__main__":
    main()
