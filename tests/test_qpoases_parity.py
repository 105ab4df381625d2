"""Literal parity vs the reference's ACTUAL qpOASES solver.

tests/test_qp.py validates our solvers against certified-optimum fixtures
(a solver-independent KKT certificate -- the mathematically stronger check).
This file closes the literal BASELINE line "force trajectories within
1e-3 N of qpOASES over the h=10 horizon": the vendored qpOASES of the
reference tree is compiled out-of-tree (hector/qp/ref_check.py
_build_qpoases, native/qpoases_bridge.cpp) and invoked with the exact
options and reduction of the reference solve (SolverMPC.cpp:589-712:
swing-variable elimination, Options::setToMPC, PL_NONE, nWSR=500), then
compared against BOTH production solvers (dense-condensed PDIP and the
stage-wise Riccati path the TPU kernel implements).

Skipped wholesale if the read-only reference checkout is unavailable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hector import kinematics as K
from hector import math as HM
from hector.config import MPCConfig, SolverConfig, JOINT_OFFSETS
from hector.qp.builder import build_qp, build_stage_qp
from hector.qp import pdip, riccati, ref_check
import hector.gait as G

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not ref_check.qpoases_available(),
    reason="reference qpOASES checkout not available")]

GOLD = np.load(__file__.rsplit('/', 1)[0] + '/golden/solver.npz')
CFG = MPCConfig()
I_BODY = jnp.diag(jnp.asarray([0.5413, 0.5200, 0.0691]))
OFFS = np.array(JOINT_OFFSETS)


def _inputs(k, dtype=jnp.float64):
    g = GOLD
    r_body = HM.quat_to_rot(jnp.asarray(g[f's{k}_quat'], dtype))
    r_foot = K.foot_rotation(
        jnp.asarray(g[f's{k}_joint_angles'].reshape(2, 5) + OFFS, dtype))
    return (jnp.asarray(g[f's{k}_x0'], dtype),
            jnp.asarray(g[f's{k}_traj'], dtype), r_body, r_foot,
            jnp.asarray(g[f's{k}_r_feet'], dtype), I_BODY.astype(dtype),
            jnp.asarray(g[f's{k}_gait'], dtype), CFG)


def _fresh_scenario(trial):
    rng = np.random.default_rng(1000 + trial)
    rpy = rng.uniform(-0.1, 0.1, 3)
    quat = HM.rpy_to_quat(jnp.asarray(rpy))
    x0 = jnp.asarray(np.concatenate([
        rpy, rng.uniform(-0.1, 0.1, 2).tolist() + [0.54],
        rng.uniform(-0.2, 0.2, 3), rng.uniform(-0.3, 0.3, 3), [9.81]]))
    traj = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0.55, 0, 0, 0,
                                 0.3, 0, 0.0]), (10, 1))
    q_eff = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 5)) + 3 * OFFS)
    r_foot = K.foot_rotation(q_eff)
    r_feet = jnp.asarray(rng.uniform(-0.1, 0.1, (2, 3))).at[:, 2].set(-0.5)
    gait = G.mpc_gait_table(jnp.asarray(trial * 2), jnp.asarray([0., 5.]),
                            jnp.asarray([5., 5.]), 10).astype(x0.dtype)
    return (x0, traj, HM.quat_to_rot(quat), r_foot, r_feet, I_BODY, gait,
            CFG), gait


def test_qpoases_matches_certified_optima():
    """Cross-validates the harness itself: real qpOASES on the golden
    reduced problems lands on the certified optima."""
    for k in range(3):
        args = _inputs(k)
        x = ref_check.solve_qpdata_qpoases(build_qp(*args),
                                           GOLD[f's{k}_gait'])
        err = np.abs(x - GOLD[f's{k}_q_soln']).max()
        assert err < 1e-5, f'scenario {k}: qpOASES vs certified {err}'


def test_pdip_vs_qpoases_golden():
    """BASELINE bar, literally: PDIP force trajectories within 1e-3 N of
    qpOASES on the golden scenarios."""
    scfg = SolverConfig(iterations=25)
    for k in range(3):
        args = _inputs(k)
        qp = build_qp(*args)
        x_ref = ref_check.solve_qpdata_qpoases(qp, GOLD[f's{k}_gait'])
        sol = pdip.solve(qp, scfg)
        err = np.abs(np.asarray(sol.u) - x_ref).max()
        assert err < 1e-3, f'scenario {k}: pdip vs qpOASES {err}'


def test_riccati_vs_qpoases_golden():
    """The production (TPU-kernel) formulation against real qpOASES."""
    scfg = SolverConfig(iterations=25)
    for k in range(3):
        args = _inputs(k)
        x_ref = ref_check.solve_qpdata_qpoases(build_qp(*args),
                                               GOLD[f's{k}_gait'])
        sol = riccati.solve(build_stage_qp(*args), scfg)
        err = np.abs(np.asarray(sol.u) - x_ref).max()
        assert err < 1e-3, f'scenario {k}: riccati vs qpOASES {err}'


def test_solvers_vs_qpoases_fresh_scenarios():
    """Fresh random walking-phase scenarios NOT in the golden set: both
    production solvers within 1e-3 N of real qpOASES."""
    scfg = SolverConfig(iterations=25)
    for trial in range(4):
        args, gait = _fresh_scenario(trial)
        qp = build_qp(*args)
        x_ref = ref_check.solve_qpdata_qpoases(qp, np.asarray(gait))
        err_d = np.abs(np.asarray(pdip.solve(qp, scfg).u) - x_ref).max()
        err_r = np.abs(np.asarray(
            riccati.solve(build_stage_qp(*args), scfg).u) - x_ref).max()
        assert err_d < 1e-3, f'trial {trial}: pdip {err_d}'
        assert err_r < 1e-3, f'trial {trial}: riccati {err_r}'


def _operating_scenario(trial):
    """Operating-envelope scenario: the state distribution closed-loop
    walking/standing visits (teleop-envelope velocities, moderate
    attitude, feet under the hips).  Every 4th trial is standing gait."""
    rng = np.random.default_rng(4242 + trial)
    rpy = rng.uniform(-0.1, 0.1, 3)
    x0 = jnp.asarray(np.concatenate([
        rpy, rng.uniform(-0.1, 0.1, 2).tolist() + [rng.uniform(0.5, 0.58)],
        rng.uniform(-0.3, 0.3, 3), rng.uniform(-0.3, 0.3, 3), [9.81]]))
    vx = rng.uniform(-0.75, 0.75)
    vy = rng.uniform(-0.25, 0.25)
    traj = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0.55, 0, 0, 0,
                                 vx, vy, 0.0]), (10, 1))
    q_eff = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 5)) + 3 * OFFS)
    r_foot = K.foot_rotation(q_eff)
    r_feet = jnp.asarray(rng.uniform(-0.12, 0.12, (2, 3))).at[:, 2].set(
        rng.uniform(-0.58, -0.48))
    if trial % 4 == 0:
        gait = jnp.ones((10, 2), jnp.float64)
    else:
        gait = G.mpc_gait_table(jnp.asarray(trial % 10),
                                jnp.asarray([0., 5.]),
                                jnp.asarray([5., 5.]), 10).astype(x0.dtype)
    return (x0, traj, HM.quat_to_rot(HM.rpy_to_quat(jnp.asarray(rpy))),
            r_foot, r_feet, I_BODY, gait, MPCConfig()), gait


def test_f32_riccati_polish_vs_qpoases_battery():
    """The 1e-3 N qpOASES bar in PURE FLOAT32 on the production (stage
    Riccati) formulation with the active-set polish: a 24-scenario
    operating-envelope battery incl. standing gaits.  Typical max error
    ~1e-4 N (config.py SolverConfig polish block documents the method
    and the extreme-state fallback caveat)."""
    scfg = SolverConfig(iterations=14, mehrotra=False, sigma_fixed=0.1,
                        polish_rounds=8)
    f32 = jnp.float32
    sqps, refs = [], []
    for t in range(24):
        args, gait = _operating_scenario(t)
        refs.append(ref_check.solve_qpdata_qpoases(build_qp(*args),
                                                   np.asarray(gait)))
        a32 = tuple(jax.tree.map(
            lambda x: jnp.asarray(x, f32) if hasattr(x, 'dtype') else x, a)
            for a in args[:-1]) + (MPCConfig(),)
        sqps.append(build_stage_qp(*a32))
    sqp = jax.tree.map(lambda *xs: jnp.stack(xs), *sqps)
    sol = riccati.solve_batched(sqp, scfg)
    errs = np.abs(np.asarray(sol.u, np.float64) - np.stack(refs)).max(1)
    assert errs.max() < 1e-3, f'max {errs.max()}, worst {errs.argmax()}'
