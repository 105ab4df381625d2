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

pytestmark = pytest.mark.skipif(
    not ref_check.qpoases_available(),
    reason="reference qpOASES checkout not available")

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
