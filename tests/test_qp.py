"""QP builder + batched PDIP solver parity tests.

Golden fixtures (tests/golden/solver.npz) hold a float64 literal
transcription of solve_mpc's matrix pipeline (SolverMPC.cpp:371-733) --
dynamics, condensing, bounds, F_control, qH/qg, swing-variable elimination --
plus certified reduced-QP solutions (scipy trust-constr + active-set KKT
polish, feasibility-checked) standing in for qpOASES.

The BASELINE parity bar: force trajectories within 1e-3 N of the reference
solver over the h=10 horizon.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hector import kinematics as K
from hector import math as HM
from hector.config import MPCConfig, SolverConfig, JOINT_OFFSETS
from hector.qp.builder import build_qp
from hector.qp import pdip

GOLD = np.load(__file__.rsplit('/', 1)[0] + '/golden/solver.npz')
CFG = MPCConfig()
I_BODY = jnp.diag(jnp.asarray([0.5413, 0.5200, 0.0691]))
OFFS = np.array(JOINT_OFFSETS)


def _build(k):
    g = GOLD
    quat = jnp.asarray(g[f's{k}_quat'])
    x0 = jnp.asarray(g[f's{k}_x0'])
    r_body = HM.quat_to_rot(quat)
    # solver-side joint angles get one more offset application
    q_eff3 = jnp.asarray(g[f's{k}_joint_angles'].reshape(2, 5) + OFFS)
    r_foot = K.foot_rotation(q_eff3)
    return build_qp(
        x0, jnp.asarray(g[f's{k}_traj']), r_body, r_foot,
        jnp.asarray(g[f's{k}_r_feet']), I_BODY,
        jnp.asarray(g[f's{k}_gait']), CFG)


def test_builder_matches_reference_matrices():
    for k in range(3):
        qp = _build(k)
        keep = GOLD[f's{k}_keep_v']
        ix = np.ix_(keep, keep)
        np.testing.assert_allclose(
            np.asarray(qp.h_mat)[ix], GOLD[f's{k}_qH'][ix],
            rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(qp.g_vec)[keep], GOLD[f's{k}_qg'][keep],
            rtol=1e-9, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(qp.c_block), GOLD[f's{k}_F'], atol=1e-10)
        # bounds agree on active (stance) rows
        gait = GOLD[f's{k}_gait']
        lb, ub = np.asarray(qp.lb), np.asarray(qp.ub)
        for i in range(10):
            for leg in range(2):
                if gait[i, leg] > 0:
                    sl = slice(8 * leg, 8 * leg + 8)
                    np.testing.assert_allclose(
                        lb[i, sl], GOLD[f's{k}_Lb'][i, sl], atol=1e-10)
                    np.testing.assert_allclose(
                        ub[i, sl], GOLD[f's{k}_Ub'][i, sl], atol=1e-10)


def test_pdip_matches_certified_solution():
    """Masked static-shape PDIP vs the reference's reduced-QP optimum:
    max force error <= 1e-3 N (BASELINE bar)."""
    scfg = SolverConfig(iterations=25)
    for k in range(3):
        qp = _build(k)
        sol = pdip.solve(qp, scfg)
        u = np.asarray(sol.u)
        gold = GOLD[f's{k}_q_soln']
        err = np.abs(u - gold).max()
        assert err < 1e-3, f'scenario {k}: max err {err}'
        # eliminated (swing) variables must be exactly recoverable as zeros
        keep = GOLD[f's{k}_keep_v']
        if (~keep).any():
            assert np.abs(u[~keep]).max() < 1e-6


def test_pdip_kkt_certificate():
    """Solver-independent optimality: small dual residual, feasibility,
    complementarity at the returned point."""
    scfg = SolverConfig(iterations=25)
    for k in range(3):
        sol = pdip.solve(_build(k), scfg)
        assert float(sol.mu) < 1e-8
        assert float(sol.r_prim) < 1e-8
        assert float(sol.r_dual) < 1e-5


def test_pdip_batched_vmap():
    """vmap over scenarios = the production batching path."""
    qps = [_build(k) for k in range(3)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    sols = jax.jit(jax.vmap(lambda q: pdip.solve(q, SolverConfig(25)).u))(batched)
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(sols[k]), GOLD[f's{k}_q_soln'], atol=1e-3)


def test_pdip_float32_accuracy():
    """The TPU path runs float32: forces must still track the certified
    optimum to ~0.05 N (documented engineering tolerance; parity tests above
    are the 1e-3 N float64 bar)."""
    scfg = SolverConfig(iterations=25, kkt_reg=1e-7)
    for k in range(3):
        qp = _build(k)
        qp32 = jax.tree.map(lambda x: x.astype(jnp.float32), qp)
        sol = pdip.solve(qp32, scfg)
        err = np.abs(np.asarray(sol.u) - GOLD[f's{k}_q_soln']).max()
        assert err < 0.05, f'scenario {k}: float32 max err {err}'


def test_pallas_backend_interpret_matches_xla():
    """The lane-vectorized pallas kernels (interpret mode on CPU) must
    reproduce the XLA backend's solutions."""
    from hector.qp import pdip as P
    qps = [_build(k) for k in range(3)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs).astype(jnp.float32),
                           *qps)
    sol_x = P.solve_batched(batched, SolverConfig(iterations=10,
                                                  backend='xla'))
    sol_p = P.solve_batched(batched, SolverConfig(
        iterations=10, backend='pallas_interpret'))
    np.testing.assert_allclose(np.asarray(sol_p.u), np.asarray(sol_x.u),
                               atol=2e-2)
    for k in range(3):
        assert np.abs(np.asarray(sol_p.u[k]) - GOLD[f's{k}_q_soln']).max() \
            < 0.05


def test_native_oracle_matches_certified_solutions():
    """The clean-room C++ active-set oracle (native/qp_oracle.cpp) must
    reproduce the certified optima -- an independent double-precision check
    standing in for qpOASES."""
    from hector.qp import ref_check
    for k in range(3):
        qp = _build(k)
        x = ref_check.solve_qpdata(qp)
        err = np.abs(x - GOLD[f's{k}_q_soln']).max()
        assert err < 1e-6, f'scenario {k}: oracle err {err}'


def test_pdip_vs_native_oracle_fresh_scenarios():
    """Cross-validation on scenarios NOT in the golden set: PDIP (f64) vs
    the native oracle to 1e-3 N."""
    from hector.qp import ref_check
    import hector.gait as G
    rng = np.random.default_rng(123)
    for trial in range(3):
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
        gait = G.mpc_gait_table(jnp.asarray(trial * 3), jnp.asarray([0., 5.]),
                                jnp.asarray([5., 5.]), 10).astype(x0.dtype)
        qp = build_qp(x0, traj, HM.quat_to_rot(quat), r_foot, r_feet,
                      I_BODY, gait, CFG)
        x_oracle = ref_check.solve_qpdata(qp)
        sol = pdip.solve(qp, SolverConfig(iterations=25))
        err = np.abs(np.asarray(sol.u) - x_oracle).max()
        assert err < 1e-3, f'trial {trial}: {err}'
