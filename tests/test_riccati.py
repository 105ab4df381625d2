"""Stage-wise Riccati interior-point solver: equivalence + parity tests.

The Riccati path (hector/qp/riccati.py) must solve the SAME problem as the
condensed dense path (hector/qp/pdip.py) -- its stage form is an exact block
elimination of the condensed KKT system -- so beyond the BASELINE 1e-3 N
parity bar vs the certified reduced-QP optima (tests/golden/solver.npz, see
tests/test_qp.py for provenance) we also require near-machine agreement with
the dense solver in float64.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from hector import kinematics as K
from hector import math as HM
from hector.config import MPCConfig, SolverConfig, JOINT_OFFSETS
from hector.qp.builder import build_qp, build_stage_qp
from hector.qp import pdip, riccati

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


def test_riccati_matches_certified_solution():
    """Condensing-free solver vs certified reduced-QP optima (<= 1e-3 N)
    and vs the dense solver (near machine precision in f64)."""
    scfg = SolverConfig(iterations=25)
    for k in range(3):
        args = _inputs(k)
        sol_d = pdip.solve(build_qp(*args), scfg)
        sol_r = riccati.solve(build_stage_qp(*args), scfg)
        gold = GOLD[f's{k}_q_soln']
        assert np.abs(np.asarray(sol_r.u) - gold).max() < 1e-3
        np.testing.assert_allclose(
            np.asarray(sol_r.u), np.asarray(sol_d.u), atol=1e-8)
        assert float(sol_r.mu) < 1e-10
        assert float(sol_r.r_dual) < 1e-6


def test_riccati_fixed_sigma_mode():
    """The fixed-centering path (used by the fused Pallas kernel, which
    avoids Mehrotra's second linear solve) must also reach the optimum."""
    scfg = SolverConfig(iterations=30, mehrotra=False)
    for k in range(3):
        sol = riccati.solve(build_stage_qp(*_inputs(k)), scfg)
        gold = GOLD[f's{k}_q_soln']
        assert np.abs(np.asarray(sol.u) - gold).max() < 1e-3
        assert float(sol.mu) < 1e-10


def test_riccati_float32_accuracy():
    """float32 (the TPU production dtype) stays within the parity bar."""
    scfg = SolverConfig(iterations=12)
    for k in range(3):
        args = _inputs(k, jnp.float32)
        sol = riccati.solve(build_stage_qp(*args), scfg)
        gold = GOLD[f's{k}_q_soln']
        err = np.abs(np.asarray(sol.u) - gold).max()
        assert err < 6e-3, f'scenario {k}: max err {err}'


def test_riccati_batched_vmap():
    """vmap over scenarios routes into one batched solve and agrees with
    per-scenario solves."""
    scfg = SolverConfig(iterations=20)
    sqps = [build_stage_qp(*_inputs(k)) for k in range(3)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *sqps)
    sol_b = jax.vmap(riccati.make_solver(scfg))(batched)
    for k in range(3):
        sol_1 = riccati.solve(sqps[k], scfg)
        np.testing.assert_allclose(
            np.asarray(sol_b.u[k]), np.asarray(sol_1.u), atol=1e-9)


def test_mpc_update_riccati_backend_matches_dense():
    """Switching HectorConfig.solver.backend to 'riccati' leaves the full
    mpc_update pipeline's forces unchanged."""
    from hector.config import HectorConfig

    cfg_d = HectorConfig()
    cfg_r = dataclasses.replace(
        cfg_d, solver=dataclasses.replace(cfg_d.solver, backend='riccati'))

    from hector import runtime as RT
    from hector.plant import srb

    dtype = jnp.float32
    plant = srb.init_plant_state(cfg_d)
    carry = RT.init_controller_carry(plant, cfg_d)
    cmd = RT.walking_command(vx=0.4)
    # advance a few ticks so the state is less symmetric than t=0
    c_d, c_r = carry, carry
    p = plant
    for tick in range(6):
        do = tick % cfg_d.mpc.mpc_cadence == 0
        c_d, motor_d, w_d, s_d, _ = RT.controller_tick(
            c_d, p, cmd, do_mpc=do, cfg=cfg_d)
        c_r, motor_r, w_r, s_r, _ = RT.controller_tick(
            c_r, p, cmd, do_mpc=do, cfg=cfg_r)
        np.testing.assert_allclose(
            np.asarray(c_r.planner.f_ff), np.asarray(c_d.planner.f_ff),
            atol=2e-3)
        p = srb.step(p, motor_d, w_d, s_d, cfg=cfg_d)


def test_parts_build_matches_stage_slices():
    """The compact production build (builder.build_stage_parts) must equal
    the corresponding slices of the full stage form EXACTLY -- it is the
    same arithmetic, just skipping the full (13,13)/(13,12) assembly."""
    from hector.qp.builder import build_stage_parts

    for k in range(3):
        args = _inputs(k)
        sqp = build_stage_qp(*args)
        parts = build_stage_parts(*args)
        np.testing.assert_array_equal(
            np.asarray(parts.s69), np.asarray(sqp.a_dt[0:3, 6:9]))
        np.testing.assert_array_equal(
            np.asarray(parts.scal),
            np.asarray(jnp.stack([sqp.a_dt[3, 9], sqp.a_dt[11, 12],
                                  sqp.b_dt[9, 0]])))
        np.testing.assert_allclose(
            np.asarray(parts.b69), np.asarray(sqp.b_dt[6:9, :]),
            rtol=0, atol=1e-15)
        for name in ('u_mask', 'x0', 'xd', 'c_block', 'lb', 'ub'):
            np.testing.assert_array_equal(
                np.asarray(getattr(parts, name)),
                np.asarray(getattr(sqp, name)))


def test_parts_solver_interpret_matches_riccati():
    """The production mpc_update pallas path (compact parts build +
    make_parts_solver) in interpret mode must match the pure-JAX stage
    solver on the same scenarios."""
    from hector.qp import pallas_riccati as PR
    from hector.qp.builder import build_stage_parts

    f32 = jnp.float32
    scfg = SolverConfig()
    q_diag = tuple(np.concatenate([np.asarray(CFG.weights), [0.0]]).tolist())
    r_diag = tuple(np.asarray(CFG.alpha).tolist())
    solver = PR.make_parts_solver(scfg, q_diag=q_diag, r_diag=r_diag,
                                  interpret=True)
    args = [_inputs(k, f32) for k in range(3)]
    parts = jax.tree.map(lambda *xs: jnp.stack(xs),
                         *[build_stage_parts(*a) for a in args])
    sol_p = jax.jit(jax.vmap(solver))(parts)
    for k in range(3):
        cast = [a.astype(f32) if hasattr(a, 'astype') else a
                for a in args[k]]
        sol_r = riccati.solve(build_stage_qp(*cast), scfg)
        assert np.abs(np.asarray(sol_p.u[k]) - GOLD[f's{k}_q_soln']
                      ).max() < 1e-2
        # kernel = fixed-sigma single-corrector, riccati.solve(default) =
        # Mehrotra: two IP paths meet at their (different) f32 floors
        assert np.abs(np.asarray(sol_p.u[k]) - np.asarray(sol_r.u)
                      ).max() < 5e-3
