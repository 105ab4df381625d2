"""Batched assembly of the condensed MPC QP.

Rebuilds ``solve_mpc``'s matrix pipeline (SolverMPC.cpp:371-586) as pure
array code with static shapes:

  H = 2 (B~^T S B~ + Alpha_rep)        (SolverMPC.cpp:569)
  g = 2 B~^T S (A_qp x0 - X_d)         (SolverMPC.cpp:570)

where B~ is B_qp with swing-leg columns zeroed (the static-shape equivalent
of the reference's variable elimination, SolverMPC.cpp:589-697) and the
constraints are the per-step block F with gait-masked bounds
(hector/constraints.py).  Everything here is one jittable function of the
scenario state; vmap supplies the batch dimension.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import MPCConfig
from ..math import euler_rate_matrix
from ..srbd import ct_dynamics, condense
from ..constraints import constraint_block, constraint_bounds, input_mask


class QPData(NamedTuple):
    """One condensed MPC QP (leading batch dims allowed on every field).

    min 1/2 u^T H u + g^T u  s.t.  lb <= C_step u_step <= ub per step,
    with C_step shared across the horizon (fmat is block-diagonal with a
    single repeated block, SolverMPC.cpp:552-555).
    """

    h_mat: jnp.ndarray   # (..., 12h, 12h)
    g_vec: jnp.ndarray   # (..., 12h)
    c_block: jnp.ndarray  # (..., 16, 12)
    lb: jnp.ndarray      # (..., h, 16)
    ub: jnp.ndarray      # (..., h, 16)


def build_qp(x0, traj, r_body, r_foot, r_feet, i_body, gait_table,
             cfg: MPCConfig) -> QPData:
    """Assemble the QP for one scenario.

    x0: (13) initial state [rpy, p, omega_world, v, g];
    traj: (h, 12) reference states; r_body: (3,3) body->world rotation;
    r_foot: (2,3,3) foot rotations; r_feet: (2,3) foot-minus-CoM vectors;
    i_body: (3,3) body inertia; gait_table: (h, 2) contact flags.
    """
    h = cfg.horizon
    dtype = x0.dtype

    i_world = r_body @ i_body @ jnp.swapaxes(r_body, -1, -2)
    erate = euler_rate_matrix(x0[0:3])
    a_ct, b_ct = ct_dynamics(i_world, jnp.asarray(cfg.mass, dtype), r_feet,
                             erate)
    a_qp, b_qp = condense(a_ct, b_ct, jnp.asarray(cfg.dt_mpc, dtype), h)

    # swing-leg variable masking == reference's elimination
    u_mask = input_mask(gait_table).reshape(12 * h)
    b_masked = b_qp * u_mask[None, :]

    weights13 = jnp.concatenate(
        [jnp.asarray(cfg.weights, dtype), jnp.zeros((1,), dtype)])
    s_diag = jnp.tile(weights13, h)                     # (13h,)
    alpha_rep = jnp.tile(jnp.asarray(cfg.alpha, dtype), h)

    bs = b_masked * s_diag[:, None]                     # S @ B~
    h_mat = 2.0 * (b_masked.T @ bs + jnp.diag(alpha_rep))

    x_d = jnp.concatenate(
        [traj, jnp.zeros(traj.shape[:-1] + (1,), dtype)], axis=-1)
    x_d = x_d.reshape(13 * h)
    g_vec = 2.0 * (bs.T @ (a_qp @ x0 - x_d))

    c_block = constraint_block(r_body, r_foot, cfg).astype(dtype)
    lb, ub = constraint_bounds(gait_table.astype(dtype), cfg)
    return QPData(h_mat, g_vec, c_block, lb, ub)


class StageQPParts(NamedTuple):
    """The exact tensor set the fused Pallas kernel reads -- the compact
    production-path alternative to the full stage form.

    ``pallas_riccati.solve_batched`` extracts s69/scal/b69 slices from the
    full (13,13)/(13,12) a_dt/b_dt anyway; assembling those full matrices
    costs ~3x the QP solve itself in padded tiny-tensor traffic (measured,
    benchmarks/pipeline_split.py), so the production path builds only the
    slices.  Values are EXACTLY those slices (tests/test_riccati.py
    test_parts_build_matches_stage_slices):

      s69  = a_dt[0:3, 6:9]          = dt * euler_rate
      scal = [a_dt[3,9], a_dt[11,12], b_dt[9,0]] = [dt, -dt, dt/mass]
      b69  = b_dt[6:9, :] = dt * [I^-1 [r0]x | I^-1 [r1]x | I^-1 | I^-1]
    """

    s69: jnp.ndarray      # (..., 3, 3)
    scal: jnp.ndarray     # (..., 3)
    b69: jnp.ndarray      # (..., 3, 12)
    u_mask: jnp.ndarray   # (..., h, 12)
    x0: jnp.ndarray       # (..., 13)
    xd: jnp.ndarray       # (..., h, 13)
    c_block: jnp.ndarray  # (..., 16, 12)
    lb: jnp.ndarray       # (..., h, 16)
    ub: jnp.ndarray       # (..., h, 16)


def build_stage_parts(x0, traj, r_body, r_foot, r_feet, i_body, gait_table,
                      cfg: MPCConfig) -> StageQPParts:
    """Assemble only what the fused kernel consumes (see StageQPParts).
    Inputs as in :func:`build_qp`."""
    from ..math import skew, inv3

    dtype = x0.dtype
    dt = jnp.asarray(cfg.dt_mpc, dtype)

    s69 = dt * euler_rate_matrix(x0[0:3])
    scal = jnp.stack([dt, -dt, dt / jnp.asarray(cfg.mass, dtype)])

    i_world = r_body @ i_body @ jnp.swapaxes(r_body, -1, -2)
    i_inv = inv3(i_world)
    b69 = dt * jnp.concatenate([
        i_inv @ skew(r_feet[..., 0, :]), i_inv @ skew(r_feet[..., 1, :]),
        i_inv, i_inv], axis=-1)

    u_mask = input_mask(gait_table).astype(dtype)
    xd = jnp.concatenate(
        [traj, jnp.zeros(traj.shape[:-1] + (1,), dtype)], axis=-1)
    c_block = constraint_block(r_body, r_foot, cfg).astype(dtype)
    lb, ub = constraint_bounds(gait_table.astype(dtype), cfg)
    return StageQPParts(s69, scal, b69, u_mask, x0, xd, c_block, lb, ub)


def build_stage_qp(x0, traj, r_body, r_foot, r_feet, i_body, gait_table,
                   cfg: MPCConfig):
    """Assemble the SAME MPC problem in optimal-control (stage) form for the
    condensing-free Riccati solver (hector/qp/riccati.py).

    Skips the entire condensing pipeline (no A_qp/B_qp powers, no
    B^T S B GEMM, no 120x120 H): the stage solver consumes the one-step
    discrete dynamics directly.  Inputs as in :func:`build_qp`.
    """
    from .riccati import StageQPData

    h = cfg.horizon
    dtype = x0.dtype

    i_world = r_body @ i_body @ jnp.swapaxes(r_body, -1, -2)
    erate = euler_rate_matrix(x0[0:3])
    a_ct, b_ct = ct_dynamics(i_world, jnp.asarray(cfg.mass, dtype), r_feet,
                             erate)
    dt = jnp.asarray(cfg.dt_mpc, dtype)
    a_dt = jnp.eye(13, dtype=dtype) + dt * a_ct   # Acd (SolverMPC.cpp:145)
    b_dt = dt * b_ct                              # Bcd (SolverMPC.cpp:146)

    u_mask = input_mask(gait_table).astype(dtype)          # (h, 12)
    xd = jnp.concatenate(
        [traj, jnp.zeros(traj.shape[:-1] + (1,), dtype)], axis=-1)  # (h, 13)

    q_diag = jnp.concatenate(
        [jnp.asarray(cfg.weights, dtype), jnp.zeros((1,), dtype)])
    r_diag = jnp.asarray(cfg.alpha, dtype)

    c_block = constraint_block(r_body, r_foot, cfg).astype(dtype)
    lb, ub = constraint_bounds(gait_table.astype(dtype), cfg)
    return StageQPData(a_dt, b_dt, u_mask, x0, xd, q_diag, r_diag,
                       c_block, lb, ub)
