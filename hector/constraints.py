"""Friction-pyramid + moment + line-contact constraint builder.

TPU-native rebuild of the constraint assembly inlined in ``solve_mpc``
(SolverMPC.cpp:463-555).  Produces the per-step 16x12 constraint block and
per-step bounds, gait-masked with *static shapes*: where the reference
eliminates swing-leg variables and rows (shrinking the QP), we zero the
corresponding B_qp columns and deactivate the rows by widening their bounds
past the solver's big-bound threshold -- provably the same solution (see
tests/test_qp.py::test_masking_equals_reduction).

Per leg, rows (SolverMPC.cpp:511-548), with G = (R @ R_foot)^T:
  0: -mu Fx + Fz in [0, inf)
  1:  mu Fx + Fz in [0, inf)
  2: -mu Fy + Fz in [0, inf)
  3:  mu Fy + Fz in [0, inf)
  4: foot-frame Mx in [0, 0.01]
  5: -lt (G F)_z + (G M)_y in (-inf, 0]   (toe line contact)
  6: leg 0: -lh (G F)_z - (G M)_y in (-inf, 0]  (heel)
     leg 1: -lh (G F)_z + (G M)_y in (-inf, 0]  -- the reference's leg-2
     heel row reuses +M_vec (SolverMPC.cpp:545-546), i.e. the right leg gets
     the toe-sign constraint twice with different lever arms and no heel
     constraint.  Reproduced faithfully.
  7: 2 Fz in [0, f_max * gait]
with mu = 2.0, lt = 0.09, lh = 0.06 hardcoded (SolverMPC.cpp:488-490); the
mu passed to setup_problem is ignored by the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import MPCConfig


def constraint_block(r_body, r_foot, cfg: MPCConfig):
    """Per-step constraint matrix F (16, 12) (same for every horizon step).

    r_body: (..., 3, 3) body->world rotation (rs.R); r_foot: (..., 2, 3, 3)
    foot rotations (from the double-offset joint angles, see kinematics).
    Returns (..., 16, 12).
    """
    dtype = r_body.dtype
    batch = r_body.shape[:-2]
    mu, lt, lh = cfg.mu_constraint, cfg.lt, cfg.lh

    # G_l = R_foot_l^T @ R^T = ((R @ R_foot_l))^T  (SolverMPC.cpp:522-546)
    g0 = jnp.swapaxes(r_body @ r_foot[..., 0, :, :], -1, -2)
    g1 = jnp.swapaxes(r_body @ r_foot[..., 1, :, :], -1, -2)

    f = jnp.zeros(batch + (16, 12), dtype)
    one = jnp.ones(batch, dtype)

    def friction_rows(f, row0, col0):
        f = f.at[..., row0 + 0, col0 + 0].set(-mu * one)
        f = f.at[..., row0 + 0, col0 + 2].set(one)
        f = f.at[..., row0 + 1, col0 + 0].set(mu * one)
        f = f.at[..., row0 + 1, col0 + 2].set(one)
        f = f.at[..., row0 + 2, col0 + 1].set(-mu * one)
        f = f.at[..., row0 + 2, col0 + 2].set(one)
        f = f.at[..., row0 + 3, col0 + 1].set(mu * one)
        f = f.at[..., row0 + 3, col0 + 2].set(one)
        return f

    f = friction_rows(f, 0, 0)   # leg 0 forces at cols 0:3
    f = friction_rows(f, 8, 3)   # leg 1 forces at cols 3:6

    # Mx selection row: e_x^T G on the moment columns
    f = f.at[..., 4, 6:9].set(g0[..., 0, :])
    f = f.at[..., 12, 9:12].set(g1[..., 0, :])

    # line-contact rows: -l * (G)_z-row on force cols, +/- (G)_y-row on moments
    f = f.at[..., 5, 0:3].set(-lt * g0[..., 2, :])
    f = f.at[..., 5, 6:9].set(g0[..., 1, :])
    f = f.at[..., 6, 0:3].set(-lh * g0[..., 2, :])
    f = f.at[..., 6, 6:9].set(-g0[..., 1, :])

    f = f.at[..., 13, 3:6].set(-lt * g1[..., 2, :])
    f = f.at[..., 13, 9:12].set(g1[..., 1, :])
    f = f.at[..., 14, 3:6].set(-lh * g1[..., 2, :])
    # reference quirk: +M_vec on the right leg's heel row (SolverMPC.cpp:546)
    f = f.at[..., 14, 9:12].set(g1[..., 1, :])

    # Fz budget rows
    f = f.at[..., 7, 2].set(2.0 * one)
    f = f.at[..., 15, 5].set(2.0 * one)
    return f


def constraint_bounds(gait_table, cfg: MPCConfig):
    """Per-step bounds (lb, ub), each (..., h, 16), gait-masked.

    gait_table: (..., h, 2) contact flags.  Matches SolverMPC.cpp:466-482,
    except swing steps: instead of eliminating that leg's 8 rows, their
    bounds are widened to +/-inf-class values so the solver's row masks
    drop them (rows only touch that leg's variables, whose B_qp columns the
    builder zeroes -- the remaining problem is exactly the reference's
    reduced QP).
    """
    dtype = gait_table.dtype
    batch_h = gait_table.shape[:-1]
    big = jnp.asarray(cfg.big_number, dtype)

    lb_leg = jnp.stack([
        jnp.zeros(batch_h, dtype), jnp.zeros(batch_h, dtype),
        jnp.zeros(batch_h, dtype), jnp.zeros(batch_h, dtype),
        jnp.zeros(batch_h, dtype), -big * jnp.ones(batch_h, dtype),
        -big * jnp.ones(batch_h, dtype), jnp.zeros(batch_h, dtype),
    ], axis=-1)                                         # (..., h, 8) per leg
    ub_base = jnp.stack([
        big * jnp.ones(batch_h, dtype), big * jnp.ones(batch_h, dtype),
        big * jnp.ones(batch_h, dtype), big * jnp.ones(batch_h, dtype),
        cfg.mx_bound * jnp.ones(batch_h, dtype), jnp.zeros(batch_h, dtype),
        jnp.zeros(batch_h, dtype), jnp.ones(batch_h, dtype),
    ], axis=-1)

    lbs, ubs = [], []
    for leg in range(2):
        contact = gait_table[..., leg:leg + 1]          # (..., h, 1)
        ub_leg = ub_base.at[..., 7].mul(cfg.f_max)
        ub_leg = ub_leg.at[..., 7].mul(gait_table[..., leg])
        # swing: deactivate all 8 rows of this leg
        lbs.append(jnp.where(contact > 0, lb_leg, -2 * big))
        ubs.append(jnp.where(contact > 0, ub_leg, 2 * big))
    lb = jnp.concatenate(lbs, axis=-1)                  # (..., h, 16)
    ub = jnp.concatenate(ubs, axis=-1)
    return lb, ub


def input_mask(gait_table):
    """(..., h, 12) variable mask: 1 for stance-leg force/moment vars.

    Zeroing B_qp columns with this mask reproduces the reference's
    swing-variable elimination (SolverMPC.cpp:589-733) at static shape.
    """
    g0 = gait_table[..., 0:1]
    g1 = gait_table[..., 1:2]
    return jnp.concatenate(
        [jnp.repeat(g0, 3, -1), jnp.repeat(g1, 3, -1),
         jnp.repeat(g0, 3, -1), jnp.repeat(g1, 3, -1)], axis=-1)
