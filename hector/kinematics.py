"""Leg forward kinematics, Jacobians, foot rotation, and analytic IK.

TPU-native redesign of ``src/common/LegController.cpp:108-195`` (FK + symbolic
Jacobians), ``SolverMPC.cpp:426-433`` (foot rotation), and
``src/common/SwingLegController.cpp:157-187`` (geometric IK).

Instead of transcribing the reference's machine-generated symbolic
expressions, each function is written as a small transform chain
(Rz(q0) Rx(q1) Ry(q2) Ry(q3) Ry(q4) with translations) whose constants are
reverse-engineered from those expressions and pinned in ``config.py``.  The
Jacobian is jax.jacfwd of the chain -- exactly consistent by construction and
fully fusible under vmap/jit.  Numeric parity with the reference expressions
is asserted by golden-value tests (tests/test_kinematics.py).

Reference quirks reproduced on purpose:

- the FK chain and the Jacobian chain use *different* constants (toe length
  0.036 vs 0.04, different hip y-offsets) -- see config.LegFKModel vs
  config.LegJacobianModel;
- the reference uses three slightly different values of pi for the joint
  offset correction (3.14159 in LegController.cpp:111, M_PI in
  SwingLegController.cpp:184, 3.14159265359 in ConvexMPCLocomotion.cpp:300).
  We use 3.14159265359 uniformly; the resulting angle difference (<3e-6 rad)
  is far below the 1e-3 N force-parity budget.

All functions take the two legs stacked on a leading leg axis: q has shape
(..., 2, 5); leg 0 is left (side +1 in the FK/Jacobian models, -1 in the IK's
own convention -- another reference quirk, SwingLegController.cpp:160).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import HectorConfig, DEFAULT_CONFIG, JOINT_OFFSETS

# side sign per leg for the FK / Jacobian models (LegController.cpp:122-126)
FK_SIDE = (1.0, -1.0)
# side sign per leg in the IK's own convention (SwingLegController.cpp:160)
IK_SIDE = (-1.0, 1.0)

# NOTE: no module-level jnp arrays -- creating one at import time
# would initialize the default backend before the caller can select
# a platform (the CLI's --platform flag relies on this).


def apply_joint_offsets(q):
    """Raw motor angles -> effective chain angles (+0.3pi, -0.6pi, +0.3pi on
    the knee chain; LegController.cpp:111-113)."""
    return q + jnp.asarray(JOINT_OFFSETS, q.dtype)


def _chain_position(q5, side, a_x, a_y, a_z, b_y, l1, l2, l3):
    """p = Rz(q0) (a + Rx(q1) (b + Ry(q2)(0,0,-l1) + Ry(q2+q3)(0,0,-l2)
    + Ry(q2+q3+q4)(0,0,-l3))), written scalar-wise so XLA fuses it."""
    q0, q1, q2, q3, q4 = q5[0], q5[1], q5[2], q5[3], q5[4]
    s23 = q2 + q3
    s234 = s23 + q4
    # planar reach in the pitch plane
    sx = l1 * jnp.sin(q2) + l2 * jnp.sin(s23) + l3 * jnp.sin(s234)
    kz = l1 * jnp.cos(q2) + l2 * jnp.cos(s23) + l3 * jnp.cos(s234)
    # u = b + (-sx, 0, -kz); v = Rx(q1) u
    u_x, u_y, u_z = -sx, b_y, -kz
    c1, s1 = jnp.cos(q1), jnp.sin(q1)
    v_x = u_x
    v_y = c1 * u_y - s1 * u_z
    v_z = s1 * u_y + c1 * u_z
    # p = Rz(q0) (a + v)
    c0, s0 = jnp.cos(q0), jnp.sin(q0)
    w_x, w_y = a_x + v_x, a_y + v_y
    return jnp.stack([c0 * w_x - s0 * w_y, s0 * w_x + c0 * w_y, a_z + v_z])


def _fk_position_single(q5, side, cfg: HectorConfig):
    fk = cfg.fk
    return _chain_position(
        q5, side, fk.a_x, fk.a_y_side * side, fk.a_z, fk.b_y_side * side,
        fk.l_thigh, fk.l_calf, fk.l_toe)


def _jac_position_single(q5, side, cfg: HectorConfig):
    jm = cfg.jac
    return _chain_position(
        q5, side, jm.a_x, jm.a_y_side * side, 0.0,
        jm.b_y_side * side + jm.b_y_const, jm.l_thigh, jm.l_calf, jm.l_toe)


def foot_position(q_raw, cfg: HectorConfig = DEFAULT_CONFIG):
    """Foot position in the hip-yaw frame for both legs.

    q_raw: (..., 2, 5) raw motor angles.  Returns (..., 2, 3).
    Parity target: LegController.cpp:190-194.
    """
    q = apply_joint_offsets(q_raw)
    side = jnp.asarray(FK_SIDE, dtype=q.dtype)

    def per_leg(q5, s):
        return _fk_position_single(q5, s, cfg)

    fn = per_leg
    for _ in range(q.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, None))
    return jnp.stack([fn(q[..., 0, :], side[0]), fn(q[..., 1, :], side[1])],
                     axis=-2)


def leg_jacobians(q_raw, cfg: HectorConfig = DEFAULT_CONFIG):
    """(J_force_moment (..., 2, 6, 5), J_force (..., 2, 3, 5)).

    J_force is d p_J / d q of the Jacobian-model chain (jacfwd == the
    reference's symbolic matrix, LegController.cpp:131-186); the angular block
    rows 3:6 are the world-frame joint axes (z, Rz x, Rz Rx y).
    """
    q = apply_joint_offsets(q_raw)
    side = jnp.asarray(FK_SIDE, dtype=q.dtype)

    jac_single = jax.jacfwd(_jac_position_single, argnums=0)

    def per_leg(q5, s):
        jf = jac_single(q5, s, cfg)                       # (3, 5)
        q0, q1 = q5[0], q5[1]
        c0, s0 = jnp.cos(q0), jnp.sin(q0)
        c1, s1 = jnp.cos(q1), jnp.sin(q1)
        z = jnp.zeros_like(q0)
        one = jnp.ones_like(q0)
        ax_yaw = jnp.stack([z, z, one])                   # col 0
        ax_roll = jnp.stack([c0, s0, z])                  # col 1
        ax_pitch = jnp.stack([-c1 * s0, c0 * c1, s1])     # cols 2..4
        jang = jnp.stack([ax_yaw, ax_roll, ax_pitch, ax_pitch, ax_pitch],
                         axis=1)                          # (3, 5)
        return jnp.concatenate([jf, jang], axis=0), jf

    fn = per_leg
    for _ in range(q.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, None))
    jm0, jf0 = fn(q[..., 0, :], side[0])
    jm1, jf1 = fn(q[..., 1, :], side[1])
    return (jnp.stack([jm0, jm1], axis=-3), jnp.stack([jf0, jf1], axis=-3))


def foot_rotation(q_eff):
    """R_foot = Rz(q0) Rx(q1) Ry(q2+q3+q4) for both legs.

    q_eff: (..., 2, 5) *effective* angles -- the caller controls how many
    offset corrections are applied.  NOTE the reference applies the +0.3pi /
    -0.6pi / +0.3pi correction THREE times on the MPC path: once through the
    mutable reference to data[leg].q (LegController.cpp:111-113 via :51),
    once in updateMPCIfNeeded whose joint_angles pointer aliases the
    re-corrected local copy (ConvexMPCLocomotion.cpp:289-313), and once in
    solve_mpc (SolverMPC.cpp:382-388) -- so mpc.py passes
    data_q (= raw + 1x) + 2x more.  Parity target: SolverMPC.cpp:428-433.
    """
    q0, q1 = q_eff[..., 0], q_eff[..., 1]
    s234 = q_eff[..., 2] + q_eff[..., 3] + q_eff[..., 4]
    c0, s0 = jnp.cos(q0), jnp.sin(q0)
    c1, s1 = jnp.cos(q1), jnp.sin(q1)
    cs, ss = jnp.cos(s234), jnp.sin(s234)
    r = jnp.stack([
        c0 * cs - s0 * s1 * ss, -s0 * c1, c0 * ss + s0 * s1 * cs,
        s0 * cs + c0 * s1 * ss, c0 * c1, s0 * ss - c0 * s1 * cs,
        -c1 * ss, s1, c1 * cs,
    ], axis=-1)
    return r.reshape(q_eff.shape[:-1] + (3, 3))


def foot_velocity(q_raw, qd, cfg: HectorConfig = DEFAULT_CONFIG):
    """v = J_force @ qd (LegController.cpp:52)."""
    _, jf = leg_jacobians(q_raw, cfg)
    return jnp.einsum('...ij,...j->...i', jf, qd)


def leg_ik(p_foot_b, q_data, cfg: HectorConfig = DEFAULT_CONFIG):
    """Geometric 5-DoF IK; returns raw-motor-frame joint targets.

    p_foot_b: (..., 2, 3) desired foot position in body frame (after the
    hip-width offset shift done by the swing controller).
    q_data: (..., 2, 5) current offset-corrected angles (used for the toe
    joint: theta4 = -q3 - q2, SwingLegController.cpp:181).
    Parity target: SwingLegController.cpp:157-187.
    """
    ik = cfg.ik
    dtype = p_foot_b.dtype
    side = jnp.asarray(IK_SIDE, dtype=dtype)
    hip = jnp.asarray([ik.hip_x, 0.0, ik.hip_z], dtype=dtype)
    d = p_foot_b - hip
    d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
    dist3 = jnp.sqrt(d0 * d0 + d1 * d1 + d2 * d2)
    dist_yoz = jnp.sqrt(d1 * d1 + d2 * d2)
    dh = ik.distance_horizontal
    dist_vert = jnp.sqrt(jnp.maximum(ik.eps_vertical, dist_yoz ** 2 - dh ** 2))
    # the reference takes pow(dist3^2 - dh^2, 0.5) unguarded
    # (SwingLegController.cpp:168); we clamp at the same epsilon so the
    # batched kernel never NaNs (identical output for reachable targets).
    dist_xoz = jnp.sqrt(jnp.maximum(ik.eps_vertical, dist3 ** 2 - dh ** 2))

    clamp1 = lambda x: jnp.clip(x, -1.0, 1.0)
    acos_arg1 = clamp1(dist_xoz / (2.0 * ik.l_link))
    acos_arg2 = clamp1(dist_vert / dist_xoz)
    divisor = jnp.where(jnp.abs(d0) == 0.0, 1e-6, jnp.abs(d0))

    th0 = jnp.zeros_like(d0)
    th1 = (jnp.arcsin(clamp1(d1 / dist_yoz))
           + jnp.arcsin(clamp1(dh * side / dist_yoz)))
    th2 = jnp.arccos(acos_arg1) - jnp.arccos(acos_arg2) * d0 / divisor
    th3 = 2.0 * jnp.arcsin(clamp1(dist_xoz / (2.0 * ik.l_link))) - jnp.pi
    th4 = -q_data[..., 3] - q_data[..., 2]

    q_des = jnp.stack([th0, th1, th2, th3, th4], axis=-1)
    return q_des - jnp.asarray(JOINT_OFFSETS, dtype)
