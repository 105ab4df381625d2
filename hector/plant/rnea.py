"""World-frame recursive Newton-Euler dynamics for the articulated Hector.

Forward dynamics via the unit-acceleration (inverse-dynamics) method:

    tau_req(q, nu, nu_dot) = M(q) nu_dot + C(q, nu) nu + G(q)
    => M columns  = rnea(q, nu=0, nu_dot=e_k, g=0)      (16 vmapped passes)
       bias       = rnea(q, nu, nu_dot=0, g)
       nu_dot     = M^-1 (Q_applied - bias)

Generalized coordinates (16): [v_world(3) of the trunk origin,
omega_world(3), qd(10)].  The trunk origin coincides with the trunk com
(the URDF trunk inertial origin is 0).  All quantities are computed in the
world frame with point kinematics -- no spatial-algebra transforms, just
rotations, cross products and the parallel-axis shifts already baked into
hector/plant/model.py.  Everything is batched with vmap at the caller.

One RNEA pass is O(11 bodies); the 17 passes per step are a few kFLOPs per
scenario -- the tier-2 plant is the fidelity path, not the throughput path
(the MPC bench uses the SRB plant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import model as mdl
from .. import math as hm

_LEGS = mdl.stacked_leg_models()
_N_DOF = 16


def _leg_const(name, dtype):
    return jnp.asarray(_LEGS[name], dtype)


def fk_chain(base_pos, base_rot, q):
    """World pose of every link: (rot (2,5,3,3), origin (2,5,3),
    com (2,5,3)).  q: (2,5) joint angles."""
    dtype = base_pos.dtype
    offs = _leg_const('offset', dtype)
    pre = _leg_const('pre', dtype)
    axis = _leg_const('axis', dtype)
    coms = _leg_const('com', dtype)

    def one_leg(leg):
        def body(carry, j):
            rot_p, org_p = carry
            org = org_p + rot_p @ offs[leg, j]
            a = axis[leg, j]
            c, s = jnp.cos(q[leg, j]), jnp.sin(q[leg, j])
            # Rodrigues about the (unit) joint axis
            k = hm.skew(a)
            r_axis = (jnp.eye(3, dtype=dtype) + s * k + (1 - c) * (k @ k))
            rot = rot_p @ pre[leg, j] @ r_axis
            return (rot, org), (rot, org, org + rot @ coms[leg, j])

        (_, _), out = jax.lax.scan(body, (base_rot, base_pos),
                                   jnp.arange(5))
        return out

    rots, orgs, cs = jax.vmap(one_leg)(jnp.arange(2))
    return rots, orgs, cs


def _kinematics(base_pos, base_rot, q, nu, nu_dot, dtype):
    """Forward pass: per-body (omega, omega_dot, a_com, com, origin, axis_w,
    rot) given generalized velocity/acceleration."""
    v0, w0 = nu[0:3], nu[3:6]
    a0, wd0 = nu_dot[0:3], nu_dot[3:6]
    qd = nu[6:].reshape(2, 5)
    qdd = nu_dot[6:].reshape(2, 5)

    offs = _leg_const('offset', dtype)
    pre = _leg_const('pre', dtype)
    axis = _leg_const('axis', dtype)
    coms = _leg_const('com', dtype)

    def one_leg(leg):
        def body(carry, j):
            rot_p, org_p, w_p, wd_p, ao_p = carry
            d = rot_p @ offs[leg, j]
            org = org_p + d
            # acceleration of the new joint origin (point on parent body)
            ao = ao_p + jnp.cross(wd_p, d) + jnp.cross(w_p, jnp.cross(w_p, d))
            a = axis[leg, j]
            c, s = jnp.cos(q[leg, j]), jnp.sin(q[leg, j])
            k = hm.skew(a)
            r_axis = jnp.eye(3, dtype=dtype) + s * k + (1 - c) * (k @ k)
            rot = rot_p @ pre[leg, j] @ r_axis
            ax_w = rot_p @ pre[leg, j] @ a
            w = w_p + ax_w * qd[leg, j]
            wd = (wd_p + ax_w * qdd[leg, j]
                  + jnp.cross(w_p, ax_w) * qd[leg, j])
            carry = (rot, org, w, wd, ao)
            rc = org + rot @ coms[leg, j]
            a_com = (ao + jnp.cross(wd, rc - org)
                     + jnp.cross(w, jnp.cross(w, rc - org)))
            return carry, (rot, org, rc, w, wd, a_com, ax_w)

        init = (base_rot, base_pos, w0, wd0, a0)
        _, out = jax.lax.scan(body, init, jnp.arange(5))
        return out

    return jax.vmap(one_leg)(jnp.arange(2))


def rnea(base_pos, base_rot, q, nu, nu_dot, gravity):
    """Required generalized forces tau (16,) for the given motion.

    gravity: scalar magnitude (0 for mass-matrix columns).
    """
    dtype = base_pos.dtype
    g_vec = jnp.asarray([0.0, 0.0, -gravity], dtype)
    mass = _leg_const('mass', dtype)
    inert = _leg_const('inertia', dtype)

    rot, org, rc, w, wd, a_com, ax_w = _kinematics(
        base_pos, base_rot, q, nu, nu_dot, dtype)

    # trunk body
    w0, wd0, a0 = nu[3:6], nu_dot[3:6], nu_dot[0:3]
    i0 = base_rot @ jnp.asarray(mdl.TRUNK_INERTIA, dtype) @ base_rot.T
    f_trunk = mdl.TRUNK_MASS * (a0 - g_vec)
    t_trunk = i0 @ wd0 + jnp.cross(w0, i0 @ w0)

    # per-link Newton-Euler about each com
    i_w = rot @ inert @ jnp.swapaxes(rot, -1, -2)
    f = mass[..., None] * (a_com - g_vec)                      # (2,5,3)
    t = (jnp.einsum('ljab,ljb->lja', i_w, wd)
         + jnp.cross(w, jnp.einsum('ljab,ljb->lja', i_w, w)))  # (2,5,3)

    # backward pass: subtree wrench about each joint origin -> joint torque
    def leg_torques(leg):
        def body(carry, jr):
            j = 4 - jr
            f_sub, t_sub, p_ref = carry  # wrench about p_ref (origin j+1)
            # shift reference point to origin j and add body j
            t_sub = t_sub + jnp.cross(p_ref - org[leg, j], f_sub)
            f_sub = f_sub + f[leg, j]
            t_sub = t_sub + t[leg, j] + jnp.cross(
                rc[leg, j] - org[leg, j], f[leg, j])
            tau_j = jnp.dot(ax_w[leg, j], t_sub)
            return (f_sub, t_sub, org[leg, j]), tau_j

        zero = jnp.zeros(3, dtype)
        carry, taus = jax.lax.scan(
            body, (zero, zero, org[leg, 4]), jnp.arange(5))
        f_leg, t_leg, p_leg = carry
        return taus[::-1], f_leg, t_leg, p_leg

    taus, f_leg, t_leg, p_leg = jax.vmap(leg_torques)(jnp.arange(2))

    # base wrench: trunk + both legs' subtree wrenches about the base origin
    f_base = f_trunk + f_leg.sum(0)
    t_base = t_trunk
    for leg in range(2):
        t_base = t_base + t_leg[leg] + jnp.cross(
            p_leg[leg] - base_pos, f_leg[leg])

    return jnp.concatenate([f_base, t_base, taus.reshape(10)])


def mass_matrix(base_pos, base_rot, q):
    """(16, 16) generalized mass matrix via unit accelerations."""
    eye = jnp.eye(_N_DOF, dtype=base_pos.dtype)
    zero = jnp.zeros(_N_DOF, dtype=base_pos.dtype)
    cols = jax.vmap(
        lambda e: rnea(base_pos, base_rot, q, zero, e, 0.0))(eye)
    return cols.T


def bias_forces(base_pos, base_rot, q, nu, gravity):
    """C(q, nu) nu + G(q)."""
    zero = jnp.zeros(_N_DOF, dtype=base_pos.dtype)
    return rnea(base_pos, base_rot, q, nu, zero, gravity)


# Trunk collision-box corners in the trunk frame (robot.xacro:49-54:
# <box size="trunk_length trunk_width trunk_height"> at the trunk origin,
# const.xacro: 0.125 x 0.19 x 0.248).  These give a falling tier-2 body
# physical ground contact (the Gazebo analog collides every link), so falls
# come to rest on the plant instead of passing through into NaN quarantine.
TRUNK_CORNERS = np.array(
    [[sx * 0.0625, sy * 0.095, sz * 0.124]
     for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)])
N_BODY_POINTS = len(TRUNK_CORNERS) + 2   # + one knee point per leg


def contact_points_and_jac(base_pos, base_rot, q, nu, cps=None,
                           include_body: bool = False):
    """World contact points (P, 3), their velocities (P, 3), and the
    contact jacobian J (P, 3, 16) via unit generalized velocities
    (P = 2 legs x len(CONTACT_POINTS_TOE) [+ N_BODY_POINTS]).

    cps: optional (P/2, 3) toe-frame contact offsets overriding the URDF
    box corners (contact-geometry sensitivity studies).
    include_body: append the trunk-box corners and the knee (calf-origin)
    points -- the fall-contact geometry (toe points stay FIRST so
    per-leg slicing of the leading 2*len(cps) entries is unchanged)."""
    dtype = base_pos.dtype
    if cps is None:
        cps = jnp.asarray(mdl.CONTACT_POINTS_TOE, dtype)
    # per-leg mirror of the toe-box y offset (leg.xacro toe collision
    # origin y = toe_y*mirror): cps is given in the LEFT toe frame
    cps2 = jnp.stack([cps, cps * jnp.asarray([1.0, -1.0, 1.0], dtype)])

    rots, orgs, _ = fk_chain(base_pos, base_rot, q)
    toe_rot = rots[:, 4]
    toe_org = orgs[:, 4]
    pts = (toe_org[:, None, :]
           + jnp.einsum('lab,lpb->lpa', toe_rot, cps2)).reshape(-1, 3)
    if include_body:
        rc_trunk = jnp.einsum('ab,pb->pa', base_rot,
                              jnp.asarray(TRUNK_CORNERS, dtype))
        pts = jnp.concatenate(
            [pts, base_pos[None] + rc_trunk, orgs[:, 3]], axis=0)

    def point_vel(nu_):
        v0, w0 = nu_[0:3], nu_[3:6]
        qd = nu_[6:].reshape(2, 5)
        # velocity of each contact point: propagate joint rates
        rot2, org2, rc2, w2, wd2, a2, ax2 = _kinematics(
            base_pos, base_rot, q, nu_, jnp.zeros_like(nu_), dtype)
        w_toe = w2[:, 4]
        # velocity of toe origin: v0 + w x r summed down the chain --
        # compute via finite kinematic chain: velocity of origin j
        def leg_org_vel(leg):
            def body(carry, j):
                v_p, w_p, org_p = carry
                d = org2[leg, j] - org_p
                v = v_p + jnp.cross(w_p, d)
                return (v, w2[leg, j], org2[leg, j]), v
            (_, _, _), vs = jax.lax.scan(
                body, (v0, w0, base_pos), jnp.arange(5))
            return vs
        v_orgs = jax.vmap(leg_org_vel)(jnp.arange(2))   # (2,5,3)
        v_toe = v_orgs[:, 4]
        vp = (v_toe[:, None, :] + jnp.cross(
            w_toe[:, None, :],
            jnp.einsum('lab,lpb->lpa', toe_rot, cps2))).reshape(-1, 3)
        if include_body:
            vp_trunk = v0[None] + jnp.cross(w0[None], rc_trunk)
            vp = jnp.concatenate([vp, vp_trunk, v_orgs[:, 3]], axis=0)
        return vp

    vels = point_vel(nu)
    jac = jax.vmap(point_vel)(jnp.eye(_N_DOF, dtype=dtype))   # (16,P,3)
    return pts, vels, jnp.transpose(jac, (1, 2, 0))
