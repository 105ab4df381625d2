"""Tier-2 plant: full articulated dynamics (11 lumped bodies, 16 DoF) with
penalty ground contact.

The higher-fidelity replacement for Gazebo/ODE (SURVEY.md §2.3 tier 2):
joint servos produce torques, RNEA-based forward dynamics produce
accelerations, and ground reaction forces come from a spring-damper contact
model at the toe/heel points of each line foot (the reference's ODE contact
with cfm/erp plays the same role at the same 1 kHz step).

Unlike the tier-1 SRB plant, nothing about the MPC's model is assumed:
contact forces are emergent, torque limits act at the joints, and swing legs
have real inertia.  This is the plant for fidelity studies; the throughput
benchmarks use the SRB tier.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import HectorConfig, DEFAULT_CONFIG
from .. import math as hm
from . import rnea
from .model import CONTACT_POINTS_TOE, TOE_BOX_Y_CENTER
from .srb import terrain_height

N_TOE = 2 * len(CONTACT_POINTS_TOE)       # both legs' toe-box corners
# + trunk-box corners and knee points (rnea.TRUNK_CORNERS; robot.xacro
# collision boxes): a falling body lands on physics, not NaN quarantine.
# Toe points stay FIRST so per-leg slices of [:N_TOE] are unchanged.
N_CONTACT = N_TOE + rnea.N_BODY_POINTS

# Height of the reference FK foot point (LegController.cpp:190-194 chain,
# hector/kinematics.foot_position) above the ground plane when the toe box
# rests flat -- a fixed calibration constant of the FK-vs-collision-geometry
# mismatch (the FK chain ends mid-toe, l_toe=0.036, while the URDF's toe
# collision box bottom sits 0.04 below the toe frame).  Measured at the
# settled nominal stance; tests/test_whole_body.py checks it to 5 mm.
# Consumed by the contact-aided KF's foot-height measurement (ground_z).
FK_FOOT_CLEARANCE = 0.0682


class WholeBodyState(NamedTuple):
    position: jnp.ndarray     # (3,) trunk origin (== trunk com), world
    quat: jnp.ndarray         # (4,) wxyz
    v_world: jnp.ndarray      # (3,)
    omega_world: jnp.ndarray  # (3,)
    q: jnp.ndarray            # (2, 5) joint angles (URDF zero config)
    qd: jnp.ndarray           # (2, 5)
    anchor: jnp.ndarray       # (P, 2) xy stiction anchors per contact point
    sticking: jnp.ndarray     # (P,) bool: anchor valid


class ContactConfig(NamedTuple):
    """Contact gains at the reference's Gazebo levels (gazebo.xacro:
    kp=1e5, kd=1e3+, toe mu1=1); the dampers are integrated implicitly
    (folded into the mass-matrix solve), which is what makes these
    ODE-class stiffnesses stable at dt=0.25 ms."""

    k_normal: float = 1.0e5    # N/m ground stiffness (gazebo kp)
    d_normal: float = 2.0e3    # N s/m (implicit)
    mu: float = 1.0            # toe friction (gazebo mu1)
    k_anchor: float = 2.0e4    # N/m stiction spring toward the anchor
    k_tangent: float = 2.0e3   # N s/m tangential damping (implicit)
    # energy backstops for violent impacts -- the penalty-model analog of
    # ODE's <contact_max_correcting_vel>10</> + <contact_surface_layer>
    # (normal.world constraints block): the spring force saturates at
    # pen_cap penetration, and base velocities are clamped far outside
    # the operating envelope (walking: |v|<2, |w|<5).  Without these an
    # explicit stiff spring under a fast-tumbling body pumps energy.
    pen_cap: float = 0.02      # m, spring saturation depth (2000 N/point)
    v_cap: float = 10.0        # m/s  (= ODE contact_max_correcting_vel)
    w_cap: float = 30.0        # rad/s
    # diagnostic axes for contact-geometry sensitivity studies
    # (benchmarks/lateral_sweep.py): toe_halfwidth_scale scales the
    # toe-box corner y spacing away from the URDF's 2 cm (1.0 = real);
    # toe_y_offset shifts the box outboard per leg -- the URDF's actual
    # toe_y = 0.0194 m, modeled as 0 in production (documented divergence,
    # plant/model.py CONTACT_POINTS_TOE comment)
    toe_halfwidth_scale: float = 1.0
    toe_y_offset: float = 0.0


def init_whole_body_state(height: float = 0.55,
                          dtype=jnp.float32) -> WholeBodyState:
    return WholeBodyState(
        position=jnp.asarray([0.0, 0.0, height], dtype),
        quat=jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype),
        v_world=jnp.zeros(3, dtype),
        omega_world=jnp.zeros(3, dtype),
        q=jnp.zeros((2, 5), dtype),
        qd=jnp.zeros((2, 5), dtype),
        anchor=jnp.zeros((N_CONTACT, 2), dtype),
        sticking=jnp.zeros((N_CONTACT,), bool))


def contact_forces(points, vels, anchor, sticking, terrain,
                   ccfg: ContactConfig):
    """(spring forces f0 (P, 3), implicit damping gains d (P, 3),
    new_anchor, new_sticking).

    Normal: spring (explicit) + damper (returned as a gain and folded into
    the mass-matrix solve by the caller -- implicit, so ODE-class damping
    levels stay stable).  Tangential: anchored stiction spring, cone-clipped
    against the current normal-force estimate; on saturation the anchor
    slides to the cone boundary (ODE LCP-style stick/slip)."""
    if terrain is not None:
        ground = terrain_height(points[:, 0], terrain[0], terrain[1])
    else:
        ground = jnp.zeros(points.shape[0], points.dtype)
    phi = points[:, 2] - ground
    pen = jnp.minimum(jnp.maximum(0.0, -phi), ccfg.pen_cap)
    in_contact = phi < 0
    fn_spring = ccfg.k_normal * pen * in_contact
    # conservative normal-force estimate for the friction cone
    fn_est = jnp.maximum(
        0.0, fn_spring - ccfg.d_normal * vels[:, 2] * in_contact)

    new_stick = in_contact
    anchor = jnp.where((in_contact & ~sticking)[:, None],
                       points[:, :2], anchor)
    ft = -ccfg.k_anchor * (points[:, :2] - anchor) * in_contact[:, None]
    ft_norm = jnp.linalg.norm(ft, axis=-1, keepdims=True)
    ft_max = ccfg.mu * fn_est[:, None]
    scale = jnp.minimum(1.0, ft_max / jnp.maximum(ft_norm, 1e-9))
    ft = ft * scale
    # slipping: drag the anchor so the spring sits on the cone boundary
    slipped = (scale[:, 0] < 1.0) & in_contact
    anchor_slip = points[:, :2] + ft / ccfg.k_anchor
    anchor = jnp.where(slipped[:, None], anchor_slip, anchor)

    f0 = jnp.concatenate([ft, fn_spring[:, None]], axis=-1)
    gains = jnp.stack([
        ccfg.k_tangent * in_contact, ccfg.k_tangent * in_contact,
        ccfg.d_normal * in_contact], axis=-1)
    return f0, gains, anchor, new_stick


def step(state: WholeBodyState, cmd, cfg: HectorConfig = DEFAULT_CONFIG,
         terrain=None, disturbance=None,
         ccfg: ContactConfig = ContactConfig(),
         n_substeps: int = 4) -> WholeBodyState:
    """One 1 ms control tick = ``n_substeps`` dynamics substeps.

    cmd: MotorCommand (leg-major (2,5)); the servo law and +-33.5 Nm clamp
    match the Gazebo joint plugin (joint_controller.cpp:139-224).
    """
    dtype = state.position.dtype
    dt = jnp.asarray(cfg.plant.dt / n_substeps, dtype)
    # toe_halfwidth_scale widens the corner spread; toe_y_offset shifts
    # the box outboard (LEFT-frame cps; rnea mirrors y per leg)
    cps0 = jnp.asarray(CONTACT_POINTS_TOE, dtype)
    s_w = jnp.asarray(ccfg.toe_halfwidth_scale, dtype)
    y_off = jnp.asarray(ccfg.toe_y_offset, dtype)
    cps = cps0.at[:, 1].set(y_off + s_w * cps0[:, 1])

    joint_damping = jnp.asarray(0.1, dtype)  # URDF <dynamics damping>

    def substep(s, _):
        rot = hm.quat_to_rot(s.quat)
        # Implicit ("implicitfast") treatment of the stiff joint terms: the
        # toe joint has ~2e-4 kg m^2 effective inertia, so explicit PD at
        # kp~300 diverges at any practical dt.  Split the servo law
        #   tau = tau0 - A qd+   with  tau0 = kp (q*-q) + kd dq* + tau_ff
        #                              A    = kd + damping + dt kp
        # and fold the qd+ term into the mass matrix diagonal.
        tau0 = cmd.kp * (cmd.q_des - s.q) + cmd.kd * cmd.qd_des + cmd.tau
        tau0 = jnp.clip(tau0, -cfg.plant.torque_limit, cfg.plant.torque_limit)
        a_imp = (cmd.kd + joint_damping + dt * cmd.kp).reshape(10)

        nu = jnp.concatenate([s.v_world, s.omega_world, s.qd.reshape(10)])
        m = rnea.mass_matrix(s.position, rot, s.q)
        bias = rnea.bias_forces(s.position, rot, s.q, nu, cfg.plant.gravity)

        pts, vels, jac = rnea.contact_points_and_jac(
            s.position, rot, s.q, nu, cps=cps, include_body=True)
        f0, d_gain, anchor, sticking = contact_forces(
            pts, vels, s.anchor, s.sticking, terrain, ccfg)
        # implicit contact damping: f_c = f0 - D (v + dt J nu_dot)
        q_contact = jnp.einsum('pci,pc->i', jac, f0 - d_gain * vels)

        q_applied = jnp.concatenate(
            [jnp.zeros(6, dtype),
             tau0.reshape(10) - a_imp * s.qd.reshape(10)]) + q_contact
        if disturbance is not None:
            q_applied = q_applied.at[0:6].add(disturbance)

        m = m.at[jnp.arange(6, 16), jnp.arange(6, 16)].add(dt * a_imp)
        # fold dt J^T D J into the LHS (unconditionally stable damping)
        m = m + dt * jnp.einsum('pci,pc,pcj->ij', jac, d_gain, jac)
        reg = 1e-6 * jnp.eye(16, dtype=dtype)
        nu_dot = jnp.linalg.solve(m + reg, q_applied - bias)

        v_new = s.v_world + dt * nu_dot[0:3]
        w_new = s.omega_world + dt * nu_dot[3:6]
        # base-velocity energy backstop (see ContactConfig.v_cap/w_cap)
        v_new = v_new * jnp.minimum(
            1.0, ccfg.v_cap / jnp.maximum(jnp.linalg.norm(v_new), 1e-9))
        w_new = w_new * jnp.minimum(
            1.0, ccfg.w_cap / jnp.maximum(jnp.linalg.norm(w_new), 1e-9))
        qd_new = jnp.clip(s.qd + dt * nu_dot[6:].reshape(2, 5),
                          -cfg.plant.joint_vel_limit,
                          cfg.plant.joint_vel_limit)
        # URDF joint limits (hip/hip2 +-45deg, knee chain +-100deg); a
        # pinned joint also sheds its outward velocity (an inelastic joint
        # stop) -- clipping q alone would leave phantom qd feeding RNEA
        q_lim = jnp.asarray([0.785, 0.785, 1.745, 1.745, 1.745],
                            dtype)[None, :]
        q_raw = s.q + dt * qd_new
        q_new = jnp.clip(q_raw, -q_lim, q_lim)
        qd_new = jnp.where((q_raw > q_lim) & (qd_new > 0), 0.0,
                           jnp.where((q_raw < -q_lim) & (qd_new < 0), 0.0,
                                     qd_new))
        return WholeBodyState(
            position=s.position + dt * v_new,
            quat=hm.quat_integrate(s.quat, w_new, dt),
            v_world=v_new, omega_world=w_new,
            q=q_new, qd=qd_new,
            anchor=anchor, sticking=sticking), None

    out, _ = jax.lax.scan(substep, state, None, length=n_substeps)
    return out


def foot_positions(state: WholeBodyState):
    """World toe-box corner contact points (2 legs, P/2 points, 3)."""
    rot = hm.quat_to_rot(state.quat)
    nu = jnp.zeros(16, state.position.dtype)
    pts, _, _ = rnea.contact_points_and_jac(
        state.position, rot, state.q, nu)
    return pts.reshape(2, -1, 3)
