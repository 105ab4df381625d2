"""Tier-1 batched plant: single-rigid-body dynamics + joint servos +
schedule-driven contact.

Replaces the Gazebo/ODE process (``unitree_ros/unitree_gazebo`` +
``unitree_legged_control``, SURVEY.md §2.3) with a pure JAX step so plant and
controller fuse into one jitted program -- the reference's process boundary
(10 ROS topics each way at 1 kHz, CheatIO.cpp:84-117) disappears.

Modeling tier (documented, deliberately matched to the MPC's own fidelity):

- the floating base is a single rigid body with the URDF's lumped mass
  13.856 kg and trunk+thigh inertia (Biped.h:10, RobotState.cpp:45) --
  unlike the MPC model's 9.0 kg quirk, the plant uses the real mass;
- stance feet are anchored at their touchdown point; the commanded
  ground-reaction wrench (from the stance torque command, which encodes
  -R^T f_ff) acts on the body.  Torque limits are enforced in joint space:
  the commanded wrench is clipped by the factor that keeps
  tau = J_fm^T f within +-33.5 Nm (joint_controller.cpp:208-224 clamps
  per-joint; we use the tightest per-leg scaling, which is conservative);
- swing legs are kinematic: joints track their PD targets through a
  first-order servo with the URDF's 21 rad/s velocity limit;
- contact follows the gait schedule (the MPC's own assumption); touchdown
  re-anchors the foot at the current FK position with z = 0;
- ground reactions are UNILATERAL: beyond the commanded wrench (whose Fz is
  already >= 0 by the MPC cone), stance feet get a clipped spring-damper
  normal force on FK-foot ground penetration and a trunk-sphere backstop
  keeps fallen bodies from tunnelling -- the batched analog of the ODE
  contact in unitree_gazebo/worlds/normal.world (max_step_size 0.001,
  penalty-style quick solver).  Nothing can "hang" from a scheduled
  contact: zero commanded force means the body falls until a physical
  contact force stops it (tests/test_plant_contact.py).

The actuator law is the open reimplementation of the closed-source
``computeTorque`` servo (unitree_joint_control_tool.h: tau =
Kp (q_des - q) + Kd (dq_des - dq) + tau_ff, clamped to the URDF effort
limit 33.5 Nm).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import HectorConfig, DEFAULT_CONFIG
from .. import math as hm
from ..kinematics import (foot_position, leg_jacobians, leg_ik,
                          apply_joint_offsets)


class PlantState(NamedTuple):
    position: jnp.ndarray     # (3,) world CoM
    quat: jnp.ndarray         # (4,) wxyz body->world
    v_world: jnp.ndarray      # (3,)
    omega_world: jnp.ndarray  # (3,)
    q: jnp.ndarray            # (2, 5) raw motor angles
    qd: jnp.ndarray           # (2, 5)
    foot_anchor: jnp.ndarray  # (2, 3) world stance anchors
    contact: jnp.ndarray      # (2,) bool, previous-tick contact


def nominal_joint_angles(dtype=jnp.float32):
    """Raw motor angles for the nominal knee-bent stance (the xacro spawn
    configuration is near the offset-corrected zero pose)."""
    return jnp.zeros((2, 5), dtype)


def init_plant_state(cfg: HectorConfig = DEFAULT_CONFIG, height=None,
                     dtype=jnp.float32) -> PlantState:
    q = nominal_joint_angles(dtype)
    p_leg = foot_position(q, cfg)
    hip_yaw = jnp.asarray(
        [cfg.robot.hip_yaw_location(0), cfg.robot.hip_yaw_location(1)], dtype)
    if height is None:
        # stand with feet exactly on the ground plane
        height = -(hip_yaw[0, 2] + p_leg[0, 2])
    position = jnp.asarray([0.0, 0.0, height], dtype)
    anchors = position[None, :] + hip_yaw + p_leg
    anchors = anchors.at[:, 2].set(0.0)
    return PlantState(
        position=position,
        quat=jnp.asarray([1.0, 0, 0, 0], dtype),
        v_world=jnp.zeros(3, dtype),
        omega_world=jnp.zeros(3, dtype),
        q=q, qd=jnp.zeros((2, 5), dtype),
        foot_anchor=anchors,
        contact=jnp.ones((2,), bool))


def servo_torque(cmd, q, qd, cfg: HectorConfig):
    """tau = clip(Kp (q*-q) + Kd (dq*-dq) + tau_ff, +-33.5)
    (unitree joint servo law + URDF effort clamp)."""
    tau = cmd.kp * (cmd.q_des - q) + cmd.kd * (cmd.qd_des - qd) + cmd.tau
    return jnp.clip(tau, -cfg.plant.torque_limit, cfg.plant.torque_limit)


def terrain_height(x, step_height, step_length):
    """Stairs-style heightfield h(x) = step_height * floor(x / step_length)
    (the batched analog of the reference's stairs world,
    unitree_gazebo/worlds/stairs.world); step_height = 0 -> flat ground."""
    return step_height * jnp.floor(x / jnp.maximum(step_length, 1e-3))


def step(state: PlantState, cmd, wrench_world, contact_sched,
         disturbance=None, terrain=None,
         cfg: HectorConfig = DEFAULT_CONFIG) -> PlantState:
    """One 1 ms physics tick.

    cmd: MotorCommand (leg-major (2,5) arrays); wrench_world: (2, 6) world
    GRF+GRM commanded for stance legs (from the MPC solution); contact_sched:
    (2,) gait-scheduled contact flags for this tick; disturbance: optional
    (6,) world wrench on the trunk (external-push testing, the analog of
    unitree_controller's external_force teleop); terrain: optional
    (step_height, step_length) scalars for the stairs heightfield -- the
    controller keeps the reference's flat-ground model, so terrain acts as a
    model-mismatch robustness perturbation.
    """
    dtype = state.position.dtype
    pcfg = cfg.plant
    dt = jnp.asarray(pcfg.dt, dtype)
    mass = jnp.asarray(pcfg.mass, dtype)
    g_vec = jnp.asarray([0.0, 0.0, -pcfg.gravity], dtype)

    in_contact = contact_sched > 0

    # torque-feasibility scaling of the commanded stance wrench: find the
    # per-leg factor s in (0, 1] with |J^T (s w)| <= tau_max
    j_fm, _ = leg_jacobians(state.q, cfg)
    r_body = jnp.swapaxes(hm.quat_to_rot(state.quat), -1, -2)
    f_body = jnp.concatenate([
        -(wrench_world[:, 0:3] @ r_body.T),
        -(wrench_world[:, 3:6] @ r_body.T)], axis=-1)
    tau_wrench = jnp.einsum('lji,lj->li', j_fm, f_body)
    tau_peak = jnp.max(jnp.abs(tau_wrench), axis=-1)
    scale = jnp.minimum(1.0, pcfg.torque_limit /
                        jnp.maximum(tau_peak, 1e-6))
    wrench_eff = wrench_world * (scale * in_contact)[:, None]

    # --- unilateral ground contact (replaces the r1 z-freeze hack) ---
    # spring-damper normal force, CLIPPED at zero (no adhesion), on the
    # FK-foot's penetration below local ground; active only for scheduled
    # stance feet.  The foot velocity is approximated by the body velocity
    # (the stance foot is quasi-static relative to its anchor).
    rot = hm.quat_to_rot(state.quat)                   # body->world
    hip_yaw0 = jnp.asarray(
        [cfg.robot.hip_yaw_location(0), cfg.robot.hip_yaw_location(1)], dtype)
    fk_foot0 = state.position[None, :] + \
        (hip_yaw0 + foot_position(state.q, cfg)) @ rot.T
    if terrain is not None:
        foot_ground0 = terrain_height(fk_foot0[:, 0], terrain[0], terrain[1])
        trunk_ground = terrain_height(state.position[0], terrain[0],
                                      terrain[1])
    else:
        foot_ground0 = jnp.zeros((2,), dtype)
        trunk_ground = jnp.asarray(0.0, dtype)
    pen = foot_ground0 - fk_foot0[:, 2]
    n_foot = jnp.maximum(
        0.0, pcfg.contact_kp * pen - pcfg.contact_kd * state.v_world[2])
    n_foot = n_foot * in_contact * (pen > 0)

    # trunk-sphere backstop: a fallen/limp body rests on the ground instead
    # of tunnelling (the trunk collision geometry of the URDF)
    pen_trunk = trunk_ground + pcfg.trunk_radius - state.position[2]
    n_trunk = jnp.maximum(
        0.0, pcfg.contact_kp * pen_trunk
        - pcfg.contact_kd * state.v_world[2]) * (pen_trunk > 0)

    # plant-side friction clamp on each foot's total shear (the commanded
    # GRF already satisfies the MPC cone; this enforces the GROUND's limit
    # against out-of-cone residuals, mu from the world physics)
    fz_tot = wrench_eff[:, 2] + n_foot
    shear = wrench_eff[:, 0:2]
    shear_mag = jnp.linalg.norm(shear, axis=-1)
    shear_cap = pcfg.ground_mu * jnp.maximum(fz_tot, 0.0)
    shear_scale = jnp.minimum(1.0, shear_cap / jnp.maximum(shear_mag, 1e-9))
    wrench_eff = wrench_eff.at[:, 0:2].multiply(shear_scale[:, None])

    # --- base dynamics ---
    grf = wrench_eff[:, 0:3].at[:, 2].add(n_foot)
    grm = wrench_eff[:, 3:6]
    force = jnp.sum(grf, axis=0).at[2].add(n_trunk)
    r_arm = state.foot_anchor - state.position[None, :]
    torque = jnp.sum(jnp.cross(r_arm, grf) + grm, axis=0)
    if disturbance is not None:
        force = force + disturbance[0:3]
        torque = torque + disturbance[3:6]

    i_body = jnp.diag(jnp.asarray(pcfg.inertia_body, dtype))
    i_world = rot @ i_body @ rot.T
    omega = state.omega_world
    omega_dot = hm.inv3(i_world) @ (
        torque - jnp.cross(omega, i_world @ omega))

    v_new = state.v_world + dt * (force / mass + g_vec)
    p_new = state.position + dt * v_new                # semi-implicit Euler
    omega_new = omega + dt * omega_dot
    quat_new = hm.quat_integrate(state.quat, omega_new, dt)

    # --- joint kinematics (first-order servo tracking) ---
    # swing legs track the PD targets; stance legs track the IK of the
    # anchored foot in the (new) body frame so the controller's FK-based
    # foot positions reflect the anchored contact (up to the reference's
    # own FK-vs-IK constant mismatch, a few mm).
    rot_new = hm.quat_to_rot(quat_new)                 # body->world
    r_body_new = jnp.swapaxes(rot_new, -1, -2)         # world->body
    side = jnp.asarray([-1.0, 1.0], dtype)
    hip_width = jnp.stack([
        jnp.full((2,), cfg.swing.hip_width_offset_x, dtype),
        side * cfg.swing.hip_width_offset_y,
        jnp.zeros((2,), dtype)], axis=-1)
    anchor_b = ((state.foot_anchor - p_new[None, :]) @ r_body_new.T
                + hip_width)
    q_stance = leg_ik(anchor_b, apply_joint_offsets(state.q), cfg)

    has_target = (cmd.kp > 0) | in_contact[:, None]
    q_target = jnp.where(in_contact[:, None], q_stance, cmd.q_des)
    track = jnp.asarray(pcfg.joint_tracking_tau, dtype)
    qd_des = jnp.clip((q_target - state.q) / track,
                      -pcfg.joint_vel_limit, pcfg.joint_vel_limit)
    # limp joints (kp == 0, kd >= 0 -- e.g. passive mode's kd=5 damping
    # command, FSMState_Passive.cpp:10): the servo's kd acts on the link's
    # effective inertia as an implicit first-order velocity decay, so a
    # limp leg damps out instead of freezing.
    qd_limp = state.qd / (1.0 + dt * cmd.kd / pcfg.swing_joint_inertia)
    qd_new = jnp.where(has_target, qd_des, qd_limp)
    q_new = state.q + dt * qd_new

    # --- contact transitions: anchor at touchdown ---
    hip_yaw = jnp.asarray(
        [cfg.robot.hip_yaw_location(0), cfg.robot.hip_yaw_location(1)], dtype)
    p_leg = foot_position(q_new, cfg)
    fk_foot = p_new[None, :] + (hip_yaw + p_leg) @ rot_new.T
    touchdown = in_contact & ~state.contact
    if terrain is not None:
        foot_ground = terrain_height(fk_foot[:, 0], terrain[0], terrain[1])
    else:
        foot_ground = jnp.zeros((2,), dtype)
    anchors = jnp.where(touchdown[:, None],
                        fk_foot.at[:, 2].set(foot_ground),
                        state.foot_anchor)

    return PlantState(
        position=p_new, quat=quat_new, v_world=v_new,
        omega_world=omega_new, q=q_new, qd=qd_new,
        foot_anchor=anchors, contact=in_contact)
