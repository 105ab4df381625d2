"""State estimation, desired-command integration, leg-level torque mapping,
and the FSM-as-array.

TPU-native rebuild of:

- cheater estimators (``src/common/OrientationEstimator.cpp``,
  ``PositionVelocityEstimator.cpp``): ground-truth passthrough + derived
  rotation/rpy.  The reference's ``omegaBody = rBody * omegaBody`` uses the
  stale (zero-initialized) value (OrientationEstimator.cpp:29-30) and
  omegaBody is never consumed -- we drop the field.
- ``DesiredStateCommand`` (``src/common/DesiredCommand.cpp``): velocity and
  yaw-rate command; the integrated yaw (stateDes[5]) is dead code for the
  MPC (ConvexMPCLocomotion uses a 0 yaw target when yaw_rate == 0) but kept
  in the carry for API parity.
- ``LegController::updateCommand`` (``src/common/LegController.cpp:57-106``):
  tau = J_force_moment^T @ feedforwardForce, plus per-joint PD setpoints.
- the FSM (``src/FSM/FSM.cpp``): mode as an int array; safety check
  rBody(2,2) < 0.5 -> passive (FSM.cpp:78-87); passive = damping-only mode
  kd = 5 (FSMState_Passive.cpp:10).  Per-scenario, so a batch member that
  falls flips itself to damping without affecting the others.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .config import HectorConfig, DEFAULT_CONFIG
from . import math as hm

MODE_PASSIVE = 0
MODE_WALKING = 1


class StateEstimate(NamedTuple):
    """Mirror of StateEstimate (include/common/StateEstimatorContainer.h:48).

    r_body is the world->body matrix (the reference's rBody,
    ori::quaternionToRotationMatrix convention)."""

    position: jnp.ndarray      # (3,)
    v_world: jnp.ndarray       # (3,)
    v_body: jnp.ndarray        # (3,)
    omega_world: jnp.ndarray   # (3,)
    quat: jnp.ndarray          # (4,) wxyz
    rpy: jnp.ndarray           # (3,)
    r_body: jnp.ndarray        # (3, 3) world->body


def estimate_state(position, v_world, quat, omega_world) -> StateEstimate:
    """Cheater estimator passthrough (ground truth from the plant)."""
    r_body = jnp.swapaxes(hm.quat_to_rot(quat), -1, -2)
    return StateEstimate(
        position=position, v_world=v_world,
        v_body=r_body @ v_world,
        omega_world=omega_world, quat=quat,
        rpy=hm.quat_to_rpy(quat), r_body=r_body)


class CommandState(NamedTuple):
    """DesiredStateCommand carry: the integrated yaw setpoint
    (DesiredCommand.cpp:26-38)."""

    yaw_des: jnp.ndarray       # scalar


def command_update(state: CommandState, est: StateEstimate, yaw_rate, dt):
    """Integrate yaw with the +-3.1 wrap guard (DesiredCommand.cpp:26-38)."""
    yaw = state.yaw_des + dt * yaw_rate
    yaw = jnp.where((yaw > 3.1) & (est.rpy[2] < 0), est.rpy[2], yaw)
    yaw = jnp.where((yaw < -3.1) & (est.rpy[2] > 0), est.rpy[2], yaw)
    return CommandState(yaw_des=yaw)


class MotorCommand(NamedTuple):
    """Per-motor command arrays, the LowlevelCmd equivalent
    (include/messages/LowLevelCmd.h:36-56), leg-major (2, 5)."""

    tau: jnp.ndarray
    q_des: jnp.ndarray
    qd_des: jnp.ndarray
    kp: jnp.ndarray
    kd: jnp.ndarray


def leg_torque_command(j_force_moment, f_ff, stance_mask, q_des, kp, kd,
                       dtype=None) -> MotorCommand:
    """tau = J_fm^T @ f_ff for stance legs; joint-PD setpoints for swing
    (LegController.cpp:57-106 + the stance/swing dispatch at
    ConvexMPCLocomotion.cpp:196-268).

    j_force_moment: (2, 6, 5); f_ff: (2, 6) body-frame stance wrench;
    stance_mask: (2,) contactState > 0; q_des/kp/kd: (2, 5) from the swing
    controller (already zero-gain for stance legs).
    """
    wrench = f_ff * stance_mask[:, None]
    tau = jnp.einsum('lji,lj->li', j_force_moment, wrench)
    return MotorCommand(
        tau=tau, q_des=q_des, qd_des=jnp.zeros_like(q_des), kp=kp, kd=kd)


def apply_safety(mode, est: StateEstimate):
    """FSM::checkSafty (FSM.cpp:78-87): rBody(2,2) < 0.5 -> passive.
    Passive is absorbing (the reference's checkTransition for Passive has a
    missing-return bug, FSMState_Passive.cpp:33-39; behaviorally the robot
    stays limp once fallen).

    Extended with NaN quarantine (SURVEY.md §5 failure-detection plan): a
    scenario whose state went non-finite is frozen to passive so it cannot
    poison batch-level reductions; per-lane, so the rest of the batch keeps
    running."""
    unhealthy = ~(jnp.isfinite(est.position).all()
                  & jnp.isfinite(est.v_world).all()
                  & jnp.isfinite(est.quat).all())
    fallen = (est.r_body[2, 2] < 0.5) | unhealthy
    return jnp.where(fallen, MODE_PASSIVE, mode)


def apply_mode(cmd: MotorCommand, mode) -> MotorCommand:
    """Passive mode: zero torques/targets, pure damping kd = 5
    (FSMState_Passive.cpp:10)."""
    passive = mode == MODE_PASSIVE
    z = jnp.zeros_like(cmd.tau)
    kd_passive = jnp.full_like(cmd.kd, 5.0)
    return MotorCommand(
        tau=jnp.where(passive, z, cmd.tau),
        q_des=jnp.where(passive, z, cmd.q_des),
        qd_des=jnp.where(passive, z, cmd.qd_des),
        kp=jnp.where(passive, z, cmd.kp),
        kd=jnp.where(passive, kd_passive, cmd.kd))
