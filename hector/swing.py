"""Swing-leg controller: Raibert placement, Bezier trajectory, IK setpoints.

TPU-native rebuild of ``src/common/SwingLegController.cpp`` as a pure
function over a small carry.  All branches become masks; both legs are
processed as one (2, ...) axis; vmap adds the scenario batch.

Reference quirks reproduced:

- ``updateSwingLeg()`` is invoked TWICE per control tick (once per foot from
  the loop at ConvexMPCLocomotion.cpp:196-205), so the swing timers decrement
  by 2*dt per tick and the reset logic can fire between the two calls.  We
  apply the timer update twice and evaluate the rest once with the final
  timer values -- the observable commands equal the second call's outputs.
- the Bezier z-velocity is d/dphase, not d/dt (SwingLegController.cpp:141
  "FIX" comment); the commanded foot velocity zeroes the trajectory term:
  vFoot_b = rBody @ (0 * vDes - vWorld) (SwingLegController.cpp:149) -- and
  is then only stored into vDes whose cartesian-PD consumer is commented out
  in LegController.cpp:67-86, so we do not propagate it.
- foot world positions force z = 0 (SwingLegController.cpp:66-67).
- the swing apex height is 0.15 (set every tick at SwingLegController.cpp:105,
  overriding the 0.12 from init).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .config import HectorConfig, DEFAULT_CONFIG
from . import math as hm
from .kinematics import leg_ik


class SwingState(NamedTuple):
    """Carry of the swing controller (per scenario)."""

    first_swing: jnp.ndarray   # (2,) bool
    swing_times: jnp.ndarray   # (2,) remaining swing time [s]
    p0: jnp.ndarray            # (2, 3) Bezier start (world)
    pf: jnp.ndarray            # (2, 3) Bezier end (world)


def init_swing_state(p_foot_w, dtype=jnp.float32) -> SwingState:
    return SwingState(
        first_swing=jnp.ones((2,), bool),
        swing_times=jnp.zeros((2,), dtype),
        p0=p_foot_w.astype(dtype),
        pf=p_foot_w.astype(dtype))


def _update_swing_times_once(first_swing, swing_times, full_swing_time, dt):
    """One ``updateSwingTimes`` pass (SwingLegController.cpp:80-91):
    first-swing legs re-arm the timer; others count down and re-set the
    first-swing flag when expired."""
    t = jnp.where(first_swing, full_swing_time, swing_times - dt)
    first = jnp.where(first_swing, first_swing, t <= 0.0)
    return first, t


def swing_update(state: SwingState, est, leg_data_p, v_des_robot,
                 swing_phase, gait_stance_segments, n_segments,
                 cfg: HectorConfig = DEFAULT_CONFIG):
    """One controller tick of the swing pipeline (updateSwingLeg,
    SwingLegController.cpp:46-54).

    est: StateEstimate with position (3,), v_world (3,), r_body (3,3)
    world->body; leg_data_p: (2,3) leg-frame foot positions (FK);
    v_des_robot: (3,) commanded body-frame velocity; swing_phase: (2,)
    swing sub-phase; gait_stance_segments / n_segments: scalars (may be
    traced, enabling per-scenario gaits).

    Returns (new_state, p_foot_b (2,3) body-frame foot targets,
    in_swing (2,) bool).
    """
    dtype = leg_data_p.dtype
    sw = cfg.swing
    dt_swing = jnp.asarray(cfg.mpc.dt_mpc, dtype)
    dt = jnp.asarray(cfg.mpc.dt, dtype)
    r_body = est.r_body
    r_body_t = jnp.swapaxes(r_body, -1, -2)

    hip_yaw = jnp.asarray(
        [cfg.robot.hip_yaw_location(0), cfg.robot.hip_yaw_location(1)], dtype)

    # updateFootPosition: world foot positions, z forced to 0
    p_foot_w = est.position[None, :] + (hip_yaw + leg_data_p) @ r_body
    p_foot_w = p_foot_w.at[:, 2].set(0.0)

    # updateSwingTimes, applied twice (double-call quirk)
    full_swing = dt_swing * (n_segments - gait_stance_segments)
    first, times = _update_swing_times_once(
        state.first_swing, state.swing_times, full_swing, dt)
    first, times = _update_swing_times_once(first, times, full_swing, dt)

    # computeFootPlacement (SwingLegController.cpp:96-126)
    v_des_world = r_body_t @ v_des_robot
    v_w = est.v_world
    pf = est.position[None, :] + hip_yaw @ r_body + v_w[None, :] * times[:, None]
    k_stance = 0.5 * gait_stance_segments * dt_swing
    p_rel = (sw.raibert_gain * v_w[None, :2] * k_stance
             + sw.vel_gain * (v_w[None, :2] - v_des_world[None, :2]))
    p_rel = jnp.clip(p_rel, -sw.p_rel_max, sw.p_rel_max)
    pf = pf.at[:, :2].add(p_rel)
    pf = pf.at[:, 2].set(0.0)

    # computeFootDesiredPosition (SwingLegController.cpp:132-152)
    in_swing = swing_phase > 0
    consume_first = in_swing & first
    p0 = jnp.where(consume_first[:, None], p_foot_w, state.p0)
    first = jnp.where(in_swing, jnp.zeros_like(first), first)

    phase = swing_phase[:, None].astype(dtype)
    p_des = hm.cubic_bezier(p0, pf, phase)
    z_first = hm.cubic_bezier(p0[:, 2], p0[:, 2] + sw.swing_height,
                              swing_phase * 2.0)
    z_second = hm.cubic_bezier(p0[:, 2] + sw.swing_height, pf[:, 2],
                               swing_phase * 2.0 - 1.0)
    p_des = p_des.at[:, 2].set(
        jnp.where(swing_phase < 0.5, z_first, z_second))

    side = jnp.asarray([-1.0, 1.0], dtype)
    hip_width = jnp.stack([
        jnp.full((2,), sw.hip_width_offset_x, dtype),
        side * sw.hip_width_offset_y,
        jnp.zeros((2,), dtype)], axis=-1)
    p_foot_b = (p_des - est.position[None, :]) @ r_body_t + hip_width

    return SwingState(first, times, p0, pf), p_foot_b, in_swing


def swing_joint_setpoints(p_foot_b, q_data, in_swing,
                          cfg: HectorConfig = DEFAULT_CONFIG):
    """IK + joint gains; stance legs get zero gains
    (setDesiredJointState, SwingLegController.cpp:192-219).

    q_data: (2,5) offset-corrected current angles (the mutated data.q, used
    by the IK's toe-flattening rule).  Returns (q_des (2,5) raw-motor-frame,
    kp (2,5), kd (2,5)).
    """
    dtype = p_foot_b.dtype
    q_des = leg_ik(p_foot_b, q_data, cfg)
    kp = jnp.asarray(cfg.swing.kp_swing, dtype)[None, :] * in_swing[:, None]
    kd = jnp.asarray(cfg.swing.kd_swing, dtype)[None, :] * in_swing[:, None]
    q_des = jnp.where(in_swing[:, None], q_des, 0.0)
    return q_des, kp, kd
