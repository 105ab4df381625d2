"""Pluggable state estimation beyond the ground-truth passthrough.

The reference runs "cheater" estimators only (ground truth from Gazebo,
main.cpp:46-47) but keeps a pluggable container
(StateEstimatorContainer.h:110-137) for future real estimators.  This module
is that interface, TPU-style: an estimator is a pure function
(carry, measurements) -> (carry, StateEstimate), so different estimators
compose with the same rollout and batch over scenarios.

Provided:

- ``cheater``: exact passthrough (the reference's configuration);
- ``noisy_sensors`` + ``imu_accel`` + ``gyro_body_meas``: a sensor model
  producing IMU-style measurements (body-frame rate gyro with a constant
  per-lane bias, body-frame specific force, plus direct quat/pos/vel
  proxies used ONLY by the staged 'filtered' kind) with configurable
  Gaussian noise -- the batched stand-in for Gazebo's sensor plugins;
- ``filtered``: first-order IIR low-pass on the noisy velocity/position
  channels (the FirstOrderIIRFilter.h capability of the reference,
  include/common/Math/FirstOrderIIRFilter.h);
- ``mahony_*``: a gyro-integrating Mahony orientation filter with
  accelerometer gravity correction and bias estimation -- the real
  estimator for the container's OrientationEstimator slot
  (src/common/OrientationEstimator.cpp is a cheater in the reference);
- ``kf_*``: a contact-aided linear Kalman filter over [p, v, p_feet]
  (the classic legged-robot position/velocity KF that the reference's
  PositionVelocityEstimator slot is designed to host -- its cheater
  implementation copies ground truth at PositionVelocityEstimator.cpp:5-13,
  while the container API anticipates real estimators).  Fixed shapes,
  12-dim state / 14-dim measurement, batched with vmap.

The 'kf' kind composes mahony + kf into the fully sensor-honest path:
gyro + accelerometer + joint encoders + contact flags are the only inputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import control as C
from . import math as hm


class SensorNoise(NamedTuple):
    pos_std: float = 0.002
    vel_std: float = 0.02
    gyro_std: float = 0.01
    quat_std: float = 0.002   # small-angle noise, radians
    accel_std: float = 0.05   # accelerometer, m/s^2 (body-frame channels)
    gyro_bias_std: float = 0.005  # per-lane constant gyro bias, rad/s


def noisy_sensors(key, plant, noise: SensorNoise = SensorNoise()):
    """Corrupt plant ground truth into measurements (per scenario)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dtype = plant.position.dtype
    pos = plant.position + noise.pos_std * jax.random.normal(k1, (3,), dtype)
    vel = plant.v_world + noise.vel_std * jax.random.normal(k2, (3,), dtype)
    gyro = plant.omega_world + noise.gyro_std * jax.random.normal(
        k3, (3,), dtype)
    dq = noise.quat_std * jax.random.normal(k4, (3,), dtype)
    quat = jnp.stack([
        plant.quat[0] - 0.5 * jnp.dot(plant.quat[1:], dq),
        plant.quat[1] + 0.5 * (plant.quat[0] * dq[0]
                               + plant.quat[2] * dq[2]
                               - plant.quat[3] * dq[1]),
        plant.quat[2] + 0.5 * (plant.quat[0] * dq[1]
                               + plant.quat[3] * dq[0]
                               - plant.quat[1] * dq[2]),
        plant.quat[3] + 0.5 * (plant.quat[0] * dq[2]
                               + plant.quat[1] * dq[1]
                               - plant.quat[2] * dq[0]),
    ])
    quat = quat / jnp.linalg.norm(quat)
    return pos, vel, quat, gyro


def imu_accel(key, plant, prev_v, dt, noise: SensorNoise = SensorNoise(),
              gravity: float = 9.81):
    """Body-frame accelerometer (specific force) measurement.

    The true specific force over the last tick is the finite difference of
    the true velocity (exactly what a physical accelerometer integrates to
    over one sample) minus gravity, rotated into the body frame, plus
    Gaussian noise -- the IMU channel the reference's LowlevelState carries
    (include/messages/LowlevelState.h IMU.acc) but its cheater estimators
    never consume.  ``gravity`` must be the plant's own constant
    (cfg.plant.gravity) so the sensor model and the estimator's
    gravity compensation agree in non-earth worlds (worlds.py)."""
    dtype = plant.position.dtype
    a_true = (plant.v_world - prev_v) / dt
    g_w = jnp.asarray([0.0, 0.0, -gravity], dtype)
    r_bw = hm.quat_to_rot(plant.quat)                  # body->world (true)
    f_body = r_bw.T @ (a_true - g_w)
    return f_body + noise.accel_std * jax.random.normal(key, (3,), dtype)


def gyro_body_meas(key, plant, bias, noise: SensorNoise = SensorNoise()):
    """Body-frame rate gyro: what a strapdown IMU actually measures (the
    reference's LowlevelState IMU.gyro channel) -- true body rate plus a
    constant per-lane bias plus white noise.  The honest 'kf' path consumes
    THIS channel (not noisy_sensors' world-frame gyro proxy)."""
    dtype = plant.position.dtype
    r_bw = hm.quat_to_rot(plant.quat)
    w_body = r_bw.T @ plant.omega_world
    return w_body + bias + noise.gyro_std * jax.random.normal(
        key, (3,), dtype)


def cheater(plant) -> C.StateEstimate:
    """Ground-truth passthrough (the reference's cheater estimators)."""
    return C.estimate_state(plant.position, plant.v_world, plant.quat,
                            plant.omega_world)


class FilterState(NamedTuple):
    pos: jnp.ndarray
    vel: jnp.ndarray


def init_filter_state(plant) -> FilterState:
    return FilterState(pos=plant.position, vel=plant.v_world)


def filtered(state: FilterState, pos_meas, vel_meas, quat_meas, gyro_meas,
             alpha: float = 0.3):
    """First-order IIR low-pass on position/velocity measurements
    (y += alpha (x - y), the FirstOrderIIRFilter.h update).

    STAGING CHEAT, documented: the pos/vel channels it consumes are direct
    world-frame measurements (ground truth + noise) that no real sensor
    provides -- a staged-fidelity rung between the cheater and the KF.  The
    'kf' estimator kind uses only realistic channels (IMU specific force,
    gyro/quat, joint encoders, contact flags)."""
    pos = state.pos + alpha * (pos_meas - state.pos)
    vel = state.vel + alpha * (vel_meas - state.vel)
    est = C.estimate_state(pos, vel, quat_meas, gyro_meas)
    return FilterState(pos=pos, vel=vel), est


# ---------------------------------------------------------------------------
# Mahony complementary orientation filter
#
# The reference's estimator container reserves a dedicated orientation-
# estimator slot (src/common/OrientationEstimator.cpp,
# include/common/StateEstimatorContainer.h:110-137) whose shipped
# implementation is a cheater (copies the Gazebo quaternion).  This is the
# real thing that slot is designed to host: gyro propagation at 1 kHz with
# an accelerometer gravity-direction correction and gyro-bias estimation
# (Mahony, Hamel & Pflimlin 2008) -- it consumes ONLY gyro + accelerometer,
# so the honest 'kf' estimator path needs no direct orientation sensor.
#
# Observability, documented: yaw (rotation about gravity) is unobservable
# from the accelerometer, so the yaw channel is pure gyro integration --
# it drifts with the (estimated-away roll/pitch components of the) gyro
# bias and random-walks with gyro noise.  Tests pin the drift envelope at
# both short horizon (test_estimation.py) and 30 s of closed-loop walking
# (test_robustness.py::test_kf_walk_30s_yaw_drift_envelope: the drift
# equals the unobservable z-bias integral, nothing more).
#
# Why stance-foot kinematic aiding canNOT anchor this channel (r4 review
# question): the KF's foot states are themselves corrected each tick
# toward R_bw (hip + p_leg) with the r_rel measurement noise, so after a
# slow yaw drift they re-equilibrate to the DRIFTED attitude within the
# r_rel time constant -- an inter-foot-vector yaw "measurement" would
# compare the attitude with a filtered copy of itself.  Global yaw is
# fundamentally unobservable from proprioception (gyro + accel + joint
# encoders + contact); anchoring requires an exteroceptive heading
# reference (magnetometer / vision), out of the reference's sensor set.


class MahonyState(NamedTuple):
    quat: jnp.ndarray          # (4,) wxyz, estimated body->world
    bias: jnp.ndarray          # (3,) estimated gyro bias, body frame


def mahony_init(dtype=jnp.float32) -> MahonyState:
    """Initial alignment: identity attitude, zero bias.  Scenario lanes
    launch level at yaw 0 (init_plant_state / init_whole_body_state), the
    standard initial-alignment assumption; a lane starting tilted converges
    through the accelerometer term at the kp time constant."""
    return MahonyState(quat=jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype),
                       bias=jnp.zeros(3, dtype))


def mahony_update(m: MahonyState, gyro_b, f_body, dt,
                  kp: float = 2.0, ki: float = 0.3,
                  gravity: float = 9.81) -> MahonyState:
    """One 1 kHz step: propagate the quaternion with the bias-corrected
    body rate, corrected toward the accelerometer's gravity direction.

    The accelerometer term is gated by how close |f| is to g (during hard
    accelerations the specific force is not the gravity direction, so the
    correction is distrusted -- the standard dynamic-acceleration gate).
    """
    dtype = m.quat.dtype
    r_bw = hm.quat_to_rot(m.quat)
    v_hat = r_bw.T @ jnp.asarray([0.0, 0.0, 1.0], dtype)  # predicted up
    f_norm = jnp.linalg.norm(f_body)
    v_meas = f_body / jnp.maximum(f_norm, 1e-6)            # measured up
    # max() guards gravity=0 worlds (worlds.py 'space'): there the gate
    # hard-zeros for any nonzero |f| instead of dividing by zero, and a
    # zero specific force yields a zero error vector -- pure gyro, no NaN
    gate = jnp.clip(
        1.0 - 2.0 * jnp.abs(f_norm - gravity) / jnp.maximum(gravity, 1e-6),
        0.0, 1.0)
    err = jnp.cross(v_meas, v_hat) * gate
    bias = m.bias - ki * dt * err
    w_corr = gyro_b - bias + kp * err                      # body frame
    quat = hm.quat_integrate(m.quat, r_bw @ w_corr, dt)
    return MahonyState(quat=quat, bias=bias)


# ---------------------------------------------------------------------------
# Contact-aided linear Kalman filter
#
# State x = [p (3), v (3), p_f0 (3), p_f1 (3)]  (world frame, 12-dim).
# Process: p' = p + dt v,  v' = v + dt a  (a = world-frame acceleration
# input, gravity-compensated by the caller), feet stationary.
# Measurements (14-dim):
#   rows 0:6   per-leg kinematic relative foot position  p_f_i - p =
#              R_bw (hip_i + p_leg_i)
#   rows 6:12  per-leg velocity  v = -R_bw (J q_dot + omega x rel_i)
#              (valid when the foot is planted)
#   rows 12:14 per-leg foot height  p_f_i,z = ground height
# Swing legs stay in the filter at fixed shape: their measurement noise and
# foot-state process noise are inflated by 1/trust, the standard
# contact-gating trick (static shapes; no per-lane branching).


class KFNoise(NamedTuple):
    q_pos: float = 0.0004      # process noise densities (per sqrt(dt))
    q_vel: float = 0.02
    q_foot: float = 0.0004
    r_rel: float = 0.001       # kinematic relative-position measurement
    r_vel: float = 0.05        # kinematic velocity measurement
    r_height: float = 0.001    # foot-height measurement
    swing_inflation: float = 1e6


class KFState(NamedTuple):
    x: jnp.ndarray             # (12,)
    cov: jnp.ndarray           # (12, 12)


def _kf_h() -> jnp.ndarray:
    import numpy as _np
    h = _np.zeros((14, 12))
    for i in range(2):
        h[3 * i:3 * i + 3, 0:3] = -_np.eye(3)            # -p
        h[3 * i:3 * i + 3, 6 + 3 * i:9 + 3 * i] = _np.eye(3)  # +p_f_i
        h[6 + 3 * i:9 + 3 * i, 3:6] = _np.eye(3)          # v
        h[12 + i, 8 + 3 * i] = 1.0                        # p_f_i,z
    return jnp.asarray(h)


def kf_init(position, v_world, p_feet_world, cov0: float = 0.01) -> KFState:
    """p_feet_world: (2, 3) initial world foot positions."""
    x = jnp.concatenate([position, v_world, p_feet_world.reshape(6)])
    return KFState(x=x, cov=cov0 * jnp.eye(12, dtype=x.dtype))


def kf_update(kf: KFState, accel_world, r_body, rel_body, rel_vel_body,
              omega_body, contact, dt, ground_z=0.0,
              noise: KFNoise = KFNoise()) -> KFState:
    """One predict+update step.

    accel_world: (3,) gravity-compensated world acceleration input;
    r_body: (3,3) world->body; rel_body: (2,3) body-frame trunk->foot
    vectors (hip offset + FK foot position); rel_vel_body: (2,3) their
    body-frame rates (J q_dot); omega_body: (3,); contact: (2,) in [0,1];
    ground_z: scalar or (2,) terrain height under each foot.
    """
    dtype = kf.x.dtype
    x, p_cov = kf.x, kf.cov

    # --- predict ---
    a_mat = jnp.eye(12, dtype=dtype).at[0:3, 3:6].set(dt * jnp.eye(3, dtype=dtype))
    x = a_mat @ x + jnp.concatenate(
        [0.5 * dt * dt * accel_world, dt * accel_world,
         jnp.zeros((6,), dtype)])
    trust = jnp.clip(contact, 0.0, 1.0)
    foot_q = noise.q_foot * (
        1.0 + (noise.swing_inflation - 1.0) * (1.0 - trust))
    q_diag = jnp.concatenate([
        jnp.full((3,), noise.q_pos, dtype), jnp.full((3,), noise.q_vel, dtype),
        jnp.repeat(foot_q, 3)])
    p_cov = a_mat @ p_cov @ a_mat.T + dt * jnp.diag(q_diag)

    # --- measurements ---
    rel_w = rel_body @ r_body                            # (2,3) world
    relv_w = (rel_vel_body + jnp.cross(
        jnp.broadcast_to(omega_body, rel_body.shape), rel_body)) @ r_body
    y = jnp.concatenate([
        rel_w.reshape(6), (-relv_w).reshape(6),
        jnp.broadcast_to(jnp.asarray(ground_z, dtype), (2,))])
    infl = 1.0 + (noise.swing_inflation - 1.0) * (1.0 - trust)
    r_diag = jnp.concatenate([
        jnp.repeat(noise.r_rel * infl, 3),
        jnp.repeat(noise.r_vel * infl, 3),
        noise.r_height * infl])

    h = _kf_h().astype(dtype)
    innov = y - h @ x
    s = h @ p_cov @ h.T + jnp.diag(r_diag)
    k_gain = jnp.linalg.solve(s, h @ p_cov).T            # (12, 14)
    x = x + k_gain @ innov
    p_cov = (jnp.eye(12, dtype=dtype) - k_gain @ h) @ p_cov
    p_cov = 0.5 * (p_cov + p_cov.T)
    return KFState(x=x, cov=p_cov)


def kf_estimate(kf: KFState, quat_meas, gyro_meas) -> C.StateEstimate:
    """KF posterior + orientation measurements -> StateEstimate (the
    orientation channel stays a separate estimator, as in the reference's
    container split)."""
    return C.estimate_state(kf.x[0:3], kf.x[3:6], quat_meas, gyro_meas)


# ---------------------------------------------------------------------------
# Unified estimator interface for the closed loop
#
# The rollout (hector/runtime.py) is parameterized over an estimator KIND
# (a static string, so no per-lane branching reaches XLA) and carries one
# EstimatorState pytree -- the batched analog of the reference's
# StateEstimatorContainer (main.cpp:42-47 wires the cheater pair; the
# container API anticipates real estimators,
# include/common/StateEstimatorContainer.h:110-137).

KINDS = ('cheater', 'filtered', 'kf')


class EstimatorState(NamedTuple):
    """One carry covering every estimator kind (unused fields ride along;
    they are tiny compared to the planner carry)."""

    key: jnp.ndarray           # PRNG key for the sensor noise model
    filt: FilterState
    kf: KFState
    mahony: MahonyState        # orientation filter (the honest 'kf' path)
    gyro_bias: jnp.ndarray     # (3,) TRUE per-lane gyro bias (sensor model)
    prev_v: jnp.ndarray        # (3,) last-tick true v_world (IMU model)


def _rel_feet_body(plant, cfg):
    """Trunk->foot vectors and their rates in the body frame, from joint
    encoders (the measurements a real estimator has: q, qd)."""
    from .kinematics import foot_position, leg_jacobians
    dtype = plant.position.dtype
    hip_yaw = jnp.asarray(
        [cfg.robot.hip_yaw_location(0), cfg.robot.hip_yaw_location(1)], dtype)
    rel = hip_yaw + foot_position(plant.q, cfg)
    _, j_f = leg_jacobians(plant.q, cfg)
    rel_vel = jnp.einsum('lij,lj->li', j_f, plant.qd)
    return rel, rel_vel


def est_init(plant, key, cfg,
             noise: SensorNoise = SensorNoise()) -> EstimatorState:
    rel, _ = _rel_feet_body(plant, cfg)
    r_body = jnp.swapaxes(hm.quat_to_rot(plant.quat), -1, -2)
    p_feet_w = plant.position[None, :] + rel @ r_body
    key, k_bias = jax.random.split(key)
    dtype = plant.position.dtype
    return EstimatorState(
        key=key,
        filt=init_filter_state(plant),
        kf=kf_init(plant.position, plant.v_world, p_feet_w),
        mahony=mahony_init(dtype),
        gyro_bias=noise.gyro_bias_std * jax.random.normal(
            k_bias, (3,), dtype),
        prev_v=plant.v_world)


def est_update(kind: str, state: EstimatorState, plant, cfg,
               noise: SensorNoise = SensorNoise(), ground_z: float = 0.0,
               terrain=None):
    """One 1 kHz estimator tick.  kind is STATIC ('cheater' | 'filtered' |
    'kf'); returns (new EstimatorState, StateEstimate).

    ground_z: the height the KF expects the FK FOOT POINT to sit at when
    planted ON FLAT GROUND -- a fixed calibration constant of the foot
    model, NOT runtime ground truth.  0 for the tier-1 plant (stance
    anchors pin the FK foot to z=0); the articulated plant's toe-box
    geometry leaves the FK point ~6.8 cm above the ground plane
    (plant/whole_body.py FK_FOOT_CLEARANCE).

    terrain: optional (step_height, step_length) heightfield parameters --
    the terrain MAP the scenario commands (ScenarioCommand.terrain_*), the
    batched analog of a perception-provided heightmap.  The KF's foot-height
    measurement is evaluated at each foot's OWN prior x estimate (no ground
    truth consumed): expected foot z = h(x̂_foot) + ground_z.  None = flat.
    """
    if kind not in KINDS:
        raise ValueError(f'unknown estimator kind {kind!r}; expected {KINDS}')
    if kind == 'cheater':
        return state, cheater(plant)

    key, sub, sub_a = jax.random.split(state.key, 3)

    if kind == 'filtered':
        pos_m, vel_m, quat_m, gyro_m = noisy_sensors(sub, plant, noise)
        filt, est = filtered(state.filt, pos_m, vel_m, quat_m, gyro_m)
        return state._replace(key=key, filt=filt), est

    # kind == 'kf': sensor-honest -- the ONLY channels consumed are the
    # body-frame rate gyro, the body-frame specific force, joint encoders
    # (q, qd) and the contact flags.  Orientation comes from the Mahony
    # filter (gyro propagation + accelerometer gravity correction), never
    # from a direct quaternion measurement; position/velocity come from the
    # contact-aided KF driven by the Mahony attitude.
    dtype = plant.position.dtype
    gyro_b_m = gyro_body_meas(sub, plant, state.gyro_bias, noise)
    f_body_m = imu_accel(sub_a, plant, state.prev_v, cfg.plant.dt, noise,
                         gravity=cfg.plant.gravity)
    mah = mahony_update(state.mahony, gyro_b_m, f_body_m, cfg.plant.dt,
                        gravity=cfg.plant.gravity)
    r_bw_est = hm.quat_to_rot(mah.quat)            # body->world (estimated)
    omega_b_est = gyro_b_m - mah.bias
    omega_w_est = r_bw_est @ omega_b_est

    rel, rel_vel = _rel_feet_body(plant, cfg)
    g_w = jnp.asarray([0.0, 0.0, -cfg.plant.gravity], dtype)
    accel_world = r_bw_est @ f_body_m + g_w
    if terrain is None:
        gz = jnp.broadcast_to(jnp.asarray(ground_z, dtype), (2,))
    else:
        from .plant.srb import terrain_height
        foot_x_est = state.kf.x[jnp.asarray([6, 9])]   # prior foot x
        gz = terrain_height(foot_x_est, terrain[0], terrain[1]) + ground_z
    kf = kf_update(
        state.kf,
        accel_world=accel_world,
        r_body=r_bw_est.T, rel_body=rel, rel_vel_body=rel_vel,
        omega_body=omega_b_est,
        contact=plant.contact.astype(dtype),
        dt=cfg.plant.dt, ground_z=gz)
    est = kf_estimate(kf, mah.quat, omega_w_est)
    return state._replace(key=key, kf=kf, mahony=mah,
                          prev_v=plant.v_world), est
