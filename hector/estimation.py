"""Pluggable state estimation beyond the ground-truth passthrough.

The reference runs "cheater" estimators only (ground truth from Gazebo,
main.cpp:46-47) but keeps a pluggable container
(StateEstimatorContainer.h:110-137) for future real estimators.  This module
is that interface, TPU-style: an estimator is a pure function
(carry, measurements) -> (carry, StateEstimate), so different estimators
compose with the same rollout and batch over scenarios.

Provided:

- ``cheater``: exact passthrough (the reference's configuration);
- ``noisy_sensors``: a sensor model producing IMU-style measurements
  (quat, gyro, accel-free position/velocity proxies) with configurable
  Gaussian noise -- the batched stand-in for Gazebo's sensor plugins;
- ``filtered``: first-order IIR low-pass on the noisy velocity/position
  channels (the FirstOrderIIRFilter.h capability of the reference,
  include/common/Math/FirstOrderIIRFilter.h) -- a pragmatic baseline an
  EKF can later replace behind the same signature.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import control as C


class SensorNoise(NamedTuple):
    pos_std: float = 0.002
    vel_std: float = 0.02
    gyro_std: float = 0.01
    quat_std: float = 0.002   # small-angle noise, radians


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
    (y += alpha (x - y), the FirstOrderIIRFilter.h update)."""
    pos = state.pos + alpha * (pos_meas - state.pos)
    vel = state.vel + alpha * (vel_meas - state.vel)
    est = C.estimate_state(pos, vel, quat_meas, gyro_meas)
    return FilterState(pos=pos, vel=vel), est
