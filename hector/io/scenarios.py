"""Scenario generation: the batched replacement for keyboard teleop.

The reference's command surface is a raw-terminal key thread mapping
wasd/ijkl to velocity axes within the envelope vx in [-0.75, 0.75], vy in
[-0.25, 0.25], yaw_rate in [-1.5, 1.5] (src/interface/KeyBoard.cpp:31-93,
FSMState_Walking.cpp:30-33).  Here a scenario batch samples that envelope
(plus gait choice and disturbance schedules) from a PRNG key --
deterministic, reproducible, host-side cheap.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import runtime as RT

# teleop envelope (FSMState_Walking.cpp:30-33)
VX_RANGE = (-0.75, 0.75)
VY_RANGE = (-0.25, 0.25)
YAW_RATE_RANGE = (-1.5, 1.5)


def random_commands(key, batch: int, p_standing: float = 0.1,
                    p_stairs: float = 0.0, max_step_height: float = 0.04,
                    dtype=jnp.float32) -> RT.ScenarioCommand:
    """Sample a batch of scenario commands over the teleop envelope.

    A fraction p_standing of scenarios use the standing gait with zero
    command (the reference's gait 1), the rest walk (gait 2).  A fraction
    p_stairs get randomized stairs terrain (config-3 style randomization).
    """
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    vx = jax.random.uniform(k1, (batch,), dtype, *VX_RANGE)
    vy = jax.random.uniform(k2, (batch,), dtype, *VY_RANGE)
    yaw_rate = jax.random.uniform(k3, (batch,), dtype, *YAW_RATE_RANGE)
    standing = jax.random.uniform(k4, (batch,)) < p_standing

    zeros = jnp.zeros((batch,), dtype)
    vx = jnp.where(standing, zeros, vx)
    vy = jnp.where(standing, zeros, vy)
    yaw_rate = jnp.where(standing, zeros, yaw_rate)

    walk_off = jnp.asarray([0.0, 5.0], dtype)
    walk_dur = jnp.asarray([5.0, 5.0], dtype)
    stand_off = jnp.asarray([0.0, 0.0], dtype)
    stand_dur = jnp.asarray([10.0, 10.0], dtype)
    offsets = jnp.where(standing[:, None], stand_off[None], walk_off[None])
    durations = jnp.where(standing[:, None], stand_dur[None], walk_dur[None])

    stairs = jax.random.uniform(k5, (batch,)) < p_stairs
    step_h = jnp.where(
        stairs, jax.random.uniform(k6, (batch,), dtype, 0.01,
                                   max_step_height), 0.0)
    step_l = jnp.full((batch,), 0.5, dtype)

    return RT.ScenarioCommand(
        vx=vx, vy=vy, yaw_rate=yaw_rate,
        roll=zeros, pitch=zeros,
        gait_offsets=offsets, gait_durations=durations,
        terrain_step_height=step_h, terrain_step_length=step_l)


def disturbance_schedule(key, batch: int, n_periods: int,
                         magnitude: float = 30.0, p_push: float = 0.002,
                         dtype=jnp.float32):
    """(batch, n_periods, 6) world trunk wrenches: sparse random pushes, the
    batched analog of external_force keyboard teleop
    (unitree_controller/src/external_force.cpp).  Feed to
    make_rollout(with_disturbance=True)."""
    k1, k2 = jax.random.split(key)
    active = jax.random.uniform(k1, (batch, n_periods, 1)) < p_push
    direction = jax.random.normal(k2, (batch, n_periods, 6), dtype)
    direction = direction / (jnp.linalg.norm(
        direction[..., :3], axis=-1, keepdims=True) + 1e-6)
    wrench = direction.at[..., 3:].mul(0.2)  # mostly force, small moment
    return jnp.where(active, magnitude * wrench, 0.0)
