"""Disturbance-rejection and terrain robustness regression.

The reference's only disturbance tooling is hand-driven keyboard pushes
(unitree_controller/src/external_force.cpp); here pushes and terrain are
per-scenario batched inputs.  Physical notes encoded in these tests:

- Hector's feet stand ~3 cm apart with a near-zero Mx budget
  (SolverMPC.cpp:473: Mx <= 0.01 Nm), so the STANDING gait cannot reject a
  lateral push beyond the support line -- it topples, exactly as the
  reference would in Gazebo.  Push recovery is a *walking*-gait capability
  (Raibert placement steps to catch the velocity error).
"""

import jax
import numpy as np
import jax.numpy as jnp

from hector import runtime as RT
from hector.plant import srb
from hector.config import DEFAULT_CONFIG as CFG
import pytest

pytestmark = pytest.mark.slow


def _run(cmd, dist=None, periods=400):
    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG)
    roll = RT.make_rollout(periods, cfg=CFG, batched=False,
                           with_disturbance=dist is not None)
    if dist is None:
        return roll(carry, plant, cmd)
    return roll(carry, plant, cmd, jnp.asarray(dist))


def test_walking_push_recovery():
    dist = np.zeros((400, 6), np.float32)
    dist[100:110, 1] = 40.0  # 40 N lateral, 50 ms, mid-walk
    carry, plant, diags = _run(RT.walking_command(vx=0.3), dist)
    assert not np.asarray(diags['fallen']).any()
    assert np.asarray(diags['height']).min() > 0.4
    assert abs(float(plant.position[1])) < 0.2  # caught within 20 cm


def test_standing_topples_beyond_support_line():
    """Documented physical behavior: the narrow line support cannot reject
    a large lateral push without stepping."""
    dist = np.zeros((400, 6), np.float32)
    dist[100:110, 1] = 40.0
    carry, plant, diags = _run(RT.standing_command(), dist)
    # body ends up displaced and rolled -- the push wins
    assert abs(float(plant.position[1])) > 0.2


def test_stairs_terrain_walk():
    carry, plant, diags = _run(
        RT.walking_command(vx=0.4, step_height=0.03, step_length=0.5),
        periods=400)
    assert not np.asarray(diags['fallen']).any()
    assert float(plant.position[0]) > 0.3


def test_stairs_terrain_walk_kf_driven():
    """Tier-1 stairs with the sensor-honest estimator: the terrain-aware
    KF height rows (commanded terrain map at the filter's own foot-x
    estimates, hector/estimation.py est_update) keep the height estimate
    tracking the climb -- the tier-1 mirror of
    test_whole_body_kf_driven_stairs."""
    import jax
    cmd = RT.walking_command(vx=0.4, step_height=0.03, step_length=0.5)
    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG,
                                     key=jax.random.PRNGKey(3))
    roll = RT.make_rollout(400, cfg=CFG, batched=False, estimator='kf')
    carry, plant, diags = roll(carry, plant, cmd)
    assert not np.asarray(diags['fallen']).any()
    assert float(plant.position[0]) > 0.3
    est = np.asarray(carry.est.kf.x)
    assert abs(est[2] - float(plant.position[2])) < 0.02   # z tracks climb
    assert abs(est[1] - float(plant.position[1])) < 0.03


def test_kf_walk_30s_yaw_drift_envelope():
    """Long-horizon (30 s) KF-driven walk: the Mahony yaw channel is pure
    gyro dead reckoning (estimation.py observability note), so its drift
    over 30 s must equal the UNOBSERVABLE part of the sensor model -- the
    per-lane true z gyro bias times elapsed time -- within a small
    random-walk envelope; any extra systematic yaw error would indicate a
    filter defect.  Also pins: no fall over 30 s, KF position error
    bounded.  (Kinematic stance-foot yaw aiding cannot anchor this
    channel: the KF's foot states re-equilibrate to the drifted attitude
    within the r_rel measurement time constant, and global yaw is
    fundamentally unobservable from proprioception -- documented at
    estimation.py's Mahony observability note.)"""
    import hector.estimation as E
    from hector import math as hm

    key = jax.random.PRNGKey(17)
    seg = 500
    n_seg = 12                                  # 12 x 500 periods = 30 s
    roll = RT.make_rollout(seg, cfg=CFG, batched=False, estimator='kf')
    plant = srb.init_plant_state(CFG)
    carry = roll.init(plant, key=key)
    bias_z_true = float(carry.est.gyro_bias[2])
    cmd = RT.walking_command(vx=0.3)
    fallen_any = False
    c, p = carry, plant
    for _ in range(n_seg):
        c, p, d = roll(c, p, cmd)
        fallen_any = fallen_any or bool(np.asarray(d['fallen']).any())
    assert not fallen_any
    t_total = n_seg * seg * CFG.mpc.dt * CFG.mpc.mpc_cadence  # 30 s
    yaw_est = float(hm.quat_to_rpy(c.est.mahony.quat)[2])
    yaw_true = float(hm.quat_to_rpy(p.quat)[2])
    drift = yaw_est - yaw_true
    # drift tracks the unobservable z-bias integral within the
    # random-walk + estimation envelope (measured ~0.002 rad at 30 s)
    assert abs(drift - bias_z_true * t_total) < 0.05, (
        drift, bias_z_true * t_total)
    # KF height stays locked through 30 s (oscillates ~+-0.04 with gait
    # phase around the contact-aided equilibrium)
    assert abs(float(c.est.kf.x[2] - p.position[2])) < 0.08
    # xy is a DOUBLE gauge mode (absolute position and heading are both
    # unobservable): its error grows ~ distance x yaw-drift; pin the rate
    dist = max(1e-6, float(jnp.linalg.norm(p.position[0:2])))
    xy_err = float(jnp.linalg.norm(c.est.kf.x[0:2] - p.position[0:2]))
    assert xy_err < 0.5 * dist, (xy_err, dist)
