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

import numpy as np
import jax.numpy as jnp

from hector import runtime as RT
from hector.plant import srb
from hector.config import DEFAULT_CONFIG as CFG


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
