"""Closed-loop regression: standing balance and 0.5 m/s walking.

The reference has no tests (SURVEY.md §4); validation there is watching the
robot in Gazebo.  These are the envelope assertions that replace that:
standing holds height and doesn't drift; walking tracks the commanded
velocity and never trips the fall detector.  (BASELINE configs 1-2.)
"""

import numpy as np
import jax.numpy as jnp

import pytest

from hector import runtime as RT
from hector.plant import srb
from hector.config import DEFAULT_CONFIG as CFG

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def rollout200():
    return RT.make_rollout(n_periods=200, cfg=CFG, batched=False)


def test_standing_balance(rollout200):
    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG)
    carry, plant, diags = rollout200(carry, plant, RT.standing_command())
    h = np.asarray(diags['height'])
    assert not np.asarray(diags['fallen']).any()
    # holds height near the MPC equilibrium (0.55 target, 9kg-model quirk
    # leaves the true equilibrium slightly below)
    assert h[-50:].min() > 0.45 and h[-50:].max() < 0.58
    assert abs(float(plant.v_world[0])) < 0.05
    assert float(np.asarray(diags['qp_mu']).max()) < 1e-4


def test_walking_tracks_velocity(rollout200):
    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG)
    # 1 s of walking at 0.5 m/s
    carry, plant, diags = rollout200(carry, plant, RT.walking_command(vx=0.5))
    assert not np.asarray(diags['fallen']).any()
    vx = np.asarray(diags['vx'])
    assert vx[-50:].mean() > 0.25          # accelerating toward command
    assert float(plant.position[0]) > 0.15  # actually moved forward
    h = np.asarray(diags['height'])
    assert h.min() > 0.4                   # no collapse


def test_batched_mixed_scenarios():
    """Batch of 4: standing + three walking speeds in ONE jitted program --
    the core scenario-batching capability."""
    import jax
    batch = 4
    plant = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
        srb.init_plant_state(CFG))
    carry = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
        RT.init_controller_carry(jax.tree.map(lambda x: x[0], plant), CFG))
    cmds = [RT.standing_command(), RT.walking_command(0.25),
            RT.walking_command(0.5), RT.walking_command(-0.25)]
    cmd = jax.tree.map(lambda *xs: jnp.stack(xs), *cmds)
    roll = RT.make_rollout(n_periods=100, cfg=CFG, batched=True)
    carry, plant, diags = roll(carry, plant, cmd)
    assert not np.asarray(diags['fallen']).any()
    x = np.asarray(plant.position[:, 0])
    assert abs(x[0]) < 0.05      # standing stays put
    assert x[2] > x[1] > 0.0     # faster command -> farther
    assert x[3] < -0.0           # backward walks backward


def test_endurance_walk_5s_steady_state_tracking():
    """5 s endurance at three speeds in one batch (VERDICT r1 item 6):
    steady-state |vx - cmd| <= 0.1 m/s at 0.5 m/s over the last second,
    height flat, no falls.  (Measured steady errors: 0.03/0.08/0.12 at
    0.25/0.5/0.75 -- the residual is the reference controller's own
    model-mass offset, 9 kg MPC model vs 13.856 kg plant.)"""
    import jax
    n = 1000
    roll = RT.make_rollout(n, cfg=CFG, batched=True)
    B = 3
    plant1 = srb.init_plant_state(CFG)
    carry1 = RT.init_controller_carry(plant1, CFG)
    tile = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    plant = jax.tree.map(tile, plant1)
    carry = jax.tree.map(tile, carry1)
    cmds = [RT.walking_command(vx=0.25), RT.walking_command(vx=0.5),
            RT.walking_command(vx=0.75)]
    cmd = jax.tree.map(lambda *xs: jnp.stack(xs), *cmds)
    carry, plant, diags = roll(carry, plant, cmd)
    vx = np.asarray(diags['vx'])
    h = np.asarray(diags['height'])
    assert not np.asarray(diags['fallen']).any()
    # tight bar at the 0.5 m/s BASELINE point
    assert abs(vx[1, -200:].mean() - 0.5) <= 0.1
    assert vx[1, -200:].std() < 0.05                  # steady, not limit-cycling
    assert abs(vx[0, -200:].mean() - 0.25) <= 0.06
    assert abs(vx[2, -200:].mean() - 0.75) <= 0.15
    assert h[:, -200:].std(axis=-1).max() < 0.01      # height flat
    assert float(plant.position[1, 0]) > 1.8          # ~0.42 m/s for 5 s
