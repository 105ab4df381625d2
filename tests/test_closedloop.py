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
