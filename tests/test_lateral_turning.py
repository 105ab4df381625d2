"""Lateral (vy) and turning (yaw-rate) closed-loop tracking regressions
(VERDICT r2 item 4): the full teleop command surface of the reference --
vx ∈ ±0.75, vy ∈ ±0.25, yaw_rate ∈ ±1.5 (FSMState_Walking.cpp:30-33,
DesiredCommand.cpp:7-42) -- asserted as TRACKING, not just no-fall.

Expected magnitudes are the reference controller's own: its reference
trajectory re-anchors at the CURRENT state every solve when the command is
nonzero (y row: ``seResult.position[1] + i*dtMPC*v_des`` and yaw row:
``yaw + i*dtMPC*yaw_rate``, ConvexMPCLocomotion.cpp:382-399), giving
proportional -- not integral -- command tracking: measured steady response
is ~55% of commanded vy and ~70% of commanded yaw rate, direction-exact and
left/right symmetric.  The assertions pin that envelope.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hector import runtime as RT
from hector.plant import srb
from hector.config import DEFAULT_CONFIG as CFG

pytestmark = pytest.mark.slow

N = 500          # 2.5 s
DT = 0.005       # one MPC period


@pytest.fixture(scope="module")
def batch_run():
    cmds = [RT.walking_command(vx=0.0, vy=0.25),
            RT.walking_command(vx=0.0, vy=-0.25),
            RT.walking_command(vx=0.3, yaw_rate=1.5),
            RT.walking_command(vx=0.3, yaw_rate=-1.5),
            RT.walking_command(vx=0.4, vy=0.15, yaw_rate=0.5)]
    B = len(cmds)
    plant1 = srb.init_plant_state(CFG)
    carry1 = RT.init_controller_carry(plant1, CFG)
    tile = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    plant = jax.tree.map(tile, plant1)
    carry = jax.tree.map(tile, carry1)
    cmd = jax.tree.map(lambda *xs: jnp.stack(xs), *cmds)
    roll = RT.make_rollout(N, cfg=CFG, batched=True)
    carry, plant, diags = roll(carry, plant, cmd)
    return plant, {k: np.asarray(v) for k, v in diags.items()}


def _steady_yaw_rate(yaw_row, tail=300):
    yw = np.unwrap(yaw_row)
    return (yw[-1] - yw[-tail]) / (tail * DT)


def test_lateral_vy_tracking(batch_run):
    """vy = ±0.25 m/s: the robot side-steps in the commanded direction with
    the documented ~55% proportional response, stays up, and does not
    drift forward or rotate."""
    plant, d = batch_run
    assert not d["fallen"][:2].any()
    vy_p = d["vy"][0, -300:].mean()
    vy_m = d["vy"][1, -300:].mean()
    assert 0.10 < vy_p < 0.25                 # direction + envelope
    assert -0.25 < vy_m < -0.10
    assert abs(vy_p + vy_m) < 0.03            # left/right symmetric
    assert d["xy"][0, -1, 1] > 0.25           # actually displaced sideways
    assert d["xy"][1, -1, 1] < -0.25
    assert abs(d["xy"][0, -1, 0]) < 0.06      # no forward drift
    assert np.abs(d["yaw"][:2]).max() < 0.1   # no spurious rotation


def test_yaw_rate_tracking(batch_run):
    """yaw_rate = ±1.5 rad/s at vx = 0.3: heading integrates in the
    commanded direction at the documented ~70% proportional rate, the body
    turns rather than side-slips (body-frame vy stays small while the
    world-frame velocity vector rotates with the heading)."""
    plant, d = batch_run
    assert not d["fallen"][2:4].any()
    r_p = _steady_yaw_rate(d["yaw"][2])
    r_m = _steady_yaw_rate(d["yaw"][3])
    assert 0.8 < r_p < 1.5
    assert -1.5 < r_m < -0.8
    assert abs(r_p + r_m) < 0.1               # symmetric turn response
    # after 2.5 s the heading has swept most of a half-turn
    assert np.unwrap(d["yaw"][2])[-1] > 2.0
    assert np.unwrap(d["yaw"][3])[-1] < -2.0
    # turning, not skidding: body-frame lateral velocity stays small even
    # though world-frame vy is large
    assert np.abs(d["v_body"][2:4, -300:, 1]).mean() < 0.1
    assert np.abs(d["vy"][2:4, -300:]).mean() > 0.12


def test_mixed_vx_vy_yaw(batch_run):
    """Combined vx/vy/yaw command: every channel responds in its commanded
    direction simultaneously."""
    plant, d = batch_run
    assert not d["fallen"][4].any()
    assert d["xy"][4, -1, 0] > 0.4            # forward progress (vx=0.4)
    assert d["xy"][4, -1, 1] > 0.3            # leftward drift (vy + turn)
    assert _steady_yaw_rate(d["yaw"][4]) > 0.25   # turning left
    assert d["height"][4].min() > 0.45
