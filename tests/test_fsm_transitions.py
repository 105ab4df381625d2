"""User-commanded FSM transitions + mid-run gait switching.

The reference's FSM is a NORMAL/CHANGE machine driven by keyboard
UserCommand (FSM.cpp:37-54): Walking -> Passive on L2_B
(FSMState_Walking.cpp:49-51), Passive -> Walking on L1_X
(FSMState_Passive.cpp:33-39 -- note the missing `return` bug there; we
implement the intended transition).  Gait selection is setGaitNum
(ConvexMPCLocomotion.h:44), called every tick by the Walking state.

Here both are per-period, per-lane schedule channels
(runtime.make_rollout(with_schedule=True)).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hector import control as C
from hector import runtime as RT
from hector.plant import srb
from hector.config import DEFAULT_CONFIG as CFG


def _schedule(n_periods, cmd_fn, mode_fn):
    """Build (cmd_t, mode_cmd_t) over periods from python generators."""
    cmds = [cmd_fn(t) for t in range(n_periods)]
    cmd_t = jax.tree.map(lambda *xs: jnp.stack(xs), *cmds)
    mode_t = jnp.asarray([mode_fn(t) for t in range(n_periods)], jnp.int32)
    return cmd_t, mode_t


def test_mid_run_gait_switch_walk_to_stand_to_walk():
    """Walk 0.5 m/s -> switch to standing gait -> back to walking, all in
    one rollout, no falls, and the behavior actually changes."""
    n = 180
    walk = RT.walking_command(vx=0.5)
    stand = RT.standing_command()

    def cmd_fn(t):
        return walk if (t < 60 or t >= 120) else stand

    cmd_t, mode_t = _schedule(n, cmd_fn, lambda t: RT.MODE_CMD_NONE)
    roll = RT.make_rollout(n, cfg=CFG, batched=False, with_schedule=True)
    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG)
    carry, plant, diags = roll(carry, plant, walk, (cmd_t, mode_t))
    assert not np.asarray(diags['fallen']).any()
    vx = np.asarray(diags['vx'])
    # walking phase moves, standing phase slows back down
    assert vx[40:60].mean() > 0.2
    # standing gait: decelerating toward rest (vx cmd 0)
    assert abs(vx[110:120].mean()) < 0.2
    assert abs(vx[115:120].mean()) < abs(vx[60:65].mean())
    assert vx[165:].mean() > 0.25          # resumed walking


def test_user_commanded_passive_then_walking():
    """Walking -> commanded PASSIVE (robot goes limp, damping only) ->
    commanded WALKING again (re-enter: planner/swing re-initialized)."""
    n = 200
    walk = RT.walking_command(vx=0.3)

    def mode_fn(t):
        if t == 50:
            return C.MODE_PASSIVE
        if t == 62:
            return C.MODE_WALKING
        return RT.MODE_CMD_NONE

    cmd_t, mode_t = _schedule(n, lambda t: walk, mode_fn)
    roll = RT.make_rollout(n, cfg=CFG, batched=False, with_schedule=True)
    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG)
    carry, plant, diags = roll(carry, plant, walk, (cmd_t, mode_t))
    mode = np.asarray(diags['mode'])
    h = np.asarray(diags['height'])
    assert (mode[:50] == C.MODE_WALKING).all()
    assert (mode[50:62] == C.MODE_PASSIVE).all()
    # after the walking command the lane is walking again
    assert (mode[65:] == C.MODE_WALKING).all()
    # during the 60 ms commanded-passive window the body genuinely
    # free-falls (limp robot, damping only)...
    assert h[61] < h[49] - 0.012
    # ...and the re-entered walking controller catches it and recovers
    assert not np.asarray(diags['fallen'])[-20:].any()
    assert h[-20:].min() > 0.42
    assert h[-1] > h[70]


def test_batched_lanes_switch_independently():
    """One lane switches to passive mid-run, the other keeps walking --
    transitions are per-lane (the reference can only ever do one robot)."""
    n = 100
    walk = RT.walking_command(vx=0.4)

    def mode_fn_a(t):
        return C.MODE_PASSIVE if t == 40 else RT.MODE_CMD_NONE

    cmd_t, mode_a = _schedule(n, lambda t: walk, mode_fn_a)
    mode_b = jnp.full((n,), RT.MODE_CMD_NONE, jnp.int32)

    batch = 2
    plant1 = srb.init_plant_state(CFG)
    carry1 = RT.init_controller_carry(plant1, CFG)
    tile = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
    plant = jax.tree.map(tile, plant1)
    carry = jax.tree.map(tile, carry1)
    cmd = jax.tree.map(tile, walk)
    sched = (jax.tree.map(tile, cmd_t), jnp.stack([mode_a, mode_b]))
    roll = RT.make_rollout(n, cfg=CFG, batched=True, with_schedule=True)
    carry, plant, diags = roll(carry, plant, cmd, sched)
    mode = np.asarray(diags['mode'])       # (B, T)
    assert (mode[0, 45:] == C.MODE_PASSIVE).all()
    assert (mode[1] == C.MODE_WALKING).all()
    # the passive lane stopped producing forward motion; the other didn't
    x = np.asarray(plant.position[:, 0])
    assert x[1] > x[0]


def test_passive_then_walking_kf_driven_reenters_from_estimate():
    """The honest-path FSM re-entry (runtime.reentry_estimate): commanded
    passive -> walking with estimator='kf' re-initializes the planner from
    the FILTER's own state (KF position + Mahony attitude), never plant
    truth -- and the re-entered controller still recovers the walk."""
    n = 200
    walk = RT.walking_command(vx=0.3)

    def mode_fn(t):
        if t == 50:
            return C.MODE_PASSIVE
        if t == 62:
            return C.MODE_WALKING
        return RT.MODE_CMD_NONE

    cmd_t, mode_t = _schedule(n, lambda t: walk, mode_fn)
    roll = RT.make_rollout(n, cfg=CFG, batched=False, with_schedule=True,
                           estimator='kf')
    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG,
                                     key=jax.random.PRNGKey(4))
    carry, plant, diags = roll(carry, plant, walk, (cmd_t, mode_t))
    mode = np.asarray(diags['mode'])
    assert (mode[50:62] == C.MODE_PASSIVE).all()
    assert (mode[65:] == C.MODE_WALKING).all()
    assert not np.asarray(diags['fallen'])[-20:].any()
    # the KF's ~1 cm kinematic droop (test_walking_on_contact_aided_kf)
    # compounds with the post-passive recovery: 0.38 bar, same as tier-1 KF
    assert np.asarray(diags['height'])[-20:].min() > 0.38
    # the re-entry consumed the estimate: unit-check the helper directly
    est = RT.reentry_estimate('kf', carry, plant)
    np.testing.assert_allclose(np.asarray(est.position),
                               np.asarray(carry.est.kf.x[0:3]))
    np.testing.assert_allclose(np.asarray(est.quat),
                               np.asarray(carry.est.mahony.quat))
