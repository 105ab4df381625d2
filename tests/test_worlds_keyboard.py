"""World presets, keyboard teleop mapping, and NaN quarantine.

Oracles: the reference's .world physics blocks (gravity), KeyBoard.cpp axis
stepping, FSMState_Walking.cpp:30-33 invNormalize envelope mapping, and the
SURVEY.md §5 failure-detection plan (quarantine has no reference analog --
the reference process would just crash/diverge).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hector import worlds
from hector.config import DEFAULT_CONFIG
from hector.io import keyboard as KB


def test_world_presets_cover_reference_worlds():
    # every .world file under unitree_gazebo/worlds/ has a preset
    for name in ("normal", "earth", "space", "stairs", "box", "maze",
                 "simple_house", "house_obstacles", "big_map",
                 "two_storeys"):
        assert name in worlds.WORLDS


def test_world_gravity():
    cfg, terrain = worlds.apply("normal", DEFAULT_CONFIG)
    assert cfg.plant.gravity == 9.81 and terrain.step_height == 0.0
    cfg, _ = worlds.apply("space", DEFAULT_CONFIG)
    assert cfg.plant.gravity == 0.0          # space.world: <gravity>0 0 0>
    # controller's MPC model keeps its own gravity (like the real controller)
    assert cfg.mpc.gravity == 9.81


def test_world_stairs_terrain():
    _, terrain = worlds.apply("stairs", DEFAULT_CONFIG)
    assert terrain.step_height > 0 and terrain.step_length > 0
    assert worlds.STAIRS_REFERENCE_GEOMETRY.step_height == 0.15


def test_unknown_world_raises():
    with pytest.raises(KeyError):
        worlds.get("moon")


def test_keyboard_axis_step_and_clamp():
    v = KB.UserValue()
    v = KB.update_value(v, "w")
    assert v.ly == pytest.approx(0.025)      # KeyBoard.h:25 sensitivity
    for _ in range(100):
        v = KB.update_value(v, "w")
    assert v.ly == 1.0                       # clamped (KeyBoard.cpp:63)
    v = KB.update_value(v, "s")
    assert v.ly == pytest.approx(0.975)
    v = KB.update_value(v, " ")              # space zeroes (KeyBoard.cpp:51)
    assert v == KB.UserValue()
    assert KB.update_value(v, "x") == v      # unmapped key: no-op


def test_keyboard_command_envelope():
    # full-forward stick -> vx = +0.75 (FSMState_Walking.cpp:30)
    v = KB.UserValue(ly=1.0, rx=-1.0, lx=0.0)
    vx, vy, wz = KB.value_to_command(v)
    assert vx == pytest.approx(0.75)
    assert vy == pytest.approx(-0.25)
    assert wz == pytest.approx(0.0)
    # centered stick -> zero command
    assert KB.value_to_command(KB.UserValue()) == pytest.approx((0, 0, 0))


def test_inv_normalize():
    assert KB.inv_normalize(-1.0, -1.5, 1.5) == pytest.approx(-1.5)
    assert KB.inv_normalize(+1.0, -1.5, 1.5) == pytest.approx(+1.5)
    assert KB.inv_normalize(0.0, -1.5, 1.5) == pytest.approx(0.0)


def test_nan_quarantine_freezes_lane_keeps_batch_clean():
    from hector import runtime as RT
    from hector.plant import srb

    cfg = DEFAULT_CONFIG
    plant1 = srb.init_plant_state(cfg)
    carry1 = RT.init_controller_carry(plant1, cfg)
    tile = lambda x: jnp.broadcast_to(x, (2,) + x.shape)
    plant = jax.tree.map(tile, plant1)
    carry = jax.tree.map(tile, carry1)
    cmd = jax.tree.map(tile, RT.walking_command(vx=0.3))
    # poison lane 1's velocity
    v = plant.v_world.at[1, 0].set(jnp.nan)
    plant = plant._replace(v_world=v)

    roll = RT.make_rollout(3, cfg=cfg, batched=True)
    carry, plant, diags = roll(carry, plant, cmd)

    # diags are (batch, n_periods): vmap outside the period scan
    # lane 1: quarantined, frozen finite, passive
    assert np.asarray(diags["quarantined"][1]).any()
    assert np.isfinite(np.asarray(plant.position[1])).all()
    assert int(carry.mode[1]) == 0  # MODE_PASSIVE
    # lane 0: unaffected, healthy, still walking
    assert not np.asarray(diags["quarantined"][0]).any()
    assert int(carry.mode[0]) == 1
    assert np.isfinite(np.asarray(diags["height"][0])).all()


def test_replay_cli_roundtrip(tmp_path):
    from hector.io.trajectory import write_csv
    from hector import cli

    path = str(tmp_path / "traj.csv")
    times = np.linspace(0.0, 1.0, 11)
    states = np.tile(np.arange(12, dtype=float), (11, 1)) * times[:, None]
    write_csv(path, times, states)
    cli.main(["replay", path])  # smoke: parses + prints JSON
