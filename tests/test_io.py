"""IO subsystem tests: checkpoint/resume, trajectory playback, scenario
generation, metrics logging."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from hector import runtime as RT
from hector import parallel as PAR
from hector.config import DEFAULT_CONFIG as CFG
from hector.io import scenarios as SC
from hector.io import trajectory as TRAJ
from hector.io.metrics import MetricsLogger, summarize_rollout


def test_random_commands_envelope():
    cmd = SC.random_commands(jax.random.PRNGKey(0), 256)
    assert float(cmd.vx.min()) >= SC.VX_RANGE[0]
    assert float(cmd.vx.max()) <= SC.VX_RANGE[1]
    assert float(cmd.yaw_rate.max()) <= SC.YAW_RATE_RANGE[1]
    # standing scenarios have zero commands and full-stance gait
    standing = np.asarray(cmd.gait_durations[:, 0]) == 10.0
    assert standing.any()
    assert np.all(np.asarray(cmd.vx)[standing] == 0.0)


def test_disturbance_schedule_sparse():
    d = SC.disturbance_schedule(jax.random.PRNGKey(1), 64, 100, p_push=0.01)
    assert d.shape == (64, 100, 6)
    frac = float((np.abs(np.asarray(d)).sum(-1) > 0).mean())
    assert 0.001 < frac < 0.05


def test_trajectory_roundtrip(tmp_path):
    path = str(tmp_path / "traj.csv")
    times = np.arange(0, 1.0, 0.01)
    states = np.random.default_rng(0).normal(size=(100, 12))
    TRAJ.write_csv(path, times, states)
    tbl = TRAJ.TrajectoryTable.from_csv(path)
    np.testing.assert_allclose(
        np.asarray(tbl.state_at(jnp.asarray(0.505))), states[50], atol=1e-6)
    # clamping at both ends (extractTrajectory saturation semantics)
    np.testing.assert_allclose(
        np.asarray(tbl.state_at(jnp.asarray(-1.0))), states[0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tbl.state_at(jnp.asarray(99.0))), states[-1], atol=1e-6)
    # batched lookup
    out = tbl.state_at(jnp.asarray([0.0, 0.5, 0.99]))
    assert out.shape == (3, 12)


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(path)
    logger.log(0, {"a": jnp.asarray(1.5)}, note="x")
    logger.log(1, {"a": 2.0})
    logger.close()
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 2
    import json
    assert json.loads(lines[0])["a"] == 1.5


def test_checkpoint_roundtrip(tmp_path):
    from hector.io import checkpoint as CKPT
    path = str(tmp_path / "ckpt")
    carry, plant, cmd = PAR.make_batch(4, cfg=CFG)
    CKPT.save(path, 7, carry, plant, cmd)
    template = PAR.make_batch(4, cfg=CFG)
    step, restored = CKPT.restore(path, template)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored["plant"].position),
                               np.asarray(plant.position))
    np.testing.assert_allclose(np.asarray(restored["cmd"].vx),
                               np.asarray(cmd.vx))


def test_closed_loop_replay_tracks_table(tmp_path):
    """The completed TO-state capability: a trajectory table DRIVES the
    controller+plant in closed loop and the robot tracks it
    (FSMState_TO.cpp:27-40 leaves run() a stub; SURVEY.md §2.1 planned this
    harness).  Table: straight 0.4 m/s walk for 1 s."""
    import numpy as np
    from hector.io import trajectory as TRAJ

    n, dt = 240, 0.005
    t = np.arange(n) * dt
    states = np.zeros((n, 12))
    states[:, 3] = 0.4 * t          # x
    states[:, 5] = 0.55             # z
    states[:, 9] = 0.4              # vx
    path = str(tmp_path / "walk.csv")
    TRAJ.write_csv(path, t, states)
    table = TRAJ.TrajectoryTable.from_csv(path)

    report, diags = TRAJ.closed_loop_replay(table)
    assert not report['fallen']
    assert report['periods'] == n - 1 or report['periods'] == n
    # tracks the moving reference: bounded error, real forward progress
    assert report['pos_err_max'] < 0.25
    assert report['pos_err_final'] < 0.25
    assert float(np.asarray(diags['xy'])[-1, 0]) > 0.2
    assert report['height_err_mean'] < 0.08


def test_replay_cli_closed_loop(tmp_path, capsys):
    import json as _json
    import numpy as np
    from hector import cli
    from hector.io import trajectory as TRAJ

    n, dt = 60, 0.005
    t = np.arange(n) * dt
    states = np.zeros((n, 12))
    states[:, 5] = 0.55
    path = str(tmp_path / "stand.csv")
    TRAJ.write_csv(path, t, states)
    cli.main(["replay", path, "--closed-loop"])
    out = _json.loads(capsys.readouterr().out)
    assert out['fallen'] is False
    assert out['pos_err_max'] < 0.1


def test_checkpoint_roundtrip_whole_body(tmp_path):
    """Tier-2 (articulated) sim state checkpoints/resumes through the same
    orbax path: a mid-walk WholeBodyState+carry round-trips exactly and
    the restored pair continues the rollout."""
    import jax
    import jax.numpy as jnp
    from hector import runtime as RT
    from hector.plant import whole_body as WB
    from hector.io import checkpoint as CKPT

    roll = RT.make_rollout_whole_body(20, cfg=CFG, batched=False)
    plant = WB.init_whole_body_state(height=0.545)
    carry = RT.init_controller_carry(RT.whole_body_observation(plant), CFG)
    cmd = RT.walking_command(vx=0.3)
    carry, plant, _ = roll(carry, plant, cmd)

    path = str(tmp_path / "ckpt_wb")
    CKPT.save(path, 3, carry, plant, cmd)
    template = (jax.tree.map(jnp.zeros_like, carry),
                jax.tree.map(jnp.zeros_like, plant),
                jax.tree.map(jnp.zeros_like, cmd))
    step, restored = CKPT.restore(path, template)
    assert step == 3
    np.testing.assert_allclose(np.asarray(restored["plant"].q),
                               np.asarray(plant.q))
    np.testing.assert_allclose(np.asarray(restored["plant"].anchor),
                               np.asarray(plant.anchor))
    # resumed rollout runs from the restored state
    c2, p2, d2 = roll(restored["carry"], restored["plant"], restored["cmd"])
    assert not np.asarray(d2["fallen"]).any()
