"""Offline-trajectory playback (the FSMState_TO capability).

The reference's trajectory-optimization state loads a 34-column CSV
(include/trajectory_data/example.csv; FSMState_TO.cpp:6-15), indexes a row
by elapsed time (extractTrajectory, FSMState_TO.cpp:100-112), and -- its
run() being a stub -- never actually applies it.  Here the replay harness is
completed: load a trajectory table, look rows up by time (batched), and
expose them as state/input references for parity testing against recorded
reference rollouts.

Column layout (34 = 1 time + 12 state + 12 state_dot + ... in the reference
the example file carries time, CoM state and joint/force channels).  We keep
the format: col 0 = time [s], cols 1:13 = the 12-dim MPC state
[rpy, p, omega, v], remaining columns free-form payload preserved verbatim.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class TrajectoryTable:
    """In-memory trajectory with time-indexed lookup (device-resident)."""

    def __init__(self, data: np.ndarray):
        if data.ndim != 2 or data.shape[1] < 13:
            raise ValueError(
                f"trajectory needs (rows, >=13) columns, got {data.shape}")
        self.data = jnp.asarray(data)
        self.times = self.data[:, 0]

    @classmethod
    def from_csv(cls, path: str) -> "TrajectoryTable":
        # ndmin=2: a single-row file (e.g. the reference's own
        # example.csv placeholder) must stay a (1, 34) table
        return cls(np.loadtxt(path, delimiter=",", ndmin=2))

    def row_at(self, t):
        """Row for elapsed time t (clamped; matches extractTrajectory's
        index-by-time with saturation at the final row)."""
        idx = jnp.searchsorted(self.times, t, side="right") - 1
        idx = jnp.clip(idx, 0, self.data.shape[0] - 1)
        return self.data[idx]

    def state_at(self, t):
        """The 12-dim reference state at time t (batched over t)."""
        return self.row_at(t)[..., 1:13]


def command_schedule(table: "TrajectoryTable", n_periods: int,
                     dt_period: float):
    """Convert a trajectory table into a per-period rollout schedule
    (cmd_t, mode_cmd_t) for ``runtime.make_rollout(with_schedule=True)``.

    The table's 12-dim state rows [rpy, p, omega, v] (world frame, the
    reference's trajAll layout) become teleop-style commands: body-frame
    vx/vy from the world velocity rotated by the row's yaw, yaw_rate from
    omega_z, roll/pitch targets from the row's rpy.  This completes what
    FSMState_TO leaves as a stub (FSMState_TO.cpp:27-40): the table actually
    DRIVES the walking controller.
    """
    from .. import runtime as RT

    t = jnp.arange(n_periods) * dt_period
    # float32: the rollout/solver pipeline is f32; tables loaded from CSV
    # are f64 under x64 test configs
    states = table.state_at(t).astype(jnp.float32)   # (n, 12)
    yaw = states[:, 2]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    vx_b = cy * states[:, 9] + sy * states[:, 10]
    vy_b = -sy * states[:, 9] + cy * states[:, 10]
    n = n_periods
    walk = RT.walking_command()
    tile = lambda x: jnp.broadcast_to(x, (n,) + x.shape)
    cmd_t = RT.ScenarioCommand(
        vx=vx_b, vy=vy_b, yaw_rate=states[:, 8],
        roll=states[:, 0], pitch=states[:, 1],
        gait_offsets=tile(walk.gait_offsets),
        gait_durations=tile(walk.gait_durations),
        terrain_step_height=tile(walk.terrain_step_height),
        terrain_step_length=tile(walk.terrain_step_length))
    mode_t = jnp.full((n,), RT.MODE_CMD_NONE, jnp.int32)
    return cmd_t, mode_t


def closed_loop_replay(table: "TrajectoryTable", cfg=None, seconds=None):
    """Closed-loop trajectory playback: drive the full controller+plant
    rollout from the table and report tracking errors against its state
    reference.  Returns (report dict, diags).  The parity harness SURVEY.md
    §2.1 planned for the TO state."""
    from .. import runtime as RT
    from ..plant import srb
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    dt_period = cfg.mpc.dt * cfg.mpc.mpc_cadence
    t_end = float(table.times[-1]) if seconds is None else seconds
    n_periods = max(1, int(t_end / dt_period))
    cmd_t, mode_t = command_schedule(table, n_periods, dt_period)

    plant = srb.init_plant_state(cfg)
    carry = RT.init_controller_carry(plant, cfg)
    roll = RT.make_rollout(n_periods, cfg=cfg, batched=False,
                           with_schedule=True)
    base = jax.tree.map(lambda x: x[0], cmd_t)
    carry, plant, diags = roll(carry, plant, base, (cmd_t, mode_t))

    t = np.arange(n_periods) * dt_period
    ref = np.asarray(table.state_at(jnp.asarray(t)))
    xy = np.asarray(diags['xy'])
    z = np.asarray(diags['height'])
    pos_err = np.linalg.norm(xy - ref[:, 3:5], axis=-1)
    report = dict(
        rows=int(np.asarray(table.times).shape[0]),
        periods=n_periods,
        seconds=round(t_end, 3),
        fallen=bool(np.asarray(diags['fallen']).any()),
        pos_err_mean=round(float(pos_err.mean()), 4),
        pos_err_final=round(float(pos_err[-1]), 4),
        pos_err_max=round(float(pos_err.max()), 4),
        height_err_mean=round(float(np.abs(z - ref[:, 5]).mean()), 4),
    )
    return report, diags


def write_csv(path: str, times, states, payload=None) -> None:
    """Write a playback CSV in the reference's layout (time + 12 state +
    payload columns padded to 34)."""
    times = np.asarray(times)[:, None]
    states = np.asarray(states)
    if payload is None:
        payload = np.zeros((times.shape[0], 34 - 1 - states.shape[1]))
    table = np.concatenate([times, states, np.asarray(payload)], axis=1)
    np.savetxt(path, table, delimiter=",")
