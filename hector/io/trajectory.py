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
        return cls(np.loadtxt(path, delimiter=","))

    def row_at(self, t):
        """Row for elapsed time t (clamped; matches extractTrajectory's
        index-by-time with saturation at the final row)."""
        idx = jnp.searchsorted(self.times, t, side="right") - 1
        idx = jnp.clip(idx, 0, self.data.shape[0] - 1)
        return self.data[idx]

    def state_at(self, t):
        """The 12-dim reference state at time t (batched over t)."""
        return self.row_at(t)[..., 1:13]


def write_csv(path: str, times, states, payload=None) -> None:
    """Write a playback CSV in the reference's layout (time + 12 state +
    payload columns padded to 34)."""
    times = np.asarray(times)[:, None]
    states = np.asarray(states)
    if payload is None:
        payload = np.zeros((times.shape[0], 34 - 1 - states.shape[1]))
    table = np.concatenate([times, states, np.asarray(payload)], axis=1)
    np.savetxt(path, table, delimiter=",")
