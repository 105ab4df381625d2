"""Structured run metrics + host-side logging.

Replaces the reference's printf-in-the-hot-loop observability (solve times
at SolverMPC.cpp:717, trajectory dumps at ConvexMPCLocomotion.cpp:400-404 --
printed at 200 Hz/1 kHz) with: a metrics pytree reduced on-device (see
parallel.make_sharded_rollout), fetched to host once per rollout chunk, and
appended to a JSONL log.  Also provides a step timer that mirrors the
reference's Timer (include/common/Utilities/Timer.h) for profiling hooks.
"""

from __future__ import annotations

import json
import time
from typing import Optional

import numpy as np


class MetricsLogger:
    """Append-only JSONL metrics log; one line per rollout chunk."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self.history = []

    def log(self, step: int, metrics: dict, **extra) -> dict:
        rec = {"step": step, "t": time.time()}
        for k, v in {**metrics, **extra}.items():
            rec[k] = float(np.asarray(v)) if hasattr(v, "shape") or isinstance(
                v, (int, float, np.floating)) else v
        self.history.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def close(self):
        if self._fh:
            self._fh.close()


class StepTimer:
    """Wall-clock timer for device-step profiling (the Timer.h analog;
    always wrap timed regions with block_until_ready on the caller side)."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def ms(self) -> float:
        return (time.perf_counter() - self.t0) * 1e3

    def restart(self) -> None:
        self.t0 = time.perf_counter()


def summarize_rollout(diags) -> dict:
    """Host-side summary of stacked rollout diagnostics."""
    h = np.asarray(diags["height"])
    return dict(
        mean_height=float(h.mean()),
        min_height=float(h.min()),
        fallen_frac=float(np.asarray(diags["fallen"]).mean()),
        qp_mu_max=float(np.asarray(diags["qp_mu"]).max()),
        qp_r_dual_max=float(np.asarray(diags["qp_r_dual"]).max()),
    )
