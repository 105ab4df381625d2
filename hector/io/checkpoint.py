"""Checkpoint / resume for batched runs.

The reference has no state serialization (SURVEY.md §5): the only persisted
artifact is a read-only trajectory CSV.  Large scenario batches (BASELINE
config 5: 256k scenarios across hosts) need resumable state; this module
checkpoints the full (ControllerCarry, PlantState, ScenarioCommand) pytree
plus step metadata with orbax -- multi-host safe (each host writes its
shards) and atomic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _manager(path: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True))


def save(path: str, step: int, carry, plant, cmd, extra: Optional[dict] = None,
         manager: Optional[ocp.CheckpointManager] = None) -> None:
    """Checkpoint the rollout state at `step` (MPC periods completed)."""
    mgr = manager or _manager(path)
    state = dict(carry=carry, plant=plant, cmd=cmd, extra=extra or {})
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    if manager is None:
        mgr.close()


def restore(path: str, abstract_state,
            step: Optional[int] = None,
            manager: Optional[ocp.CheckpointManager] = None
            ) -> Tuple[int, Any]:
    """Restore (step, {carry, plant, cmd, extra}).

    abstract_state: a pytree of the same structure/shapes/shardings (e.g. a
    freshly built batch) used as the restore template -- this is what makes
    restore reproduce the original NamedShardings on a mesh.
    """
    mgr = manager or _manager(path)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    template = dict(carry=abstract_state[0], plant=abstract_state[1],
                    cmd=abstract_state[2], extra={})
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    if manager is None:
        mgr.close()
    return step, restored
