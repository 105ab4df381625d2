"""Scenario data-parallelism: device meshes, sharded rollouts, collective
metric reductions.

The reference is single-process/single-robot (SURVEY.md §2.4); scale here
comes from sharding the scenario batch over a ``('data',)`` mesh:

- within a slice, XLA collectives ride ICI (the TPU-native NCCL equivalent);
- across hosts, initialize with ``jax.distributed.initialize`` (multihost())
  and the same code runs over DCN;
- per-scenario state never crosses devices -- the only communication is the
  psum/pmean in ``reduce_metrics`` (solves/s accounting, health counters),
  placed explicitly with shard_map.

Tested on a virtual 8-device CPU mesh (tests/test_parallel.py); the driver's
``dryrun_multichip`` exercises the same path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import HectorConfig, DEFAULT_CONFIG
from . import runtime as RT
from .plant import srb


def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(devs, ('data',))


def multihost(coordinator: Optional[str] = None, num_processes: int = 1,
              process_id: int = 0) -> Mesh:
    """Initialize the DCN-connected multi-host runtime, then build the global
    data mesh.  On a single host this is a no-op wrapper around data_mesh()."""
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id)
    return data_mesh()


def shard_batch(tree, mesh: Mesh):
    """Place a scenario-batched pytree with the batch axis over 'data'."""
    sharding = NamedSharding(mesh, P('data'))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_batch(batch: int, cmd_fn=None, cfg: HectorConfig = DEFAULT_CONFIG,
               mesh: Optional[Mesh] = None, seed: int = 0):
    """(carry, plant, cmd) for `batch` scenarios, optionally sharded.

    cmd_fn: index array (batch,) -> ScenarioCommand pytree (vmapped); default
    is forward walking at speeds spread over the teleop envelope
    (FSMState_Walking.cpp:30, vx in [-0.75, 0.75]).  Estimator noise streams
    get per-lane keys folded from `seed`."""
    plant1 = srb.init_plant_state(cfg)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(seed), jnp.arange(batch))
    carry = jax.vmap(lambda k: RT.init_controller_carry(plant1, cfg, key=k))(
        keys)
    tile = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
    plant = jax.tree.map(tile, plant1)
    if cmd_fn is None:
        vx = jnp.linspace(-0.75, 0.75, batch)
        cmd_fn = lambda i: RT.walking_command(vx=vx[i])
    cmd = jax.vmap(cmd_fn)(jnp.arange(batch))
    if mesh is not None:
        carry, plant, cmd = (shard_batch(t, mesh)
                             for t in (carry, plant, cmd))
    return carry, plant, cmd


def make_sharded_rollout(n_periods: int, mesh: Mesh,
                         cfg: HectorConfig = DEFAULT_CONFIG):
    """Sharded closed-loop rollout + explicitly-placed metric reduction.

    Returns rollout(carry, plant, cmd) -> (carry', plant', metrics) where
    metrics are GLOBAL scalars (psum over the mesh): mean height, fallen
    count, qp convergence stats.  Zero device->host traffic inside the step
    (SURVEY.md §5 observability plan).

    The WHOLE step body lives inside one shard_map: each device runs the
    vmapped rollout -- including the fused Pallas QP kernel when
    cfg.solver.backend selects it -- on its local scenario shard, and only
    the scalar metric reductions cross the mesh (psum/pmax over ICI/DCN).
    """
    roll = RT.make_rollout(n_periods, cfg=cfg, batched=True)

    def step(carry, plant, cmd):
        carry, plant, diags = roll(carry, plant, cmd)
        height = diags['height'].astype(jnp.float32)
        n = jax.lax.psum(jnp.asarray(height.size, jnp.float32), 'data')
        metrics = dict(
            mean_height=jax.lax.psum(jnp.sum(height), 'data') / n,
            fallen_count=jax.lax.psum(
                jnp.sum(diags['fallen'].astype(jnp.float32)), 'data'),
            qp_mu_max=jax.lax.pmax(
                jnp.max(diags['qp_mu'].astype(jnp.float32)), 'data'),
        )
        return carry, plant, metrics

    # check_vma=False: pallas_call outputs do not carry varying-mesh-axis
    # annotations yet, so the per-shard kernel needs the vma check off
    return jax.jit(jax.shard_map(
        step, mesh=mesh, check_vma=False,
        in_specs=(P('data'), P('data'), P('data')),
        out_specs=(P('data'), P('data'), P())))
