"""Sharded-rollout tests on the virtual 8-device CPU mesh (the same code
path runs over ICI on a real slice; conftest sets
--xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp

from hector import parallel as PAR
from hector.config import DEFAULT_CONFIG as CFG


def test_mesh_has_8_devices():
    mesh = PAR.data_mesh()
    assert mesh.devices.size == 8


def test_sharded_rollout_metrics():
    mesh = PAR.data_mesh()
    carry, plant, cmd = PAR.make_batch(16, cfg=CFG, mesh=mesh)
    roll = PAR.make_sharded_rollout(20, mesh, CFG)
    carry, plant, metrics = roll(carry, plant, cmd)
    assert float(metrics['fallen_count']) == 0.0
    assert 0.4 < float(metrics['mean_height']) < 0.6
    assert float(metrics['qp_mu_max']) < 1e-4
    # outputs stay sharded over the mesh
    shards = plant.position.sharding
    assert len(shards.device_set) == 8


def test_sharded_equals_single_device():
    """Sharding must not change results (pure data parallelism)."""
    mesh = PAR.data_mesh()
    carry, plant, cmd = PAR.make_batch(8, cfg=CFG)
    from hector import runtime as RT
    roll = RT.make_rollout(10, cfg=CFG, batched=True)
    c1, p1, d1 = roll(carry, plant, cmd)

    carry_s, plant_s, cmd_s = (PAR.shard_batch(t, mesh)
                               for t in (carry, plant, cmd))
    c2, p2, d2 = roll(carry_s, plant_s, cmd_s)
    # bitwise equality is not guaranteed (different XLA fusion choices per
    # sharding); closed-loop trajectories must still agree tightly
    np.testing.assert_allclose(np.asarray(p1.position),
                               np.asarray(p2.position), atol=1e-6)
