"""Native host scenario generator + double-buffered stream."""

import numpy as np
import jax

from hector.io import host_pipeline as HP
import pytest

pytestmark = pytest.mark.slow


def test_native_generator_determinism_and_envelope():
    a = HP.generate_host(seed=7, batch=512)
    b = HP.generate_host(seed=7, batch=512)
    np.testing.assert_array_equal(a, b)
    c = HP.generate_host(seed=8, batch=512)
    assert np.abs(a - c).max() > 0
    # teleop envelope (FSMState_Walking.cpp:30-33)
    assert a[:, 0].min() >= -0.75 and a[:, 0].max() <= 0.75
    assert a[:, 1].min() >= -0.25 and a[:, 1].max() <= 0.25
    assert a[:, 2].min() >= -1.5 and a[:, 2].max() <= 1.5
    # standing scenarios: zero command, (10,10) durations
    standing = a[:, 7] == 10.0
    assert standing.mean() > 0.02  # ~10%
    assert np.all(a[standing][:, 0:3] == 0.0)
    # walking gait (0,5)/(5,5)
    walk = ~standing
    assert np.all(a[walk][:, 6] == 5.0) and np.all(a[walk][:, 7] == 5.0)


def test_row_sharding_equivalence():
    """Row i depends only on (seed, i): a host generating rows [256, 512)
    reproduces the tail of the full batch (multi-host shard contract)."""
    full = HP.generate_host(seed=3, batch=512)
    shard = HP.generate_host(seed=3, batch=256, row_begin=256)
    np.testing.assert_array_equal(full[256:], shard)


def test_rows_to_command_pytree():
    rows = HP.generate_host(seed=0, batch=64)
    cmd = HP.rows_to_command(rows)
    assert cmd.vx.shape == (64,)
    assert cmd.gait_offsets.shape == (64, 2)
    assert cmd.terrain_step_length.shape == (64,)


def test_stream_double_buffering_and_rollout():
    from jax.sharding import Mesh
    from hector import parallel as PAR, runtime as RT
    from hector.config import DEFAULT_CONFIG as CFG

    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    stream = HP.ScenarioStream(batch=16, seed=1, mesh=mesh, p_stairs=0.2)
    cmd0 = next(stream)
    cmd1 = next(stream)
    # distinct steps -> distinct batches; sharded over the mesh
    assert float(np.abs(np.asarray(cmd0.vx) - np.asarray(cmd1.vx)).max()) > 0
    assert len(cmd0.vx.sharding.device_set) == 8

    carry, plant, _ = PAR.make_batch(16, cfg=CFG, mesh=mesh)
    roll = PAR.make_sharded_rollout(2, mesh, CFG)
    _, plant, metrics = roll(carry, plant, cmd0)
    assert np.isfinite(float(metrics["mean_height"]))
    stream.close()
