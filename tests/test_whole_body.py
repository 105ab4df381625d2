"""Tier-2 articulated plant tests: dynamics-core exactness, passive and
MPC-closed-loop standing, and multi-step walking.

The dynamics core is validated against physical invariants (these caught
real bugs during development): mass-matrix symmetry/PD with the exact URDF
total mass on the translational block, exact gravity bias, exact free-fall.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hector.plant import rnea, model, whole_body as WB, srb
from hector.control import MotorCommand
from hector.config import DEFAULT_CONFIG as CFG
from hector import runtime as RT


def _zero_cmd():
    z = jnp.zeros((2, 5))
    return MotorCommand(tau=z, q_des=z, qd_des=z, kp=z, kd=z)


def test_mass_matrix_properties():
    pos = jnp.asarray([0.0, 0.0, 0.55])
    rot = jnp.eye(3)
    q = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, (2, 5)))
    m = np.asarray(rnea.mass_matrix(pos, rot, q))
    assert np.abs(m - m.T).max() < 1e-10
    np.testing.assert_allclose(np.diag(m)[:3], model.total_mass(), rtol=1e-9)
    assert np.linalg.eigvalsh(m).min() > 0


def test_gravity_bias_equals_weight():
    pos = jnp.asarray([0.0, 0.0, 0.55])
    q = jnp.asarray(np.random.default_rng(1).uniform(-0.3, 0.3, (2, 5)))
    bias = np.asarray(rnea.bias_forces(pos, jnp.eye(3), q,
                                       jnp.zeros(16), 9.81))
    np.testing.assert_allclose(bias[2], model.total_mass() * 9.81, rtol=1e-9)
    np.testing.assert_allclose(bias[:2], 0.0, atol=1e-12)


def test_free_fall():
    s = WB.init_whole_body_state(height=5.0, dtype=jnp.float64)
    step = jax.jit(lambda s: WB.step(s, _zero_cmd()))
    for _ in range(100):
        s = step(s)
    np.testing.assert_allclose(float(s.v_world[2]), -0.981, atol=2e-3)


def test_passive_pd_standing():
    cmd = MotorCommand(
        tau=jnp.zeros((2, 5)), q_des=jnp.zeros((2, 5)),
        qd_des=jnp.zeros((2, 5)),
        kp=jnp.asarray([[100.0, 100, 300, 300, 100]] * 2),
        kd=jnp.full((2, 5), 5.0))
    s = WB.init_whole_body_state(height=0.545, dtype=jnp.float64)
    step = jax.jit(lambda s: WB.step(s, cmd))
    for _ in range(500):
        s = step(s)
    assert 0.5 < float(s.position[2]) < 0.6
    assert abs(float(s.position[0])) < 0.1


@pytest.fixture(scope="module")
def wb_rollout():
    return RT.make_rollout_whole_body(300, cfg=CFG, batched=False)


def _init_pair():
    plant = WB.init_whole_body_state(height=0.545)
    obs = srb.PlantState(
        position=plant.position, quat=plant.quat, v_world=plant.v_world,
        omega_world=plant.omega_world, q=plant.q, qd=plant.qd,
        foot_anchor=jnp.zeros((2, 3)), contact=jnp.zeros((2,), bool))
    return RT.init_controller_carry(obs, CFG), plant


def test_mpc_standing_whole_body(wb_rollout):
    """Full MPC loop on the articulated plant: torque-only transmission,
    emergent contact -- holds the commanded height."""
    carry, plant = _init_pair()
    carry, plant, diags = wb_rollout(carry, plant, RT.standing_command())
    h = np.asarray(diags['height'])
    assert not np.asarray(diags['fallen']).any()
    assert 0.5 < h[-50:].mean() < 0.6


def test_mpc_walking_whole_body(wb_rollout):
    """Walks multiple full gait cycles on the articulated plant (1.5 s)."""
    carry, plant = _init_pair()
    carry, plant, diags = wb_rollout(carry, plant, RT.walking_command(vx=0.3))
    h = np.asarray(diags['height'])
    assert not np.asarray(diags['fallen']).any()
    assert h.min() > 0.4
    assert float(plant.position[0]) > 0.15


def test_whole_body_endurance_walk_5s_no_lateral_divergence():
    """The r1 tier-2 'lateral limit-cycle gap' regression: with the
    zero-width line foot the lateral rocking grew ~10%/step and the robot
    fell at ~2 s; the toe collision BOX of the URDF (const.xacro: 0.15 x
    0.02 x 0.04) has 2 cm of width, whose corner contacts provide the roll
    stiffness/damping that closes the cycle.  5 s endurance (VERDICT r1
    item 6 bar): bounded lateral excursion, no falls, sustained forward
    progress, and a non-growing lateral envelope over the final 2 s."""
    roll = RT.make_rollout_whole_body(1000, cfg=CFG, batched=False)
    carry, plant = _init_pair()
    carry, plant, diags = roll(carry, plant, RT.walking_command(vx=0.3))
    h = np.asarray(diags['height'])
    xy = np.asarray(diags['xy'])
    assert not np.asarray(diags['fallen']).any()
    assert h.min() > 0.45
    assert np.abs(xy[:, 1]).max() < 0.15       # lateral excursion bounded
    assert float(plant.position[0]) > 0.75     # >= ~0.15 m/s avg over 5 s
    # limit-cycle closed: last-2s lateral envelope no larger than the run
    # BEFORE the tail (a subset comparison against the full array would be
    # vacuously true)
    assert np.abs(xy[-400:, 1]).max() <= np.abs(xy[:-400, 1]).max() + 1e-6
    assert np.abs(xy[-400:, 1]).max() < 0.12
