"""Tier-1 plant unilateral contact + GRF telemetry.

The r1 plant froze body z near the ground whenever a contact was scheduled
(a non-physical hold); now ground reactions are unilateral: commanded GRF
(cone-constrained by the MPC), a clipped spring-damper on FK-foot
penetration, and a trunk backstop.  Reference physics anchor: the ODE
contact model in unitree_gazebo/worlds/normal.world.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hector import control as C
from hector import runtime as RT
from hector.plant import srb
from hector.config import DEFAULT_CONFIG as CFG


def _zero_cmd(dtype=jnp.float32):
    z = jnp.zeros((2, 5), dtype)
    return C.MotorCommand(tau=z, q_des=z, qd_des=z, kp=z, kd=z)


def test_cannot_hang_from_scheduled_contact():
    """With contact scheduled but ZERO commanded wrench and zero joint
    gains, the body must fall (the r1 z-freeze would have held it at
    5 cm above ground forever) and come to rest on the trunk backstop,
    never tunnelling below ground."""
    plant = srb.init_plant_state(CFG)
    wrench = jnp.zeros((2, 6), jnp.float32)
    contact = jnp.ones((2,), jnp.float32)

    def tick(p, _):
        p = srb.step(p, _zero_cmd(), wrench, contact, cfg=CFG)
        return p, p.position[2]

    plant, zs = jax.lax.scan(tick, plant, None, length=1500)
    zs = np.asarray(zs)
    assert zs[-1] < 0.30, 'plant was held up by a scheduled contact'
    assert zs.min() > -0.02, 'plant tunnelled through the ground'
    # settles near the trunk contact radius
    assert abs(zs[-1] - CFG.plant.trunk_radius) < 0.06


def test_foot_contact_force_is_unilateral():
    """A foot above the ground must produce zero spring force even with
    downward body velocity (no action at a distance), and a penetrated
    foot must never pull the body down (no adhesion)."""
    plant = srb.init_plant_state(CFG, height=0.8)   # feet well above ground
    plant = plant._replace(v_world=jnp.asarray([0.0, 0.0, -0.5], jnp.float32))
    p1 = srb.step(plant, _zero_cmd(), jnp.zeros((2, 6), jnp.float32), jnp.ones((2,), jnp.float32),
                  cfg=CFG)
    # free fall: dv = -g dt exactly (no contact force fired)
    dv = float(p1.v_world[2] - plant.v_world[2])
    assert abs(dv + CFG.plant.gravity * CFG.plant.dt) < 1e-6

    # penetrated foot moving up: spring may push up, never pull down
    low = srb.init_plant_state(CFG, height=0.50)    # feet ~4 cm underground
    low = low._replace(v_world=jnp.asarray([0.0, 0.0, 0.4], jnp.float32))
    p2 = srb.step(low, _zero_cmd(), jnp.zeros((2, 6), jnp.float32), jnp.ones((2,), jnp.float32),
                  cfg=CFG)
    dv2 = float(p2.v_world[2] - low.v_world[2])
    assert dv2 >= -CFG.plant.gravity * CFG.plant.dt - 1e-6


def test_ground_friction_caps_shear():
    """Commanded shear beyond mu * Fz is clipped by the ground."""
    plant = srb.init_plant_state(CFG)
    # commanded: tiny normal force, huge sideways force on both feet
    wrench = jnp.zeros((2, 6), jnp.float32).at[:, 0].set(50.0).at[:, 2].set(10.0)
    p0 = plant
    p1 = srb.step(p0, _zero_cmd(), wrench, jnp.ones((2,), jnp.float32), cfg=CFG)
    ax = float(p1.v_world[0] - p0.v_world[0]) / CFG.plant.dt
    # un-capped would be 100 N / 13.856 kg = 7.2 m/s^2; the cap allows at
    # most mu * Fz_total per foot (Fz_total includes any spring force)
    assert ax < 4.0


def test_rollout_wrench_and_contact_telemetry():
    """The rollout logs per-period (2,6) world wrenches + contact states
    (the foot_contact_plugin channel) and the viz helpers consume them."""
    import matplotlib
    matplotlib.use('Agg')
    from hector.io import viz

    roll = RT.make_rollout(n_periods=40, cfg=CFG, batched=False)
    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG)
    carry, plant, diags = roll(carry, plant, RT.walking_command(vx=0.4))
    w = np.asarray(diags['wrench'])
    c = np.asarray(diags['contact'])
    assert w.shape == (40, 2, 6)
    assert c.shape == (40, 2)
    # stance normal forces push up; swing legs log zero wrench
    assert (w[..., 2] * c >= -1e-5).all()
    assert np.abs(w[c == 0]).max() < 1e-5
    assert w[..., 2].max() > 50.0          # the robot is actually supported
    # gait alternates in walking
    assert c.min() == 0 and c.max() == 1
    fig1 = viz.plot_forces(w)
    fig2 = viz.plot_gait(c, dt=0.005)
    assert fig1 is not None and fig2 is not None


def test_limp_leg_damps_with_kd():
    """A kp=0/kd=5 (passive-mode) swing leg's joint velocity must DECAY
    under the commanded damping -- not freeze (r2 VERDICT weak #4; the
    reference's passive mode is damping-only, FSMState_Passive.cpp:10).
    With kd=0 the limp joint coasts instead."""
    plant = srb.init_plant_state(CFG, height=0.8)
    plant = plant._replace(qd=jnp.full((2, 5), 3.0, jnp.float32))
    no_contact = jnp.zeros((2,), jnp.float32)
    wrench = jnp.zeros((2, 6), jnp.float32)
    z = jnp.zeros((2, 5), jnp.float32)
    damped_cmd = C.MotorCommand(tau=z, q_des=z, qd_des=z, kp=z,
                                kd=jnp.full((2, 5), 5.0, jnp.float32))
    coast_cmd = C.MotorCommand(tau=z, q_des=z, qd_des=z, kp=z, kd=z)

    p_damp, p_coast = plant, plant
    for _ in range(50):   # 50 ms
        p_damp = srb.step(p_damp, damped_cmd, wrench, no_contact, cfg=CFG)
        p_coast = srb.step(p_coast, coast_cmd, wrench, no_contact, cfg=CFG)
    # kd=5 on J_eff=0.02 -> time constant 4 ms; 50 ms is >10 tau
    assert float(jnp.abs(p_damp.qd).max()) < 0.01
    assert float(jnp.abs(p_damp.q - plant.q).max()) > 1e-3   # it moved first
    assert float(jnp.abs(p_coast.qd - 3.0).max()) < 1e-5     # kd=0 coasts


def test_servo_torque_law_and_clamp():
    """The open reimplementation of the closed-source computeTorque servo:
    tau = Kp (q*-q) + Kd (dq*-dq) + tau_ff, clamped to the URDF 33.5 Nm
    effort limit (unitree_joint_control_tool.h; joint_controller.cpp:208)."""
    q = jnp.zeros((2, 5)); qd = jnp.full((2, 5), 0.5)
    cmd = C.MotorCommand(
        tau=jnp.full((2, 5), 1.0), q_des=jnp.full((2, 5), 0.1),
        qd_des=jnp.zeros((2, 5)), kp=jnp.full((2, 5), 30.0),
        kd=jnp.full((2, 5), 1.0))
    tau = np.asarray(srb.servo_torque(cmd, q, qd, CFG))
    np.testing.assert_allclose(tau, 30.0 * 0.1 + 1.0 * (-0.5) + 1.0,
                               rtol=1e-6)
    big = cmd._replace(kp=jnp.full((2, 5), 1e4))
    tau = np.asarray(srb.servo_torque(big, q, qd, CFG))
    np.testing.assert_allclose(tau, CFG.plant.torque_limit, rtol=1e-6)
