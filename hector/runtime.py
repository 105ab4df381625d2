"""Jitted control/sim loops: per-tick controller, MPC-cadence rollout,
scenario batching.

This is the TPU-native replacement for the reference's two-process runtime
(1 kHz ``while(running){FSM->run(); rate.sleep();}`` at main.cpp:66-70
talking to Gazebo over ROS topics): controller and plant are one pure jitted
program; the scenario batch replaces wall-clock real time.

Loop structure (instead of the reference's ``iterationCounter % 5`` branch,
ConvexMPCLocomotion.cpp:277): the rollout scans over MPC periods, each
unrolling 5 control ticks where only tick 0 solves the QP -- ``do_mpc`` is a
*static* python bool, so no per-lane branching ever reaches XLA and the
batched QP solve runs exactly at the 200 Hz cadence.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import HectorConfig, DEFAULT_CONFIG, JOINT_OFFSETS
from . import gait as G
from . import control as C
from . import estimation as EST
from . import mpc as M
from . import swing as SW
from .plant import srb
from .kinematics import foot_position, leg_jacobians


class ScenarioCommand(NamedTuple):
    """Per-scenario teleop command + gait selection (the batched analog of
    the keyboard axes at FSMState_Walking.cpp:30-33 and setGaitNum)."""

    vx: jnp.ndarray          # desired body-frame x velocity
    vy: jnp.ndarray
    yaw_rate: jnp.ndarray
    roll: jnp.ndarray
    pitch: jnp.ndarray
    gait_offsets: jnp.ndarray    # (2,) segments
    gait_durations: jnp.ndarray  # (2,) segments
    # terrain (plant-side extension; the controller keeps the reference's
    # flat-ground assumption, so terrain is a robustness perturbation):
    # ground height h(x) = step_height * floor(x / step_length)
    terrain_step_height: jnp.ndarray  # scalar, 0 = flat
    terrain_step_length: jnp.ndarray  # scalar


def walking_command(vx=0.0, vy=0.0, yaw_rate=0.0, step_height=0.0,
                    step_length=1.0, dtype=jnp.float32):
    return ScenarioCommand(
        vx=jnp.asarray(vx, dtype), vy=jnp.asarray(vy, dtype),
        yaw_rate=jnp.asarray(yaw_rate, dtype),
        roll=jnp.asarray(0.0, dtype), pitch=jnp.asarray(0.0, dtype),
        gait_offsets=jnp.asarray([0.0, 5.0], dtype),
        gait_durations=jnp.asarray([5.0, 5.0], dtype),
        terrain_step_height=jnp.asarray(step_height, dtype),
        terrain_step_length=jnp.asarray(step_length, dtype))


def standing_command(dtype=jnp.float32):
    return ScenarioCommand(
        vx=jnp.asarray(0.0, dtype), vy=jnp.asarray(0.0, dtype),
        yaw_rate=jnp.asarray(0.0, dtype),
        roll=jnp.asarray(0.0, dtype), pitch=jnp.asarray(0.0, dtype),
        gait_offsets=jnp.asarray([0.0, 0.0], dtype),
        gait_durations=jnp.asarray([10.0, 10.0], dtype),
        terrain_step_height=jnp.asarray(0.0, dtype),
        terrain_step_length=jnp.asarray(1.0, dtype))


class ControllerCarry(NamedTuple):
    tick: jnp.ndarray          # int32 iterationCounter
    mode: jnp.ndarray          # int32 FSM mode
    planner: M.PlannerState
    swing: SW.SwingState
    command: C.CommandState
    est: EST.EstimatorState    # pluggable-estimator carry (cheater ignores)


def init_controller_carry(plant: srb.PlantState,
                          cfg: HectorConfig = DEFAULT_CONFIG,
                          key=None,
                          noise: EST.SensorNoise = EST.SensorNoise()):
    """firstRun initialization (ConvexMPCLocomotion.cpp:66-111).

    key: PRNG key seeding the estimator's sensor-noise stream (per lane;
    unused by the default cheater estimator).  noise: the sensor noise
    model -- the per-lane TRUE gyro bias is drawn HERE (est_init), so a
    caller configuring a custom SensorNoise must pass the same model here
    and to the rollout factory (make_rollout/make_rollout_whole_body
    ``noise=``, which threads it to every est_update tick)."""
    dtype = plant.position.dtype
    if key is None:
        key = jax.random.PRNGKey(0)
    est = C.estimate_state(plant.position, plant.v_world, plant.quat,
                           plant.omega_world)
    p_leg = foot_position(plant.q, cfg)
    p_foot_w = M.foot_positions_world(est, p_leg, cfg)
    return ControllerCarry(
        tick=jnp.asarray(0, jnp.int32),
        mode=jnp.asarray(C.MODE_WALKING, jnp.int32),
        planner=M.init_planner_state(plant.position, dtype),
        swing=SW.init_swing_state(p_foot_w, dtype),
        command=C.CommandState(yaw_des=jnp.asarray(0.0, dtype)),
        est=EST.est_init(plant, key, cfg, noise=noise))


N_SEGMENTS = 10  # gait table length == MPC horizon (GaitGenerator ctor args)

# user mode commands (the batched analog of UserCommand keys,
# src/interface/KeyBoard.cpp:31-93 / FSM checkTransition):
#   MODE_CMD_NONE: no transition request this period
#   C.MODE_PASSIVE (0): L2_B -> passive (FSMState_Walking.cpp:49-51)
#   C.MODE_WALKING (1): L1_X -> walking (FSMState_Passive.cpp:33-39; the
#     reference's checkTransition is missing the `return` -- undefined
#     behavior in C++, practically the robot stays limp.  We implement the
#     INTENDED transition and document the bug.)
MODE_CMD_NONE = -1


def reentry_estimate(estimator: str, carry: ControllerCarry,
                     plant: srb.PlantState) -> C.StateEstimate:
    """The state estimate available at an FSM re-entry instant, per
    estimator kind: the honest 'kf' path re-enters from its OWN filter
    state (KF position/velocity + Mahony attitude; omega is irrelevant to
    the re-init and set to zero), never from plant truth.  'filtered'
    re-enters from its IIR state (quat channel is that path's documented
    staging cheat); 'cheater' from ground truth, as the reference does."""
    dtype = plant.position.dtype
    if estimator == 'kf':
        return C.estimate_state(
            carry.est.kf.x[0:3], carry.est.kf.x[3:6],
            carry.est.mahony.quat, jnp.zeros(3, dtype))
    if estimator == 'filtered':
        return C.estimate_state(carry.est.filt.pos, carry.est.filt.vel,
                                plant.quat, plant.omega_world)
    return C.estimate_state(plant.position, plant.v_world, plant.quat,
                            plant.omega_world)


def reenter_walking(carry: ControllerCarry, plant: srb.PlantState,
                    cfg: HectorConfig = DEFAULT_CONFIG,
                    est: C.StateEstimate = None) -> ControllerCarry:
    """FSMState_Walking::enter() + ConvexMPCLocomotion firstRun
    (ConvexMPCLocomotion.cpp:66-111) as a pure re-initialization of the
    planner/swing carry at the CURRENT state -- applied per lane when a
    mode command flips it back to walking.  est: the estimate to re-enter
    from (reentry_estimate); None = ground truth (cheater)."""
    dtype = plant.position.dtype
    if est is None:
        est = C.estimate_state(plant.position, plant.v_world, plant.quat,
                               plant.omega_world)
    p_leg = foot_position(plant.q, cfg)
    p_foot_w = M.foot_positions_world(est, p_leg, cfg)
    return carry._replace(
        planner=M.init_planner_state(est.position, dtype),
        swing=SW.init_swing_state(p_foot_w, dtype),
        command=C.CommandState(yaw_des=jnp.asarray(0.0, dtype)))


def apply_mode_command(carry: ControllerCarry, plant: srb.PlantState,
                       mode_cmd, cfg: HectorConfig = DEFAULT_CONFIG,
                       estimator: str = 'cheater'):
    """The FSM NORMAL/CHANGE step (FSM.cpp:37-54) as a per-lane mode update:
    a non-negative mode_cmd requests that state; entering WALKING re-runs
    the walking enter() initialization (exit()/enter() pair of the
    reference's CHANGE branch) from the ESTIMATE the active estimator kind
    provides (reentry_estimate) -- the honest path never touches truth."""
    req = jnp.asarray(mode_cmd, carry.mode.dtype)
    new_mode = jnp.where(req >= 0, req, carry.mode)
    entering_walk = (new_mode == C.MODE_WALKING) & \
        (carry.mode != C.MODE_WALKING)
    fresh = reenter_walking(carry, plant, cfg,
                            est=reentry_estimate(estimator, carry, plant))
    merged = jax.tree.map(
        lambda f, c: jnp.where(entering_walk, f, c), fresh, carry)
    return merged._replace(mode=new_mode)


def controller_tick(carry: ControllerCarry, plant: srb.PlantState,
                    cmd: ScenarioCommand, do_mpc: bool,
                    cfg: HectorConfig = DEFAULT_CONFIG,
                    estimator: str = 'cheater',
                    est_ground_z: float = 0.0,
                    noise: EST.SensorNoise = EST.SensorNoise()):
    """One 1 kHz FSM tick (FSM::run -> FSMState_Walking::run,
    FSM.cpp:28-57, FSMState_Walking.cpp:26-41).

    do_mpc is STATIC: the rollout calls the True variant every 5th tick.
    estimator is STATIC ('cheater' | 'filtered' | 'kf',
    hector/estimation.py): the controller consumes ONLY the estimate --
    plant ground truth never leaks past this line for non-cheater kinds.
    Returns (carry', MotorCommand, wrench_world (2,6), stance_mask (2,),
    diagnostics dict).
    """
    dtype = plant.position.dtype
    offsets = jnp.asarray(JOINT_OFFSETS, dtype)

    # --- state estimation (StateEstimatorContainer::run analog) ---
    # The KF's foot-height rows consume the commanded terrain MAP (the
    # perception-heightmap analog), evaluated at the filter's own foot-x
    # estimates -- never the plant's runtime ground truth.
    est_state, est = EST.est_update(
        estimator, carry.est, plant, cfg, noise=noise,
        ground_z=est_ground_z,
        terrain=(cmd.terrain_step_height, cmd.terrain_step_length))
    mode = C.apply_safety(carry.mode, est)

    # --- LegController::updateData (+ the data.q mutation quirk) ---
    j_fm, j_f = leg_jacobians(plant.q, cfg)
    p_leg = foot_position(plant.q, cfg)
    q_data = plant.q + offsets

    # --- DesiredStateCommand ---
    v_des_robot = jnp.stack([cmd.vx, cmd.vy, jnp.asarray(0.0, dtype)])
    command = C.command_update(carry.command, est, cmd.yaw_rate, cfg.mpc.dt)

    # --- planner every-tick updates ---
    planner, v_des_world = M.integrate_position_setpoint(
        carry.planner, est, v_des_robot, cfg)
    p_foot_w = M.foot_positions_world(est, p_leg, cfg)

    # --- gait phase ---
    iteration, phase = G.phase_state(
        carry.tick, cfg.mpc.iterations_between_mpc, N_SEGMENTS)
    contact_sub = G.contact_subphase(
        phase.astype(dtype), cmd.gait_offsets, cmd.gait_durations, N_SEGMENTS)
    swing_sub = G.swing_subphase(
        phase.astype(dtype), cmd.gait_offsets, cmd.gait_durations, N_SEGMENTS)
    gait_table = G.mpc_gait_table(
        iteration, cmd.gait_offsets, cmd.gait_durations, N_SEGMENTS
    ).astype(dtype)

    # --- MPC solve at the 200 Hz cadence ---
    diag = {}
    if do_mpc:
        planner, wrench_world, sol = M.mpc_update(
            planner, est, q_data, p_foot_w, v_des_robot, cmd.yaw_rate,
            cmd.roll, cmd.pitch, gait_table, cfg)
        diag = dict(qp_mu=sol.mu, qp_r_dual=sol.r_dual, qp_r_prim=sol.r_prim)
    else:
        # reuse last solution: reconstruct the world wrench from stored f_ff
        f = planner.f_ff
        wrench_world = jnp.concatenate([
            -(f[:, 0:3] @ est.r_body), -(f[:, 3:6] @ est.r_body)], axis=-1)

    # --- swing-leg controller (runs every tick; double-call quirk inside) ---
    swing_state, p_foot_b, in_swing = SW.swing_update(
        carry.swing, est, p_leg, v_des_robot, swing_sub,
        cmd.gait_durations[0], jnp.asarray(float(N_SEGMENTS), dtype), cfg)
    q_des, kp, kd = SW.swing_joint_setpoints(p_foot_b, q_data, in_swing, cfg)

    # --- stance/swing dispatch (ConvexMPCLocomotion.cpp:196-268) ---
    stance_mask = (~in_swing) & (contact_sub > 0)
    motor_cmd = C.leg_torque_command(
        j_fm, planner.f_ff, stance_mask.astype(dtype), q_des, kp, kd)
    motor_cmd = C.apply_mode(motor_cmd, mode)
    wrench_world = wrench_world * stance_mask[:, None].astype(dtype)
    wrench_world = wrench_world * (mode == C.MODE_WALKING).astype(dtype)

    new_carry = ControllerCarry(
        tick=carry.tick + 1, mode=mode, planner=planner,
        swing=swing_state, command=command, est=est_state)
    diag.update(height=est.position[2], vx=est.v_world[0],
                vy=est.v_world[1], yaw=est.rpy[2],
                v_body=est.v_body[0:2],
                xy=est.position[0:2],
                fallen=(mode == C.MODE_PASSIVE))
    return new_carry, motor_cmd, wrench_world, stance_mask, diag


def make_rollout(n_periods: int, cfg: HectorConfig = DEFAULT_CONFIG,
                 batched: bool = True, with_disturbance: bool = False,
                 estimator: str = 'cheater', with_schedule: bool = False,
                 noise: 'EST.SensorNoise' = EST.SensorNoise()):
    """Build a jitted rollout of ``n_periods`` MPC periods (5 ticks each).

    Returns rollout(carry, plant, cmd[, disturbance][, schedule]) ->
    (carry', plant', diagnostics); diagnostics are stacked over periods.
    With batched=True all inputs carry a leading scenario axis (vmap); shard
    the inputs with NamedSharding to scale across devices
    (hector/parallel.py).

    with_disturbance=True adds a (n_periods, 6) world-wrench input applied
    on every tick of its period (push-recovery testing; the analog of
    external_force teleop, unitree_controller/src/external_force.cpp).

    with_schedule=True adds a per-period command schedule
    ``(cmd_t, mode_cmd_t)``: cmd_t is a ScenarioCommand pytree with a
    leading (n_periods,) axis that OVERRIDES ``cmd`` each period (teleop
    trajectories, mid-run gait switching via its gait_offsets/durations),
    and mode_cmd_t is a (n_periods,) int32 of user mode commands
    (MODE_CMD_NONE = keep; C.MODE_PASSIVE / C.MODE_WALKING = the
    FSM transitions of FSM.cpp:37-54).

    estimator: static estimator kind driving the controller
    (hector/estimation.py; default = the reference's cheater configuration).
    noise: the sensor noise model for non-cheater estimators; pass the
    SAME model to init_controller_carry (which draws the per-lane true
    gyro bias from it) so the sensor model is consistent end to end.
    """

    def rollout(carry, plant, cmd, disturbance=None, schedule=None):
        def body(state, xs):
            dist, percmd, mode_cmd = xs
            cmd_t = percmd if with_schedule else cmd
            terrain = (cmd_t.terrain_step_height, cmd_t.terrain_step_length)
            (c0, p0) = state
            c, p = c0, p0
            if with_schedule:
                c = apply_mode_command(c, p, mode_cmd, cfg,
                                       estimator=estimator)
            diag0 = None
            for k in range(cfg.mpc.mpc_cadence):
                c, motor_cmd, wrench, stance, diag = controller_tick(
                    c, p, cmd_t, do_mpc=(k == 0), cfg=cfg,
                    estimator=estimator, noise=noise)
                if k == 0:
                    # GRF/contact telemetry channel (the analog of the
                    # foot_contact_plugin wrench topics,
                    # unitree_gazebo/plugin/foot_contact_plugin.cc:45-80):
                    # per-period world wrench (2,6) + contact state (2,)
                    diag0 = {**diag, "wrench": wrench,
                             "contact": stance}
                p = srb.step(p, motor_cmd, wrench, stance,
                             disturbance=dist, terrain=terrain, cfg=cfg)
            # NaN quarantine (SURVEY.md §5 failure-detection plan): if this
            # period drove the lane non-finite, freeze it at its last finite
            # state and flip it passive so batch reductions stay clean and
            # the other lanes are unaffected.
            healthy = (jnp.isfinite(p.position).all()
                       & jnp.isfinite(p.v_world).all()
                       & jnp.isfinite(p.quat).all()
                       & jnp.isfinite(p.q).all())
            p = jax.tree.map(lambda new, old: jnp.where(healthy, new, old),
                             p, p0)
            mode = jnp.where(healthy, c.mode,
                             jnp.asarray(C.MODE_PASSIVE, c.mode.dtype))
            c = jax.tree.map(lambda new, old: jnp.where(healthy, new, old),
                             c, c0)._replace(mode=mode, tick=c.tick)
            diag0 = {**diag0,
                     "mode": mode,
                     "fallen": diag0["fallen"] | ~healthy,
                     "quarantined": ~healthy}
            return (c, p), diag0

        sched = schedule if schedule is not None else (None, None)
        (carry, plant), diags = jax.lax.scan(
            body, (carry, plant), (disturbance, sched[0], sched[1]),
            length=n_periods)
        return carry, plant, diags

    if with_disturbance and with_schedule:
        fn = rollout
    elif with_disturbance:
        fn = lambda carry, plant, cmd, disturbance: rollout(
            carry, plant, cmd, disturbance, None)
    elif with_schedule:
        fn = lambda carry, plant, cmd, schedule: rollout(
            carry, plant, cmd, None, schedule)
    else:
        fn = lambda carry, plant, cmd: rollout(carry, plant, cmd, None, None)
    if batched:
        fn = jax.vmap(fn)
    out = jax.jit(fn)

    def init(plant, key=None):
        """init_controller_carry bound to THIS rollout's cfg/noise -- the
        single surface that keeps the per-lane true-bias draw and the
        per-tick noise stream on the same SensorNoise model (vmap over a
        batched plant/key yourself when batched=True)."""
        return init_controller_carry(plant, cfg, key=key, noise=noise)

    out.init = init
    return out


def whole_body_observation(p) -> srb.PlantState:
    """Honest controller/estimator observation of the articulated plant:
    per-leg contact flags come from the plant's own stick state (any of the
    leg's toe-box corner points in ground contact -- the batched analog of
    the foot_contact_plugin's ContactSensor,
    unitree_gazebo/plugin/foot_contact_plugin.cc:45-80) and foot_anchor is
    the mean world position of the leg's contact points.  No fabricated
    zeros: the contact-aided KF runs on the articulated plant from these
    channels alone."""
    from .plant import whole_body as WB

    pts = WB.foot_positions(p)                       # (2, 4, 3) world
    contact = p.sticking[:WB.N_TOE].reshape(2, -1).any(axis=-1)
    return srb.PlantState(
        position=p.position, quat=p.quat, v_world=p.v_world,
        omega_world=p.omega_world, q=p.q, qd=p.qd,
        foot_anchor=pts.mean(axis=1), contact=contact)


def make_rollout_whole_body(n_periods: int,
                            cfg: HectorConfig = DEFAULT_CONFIG,
                            batched: bool = False,
                            with_disturbance: bool = False,
                            estimator: str = 'cheater',
                            with_schedule: bool = False,
                            ccfg=None, n_substeps: int = 4,
                            noise: 'EST.SensorNoise' = EST.SensorNoise()):
    """Tier-2 rollout: same controller, full articulated plant
    (hector/plant/whole_body.py).  The controller consumes the plant state
    through the same observation fields; contact is emergent from the
    penalty model rather than gait-scheduled, and ONLY the joint torques
    act -- no commanded-wrench shortcut.

    First-class harness: same signature surface as make_rollout --
    ``estimator`` selects the estimator kind driving the controller (the
    contact-aided KF consumes the plant's own stick state, see
    whole_body_observation), ``with_disturbance`` adds the per-period
    (6,) world-wrench push input, ``with_schedule`` adds the per-period
    (cmd_t, mode_cmd_t) command/mode schedule, and non-finite lanes are
    quarantined exactly as on tier-1.

    ccfg / n_substeps: contact-model parameters (ContactConfig) and
    integrator substep count, forwarded to WB.step -- the contact
    sensitivity-study surface (defaults = the Gazebo-level production
    model).
    """
    from .plant import whole_body as WB
    if ccfg is None:
        ccfg = WB.ContactConfig()

    def rollout(carry, plant: WB.WholeBodyState, cmd, disturbance=None,
                schedule=None):
        def body(state, xs):
            dist, percmd, mode_cmd = xs
            cmd_t = percmd if with_schedule else cmd
            terrain = (cmd_t.terrain_step_height, cmd_t.terrain_step_length)
            c0, p0 = state
            c, p = c0, p0
            if with_schedule:
                c = apply_mode_command(c, whole_body_observation(p),
                                       mode_cmd, cfg, estimator=estimator)
            diag0 = None
            for k in range(cfg.mpc.mpc_cadence):
                obs = whole_body_observation(p)
                c, motor_cmd, wrench, stance, diag = controller_tick(
                    c, obs, cmd_t, do_mpc=(k == 0), cfg=cfg,
                    estimator=estimator, noise=noise,
                    est_ground_z=WB.FK_FOOT_CLEARANCE)
                if k == 0:
                    diag0 = {**diag, "wrench": wrench, "contact": stance}
                p = WB.step(p, motor_cmd, cfg=cfg, terrain=terrain,
                            disturbance=dist, ccfg=ccfg,
                            n_substeps=n_substeps)
            healthy = (jnp.isfinite(p.position).all()
                       & jnp.isfinite(p.v_world).all()
                       & jnp.isfinite(p.quat).all()
                       & jnp.isfinite(p.q).all())
            p = jax.tree.map(lambda new, old: jnp.where(healthy, new, old),
                             p, p0)
            mode = jnp.where(healthy, c.mode,
                             jnp.asarray(C.MODE_PASSIVE, c.mode.dtype))
            c = jax.tree.map(lambda new, old: jnp.where(healthy, new, old),
                             c, c0)._replace(mode=mode, tick=c.tick)
            diag0 = {**diag0, "mode": mode,
                     "fallen": diag0["fallen"] | ~healthy,
                     "quarantined": ~healthy}
            return (c, p), diag0

        sched = schedule if schedule is not None else (None, None)
        (carry, plant), diags = jax.lax.scan(
            body, (carry, plant), (disturbance, sched[0], sched[1]),
            length=n_periods)
        return carry, plant, diags

    if with_disturbance and with_schedule:
        fn = rollout
    elif with_disturbance:
        fn = lambda carry, plant, cmd, disturbance: rollout(
            carry, plant, cmd, disturbance, None)
    elif with_schedule:
        fn = lambda carry, plant, cmd, schedule: rollout(
            carry, plant, cmd, None, schedule)
    else:
        fn = lambda carry, plant, cmd: rollout(carry, plant, cmd, None, None)
    if batched:
        fn = jax.vmap(fn)
    out = jax.jit(fn)

    def init(plant_wb, key=None):
        """init_controller_carry from the tier-2 plant state through
        whole_body_observation, bound to THIS rollout's cfg/noise (the
        single noise surface; see make_rollout.init)."""
        return init_controller_carry(whole_body_observation(plant_wb), cfg,
                                     key=key, noise=noise)

    out.init = init
    return out


def plan_step_fn(cfg: HectorConfig = DEFAULT_CONFIG):
    """The benchmark unit: ONE full batched MPC planning step
    (FK -> gait -> reference -> QP build -> PDIP solve -> wrench), i.e.
    everything the reference does in updateMPCIfNeeded plus the kinematics
    it consumes.  vmap/jit applied by the caller."""

    def plan_step(carry: ControllerCarry, plant: srb.PlantState,
                  cmd: ScenarioCommand):
        new_carry, motor_cmd, wrench, stance, diag = controller_tick(
            carry, plant, cmd, do_mpc=True, cfg=cfg)
        return new_carry, wrench, motor_cmd

    return plan_step
