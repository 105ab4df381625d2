"""Where does the plan-step time go?  Per-stage split of the batched MPC
planning pipeline, timed with the bench.py discipline (chained scans inside
one dispatch, value-fetch sync).

Stages (each timed as K chained invocations inside one jitted scan, at the
same batch):

  jacobians   leg_jacobians + foot_position (FK)
  gait        phase/contact/swing subphases + mpc gait table
  reference   build_reference_trajectory
  build       build_stage_qp (constraint/bound/cost assembly)
  solve       the production QP solver alone (pallas kernel on TPU)
  swing       swing_update + swing_joint_setpoints (incl. IK)
  plan        the full plan step (everything above + wrench/torque map)

    python -m benchmarks.pipeline_split [batch]

Prints one JSON object with per-stage microseconds/solve and the residual
(plan minus the sum of measured parts: dispatch glue + estimator +
masking/dispatch logic).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _chain_time(make_body, batch: int, chain_len: int = 64, reps: int = 3):
    """Median seconds per invocation of body, measured as chain_len
    dependency-chained calls inside one jitted scan."""

    body, carrier0 = make_body()

    @jax.jit
    def chained(key, carrier):
        noise = 1e-9 * jax.random.uniform(key, ())
        carrier = jax.tree.map(
            lambda x: x + noise if jnp.issubdtype(x.dtype, jnp.floating)
            else x, carrier)

        def step(c, _):
            return body(c), None

        c, _ = jax.lax.scan(step, carrier, None, length=chain_len)
        # sum EVERY float leaf: fetching a single leaf would let XLA
        # dead-code-eliminate any computation not feeding it (measured:
        # the whole QP solve disappears and "plan" beats the kernel alone)
        return sum(jnp.sum(x) for x in jax.tree.leaves(c)
                   if jnp.issubdtype(x.dtype, jnp.floating))

    _ = float(np.asarray(chained(jax.random.PRNGKey(99), carrier0)))
    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(chained(jax.random.PRNGKey(rep), carrier0)))
        times.append(time.perf_counter() - t0)
    return statistics.median(times) / chain_len


def main(batch: int = 4096):
    from benchmarks._cache import enable_cache
    enable_cache()
    from hector import runtime as RT, control as C, mpc as M, gait as G
    from hector import swing as SW
    from hector.kinematics import foot_position, leg_jacobians, foot_rotation
    from hector.qp.builder import build_stage_qp
    from hector.config import DEFAULT_CONFIG as CFG, JOINT_OFFSETS
    from hector.plant import srb
    from benchmarks.roofline import nominal_problem

    plant1 = srb.init_plant_state(CFG)
    carry1 = RT.init_controller_carry(plant1, CFG)
    cmd1 = RT.walking_command(vx=0.5)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), t)
    plant, carry, cmd = tile(plant1), tile(carry1), tile(cmd1)
    dtype = plant1.position.dtype
    offsets = jnp.asarray(JOINT_OFFSETS, dtype)

    results = {}

    # --- jacobians + FK ---
    def mk_jac():
        q = plant.q

        def body(q):
            j_fm, j_f = jax.vmap(lambda q_: leg_jacobians(q_, CFG))(q)
            p = jax.vmap(lambda q_: foot_position(q_, CFG))(q)
            # consume EVERY output or XLA dead-code-eliminates the rest
            s = (j_fm.sum((1, 2, 3)) + j_f.sum((1, 2, 3)) + p.sum((1, 2)))
            return q + 1e-12 * s[:, None, None]

        return body, q
    results['jacobians'] = _chain_time(mk_jac, batch)

    # --- gait math ---
    def mk_gait():
        tick = jnp.zeros((batch,), jnp.int32)

        def body(tick):
            def one(t, off, dur):
                it, ph = G.phase_state(t, CFG.mpc.iterations_between_mpc, 10)
                cs = G.contact_subphase(ph.astype(dtype), off, dur, 10)
                ss = G.swing_subphase(ph.astype(dtype), off, dur, 10)
                gt = G.mpc_gait_table(it, off, dur, 10).astype(dtype)
                return t + 1 + (cs.sum() + ss.sum() + gt.sum()
                                ).astype(jnp.int32) * 0

            return jax.vmap(one)(tick, cmd.gait_offsets, cmd.gait_durations)

        return body, tick
    results['gait'] = _chain_time(mk_gait, batch)

    # --- reference trajectory ---
    def mk_ref():
        est = jax.vmap(C.estimate_state)(plant.position, plant.v_world,
                                         plant.quat, plant.omega_world)
        vdes = jnp.stack([cmd.vx, cmd.vy, jnp.zeros_like(cmd.vx)], -1)
        x = plant.position

        def body(x):
            def one(e, v, xx):
                return M.build_reference_trajectory(
                    e, v, jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),
                    jnp.asarray(0.0, dtype), xx[:2], CFG)
            traj = jax.vmap(one)(est, vdes, x)
            return x + 1e-12 * traj.sum((1, 2))[:, None]

        return body, x
    results['reference'] = _chain_time(mk_ref, batch)

    # --- QP build (stage form) ---
    def mk_build():
        est = jax.vmap(C.estimate_state)(plant.position, plant.v_world,
                                         plant.quat, plant.omega_world)
        vdes = jnp.stack([cmd.vx, cmd.vy, jnp.zeros_like(cmd.vx)], -1)
        i_body = jnp.diag(jnp.asarray(CFG.robot.inertia_body, dtype))
        gait = G.mpc_gait_table(jnp.asarray(0, jnp.int32),
                                jnp.asarray([0., 5.], dtype),
                                jnp.asarray([5., 5.], dtype), 10).astype(dtype)

        def one(e, v):
            p_leg = foot_position(plant1.q, CFG)
            p_foot_w = M.foot_positions_world(e, p_leg, CFG)
            traj = M.build_reference_trajectory(
                e, v, jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),
                jnp.asarray(0.0, dtype), e.position[:2], CFG)
            x0 = jnp.concatenate([e.rpy, e.position, e.omega_world,
                                  e.v_world,
                                  jnp.asarray([CFG.mpc.gravity], dtype)])
            r_foot = foot_rotation(plant1.q + 3.0 * offsets)
            r_feet = p_foot_w - e.position[None, :]
            r_bw = jnp.swapaxes(e.r_body, -1, -2)
            return build_stage_qp(x0, traj, r_bw, r_foot, r_feet, i_body,
                                  gait, CFG.mpc)

        def body(x):
            est2 = est._replace(position=x)
            sqp = jax.vmap(one)(est2, vdes)
            # consume EVERY field of the built QP (else the constraint
            # assembly is dead code and the stage measures ~nothing)
            s = sum(l.reshape(batch, -1).sum(-1)
                    for l in jax.tree.leaves(sqp))
            return x + 1e-12 * s[:, None]

        return body, plant.position
    results['build'] = _chain_time(mk_build, batch)

    # --- solver alone (production backend) ---
    sqp, _ = nominal_problem(batch)
    on_tpu = jax.default_backend() != 'cpu'
    if on_tpu:
        from hector.qp import pallas_riccati
        solver = lambda s: pallas_riccati.solve_batched(
            s, CFG.solver, q_diag=tuple(CFG.mpc.weights) + (0.0,),
            r_diag=tuple(CFG.mpc.alpha))
    else:
        from hector.qp import riccati
        solver = lambda s: riccati.solve_batched(s, CFG.solver)

    def mk_solve():
        def body(s):
            sol = solver(s)
            return s._replace(
                x0=s.x0.at[..., 9:12].add(1e-9 * sol.u[..., :3]))
        return body, sqp
    results['solve'] = _chain_time(mk_solve, batch)

    # --- swing pipeline ---
    def mk_swing():
        est = jax.vmap(C.estimate_state)(plant.position, plant.v_world,
                                         plant.quat, plant.omega_world)
        vdes = jnp.stack([cmd.vx, cmd.vy, jnp.zeros_like(cmd.vx)], -1)

        def one(sw_state, e, v, q):
            p_leg = foot_position(q, CFG)
            ss, p_foot_b, in_swing = SW.swing_update(
                sw_state, e, p_leg, v, jnp.asarray([0.3, 0.8], dtype),
                jnp.asarray(5.0, dtype), jnp.asarray(10.0, dtype), CFG)
            q_des, kp, kd = SW.swing_joint_setpoints(
                p_foot_b, q + jnp.asarray(JOINT_OFFSETS, dtype), in_swing,
                CFG)
            return ss, q_des

        def body(c):
            sw_state, q = c
            ss, q_des = jax.vmap(one)(sw_state, est, vdes, q)
            return (ss, q + 1e-12 * q_des)

        return body, (carry.swing, plant.q)
    results['swing'] = _chain_time(mk_swing, batch)

    # --- mpc_update composite (reference + build + solve + extraction) ---
    def mk_mpc_update():
        est = jax.vmap(C.estimate_state)(plant.position, plant.v_world,
                                         plant.quat, plant.omega_world)
        vdes = jnp.stack([cmd.vx, cmd.vy, jnp.zeros_like(cmd.vx)], -1)
        gait = G.mpc_gait_table(jnp.asarray(0, jnp.int32),
                                jnp.asarray([0., 5.], dtype),
                                jnp.asarray([5., 5.], dtype), 10).astype(dtype)

        def one(pl_state, e, v, q):
            p_leg = foot_position(q, CFG)
            p_foot_w = M.foot_positions_world(e, p_leg, CFG)
            return M.mpc_update(pl_state, e, q + offsets, p_foot_w, v,
                                jnp.asarray(0.0, dtype),
                                jnp.asarray(0.0, dtype),
                                jnp.asarray(0.0, dtype), gait, CFG)

        def body(c):
            pl_state, q = c
            pl2, wrench, _sol = jax.vmap(one)(pl_state, est, vdes, q)
            return (pl2, q + 1e-12 * wrench.sum((1, 2))[:, None, None])

        return body, (carry.planner, plant.q)
    results['mpc_update'] = _chain_time(mk_mpc_update, batch)

    # --- one controller tick WITHOUT the MPC solve (everything else) ---
    def mk_tick_nompc():
        def body(c):
            cr, pl = c
            cr2, motor, wrench, stance, diag = jax.vmap(
                lambda a, b, d: RT.controller_tick(a, b, d, do_mpc=False,
                                                   cfg=CFG))(cr, pl, cmd)
            pl = pl._replace(position=pl.position + 1e-12 * motor.tau.sum(
                (1, 2))[:, None])
            return (cr2, pl)

        return body, (carry, plant)
    results['tick_nompc'] = _chain_time(mk_tick_nompc, batch)

    # --- full plan step ---
    def mk_plan():
        plan = jax.vmap(RT.plan_step_fn(CFG))

        def body(c):
            cr, pl = c
            cr2, wrench, _motor = plan(cr, pl, cmd)
            pl = pl._replace(
                position=pl.position + 1e-9 * wrench[:, 0, :3])
            return (cr2, pl)

        return body, (carry, plant)
    results['plan'] = _chain_time(mk_plan, batch)

    per_solve_us = {k: round(1e6 * v / batch, 3) for k, v in results.items()}
    parts = sum(v for k, v in results.items()
                if k not in ('plan', 'mpc_update', 'tick_nompc'))
    rep = dict(config='pipeline_split', batch=batch,
               backend=jax.default_backend(),
               stage_us_per_solve=per_solve_us,
               residual_us_per_solve=round(
                   1e6 * (results['plan'] - parts) / batch, 3),
               plan_solves_per_s=round(batch / results['plan'], 1))
    print(json.dumps(rep), flush=True)
    return rep


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
