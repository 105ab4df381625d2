"""Command-line driver: the ``main.cpp`` + roslaunch replacement.

    python -m hector run --gait walking --vx 0.5 --seconds 3
    python -m hector run --world stairs --vx 0.4
    python -m hector batch --batch 4096 --seconds 2 --log out.jsonl
    python -m hector bench --batch 4096
    python -m hector teleop                  # interactive wasd/jl teleop
    python -m hector view --vx 0.5           # live ANSI sim view
    python -m hector replay traj.csv         # offline trajectory (TO state)

Commands come from flags, a scenario seed, or the interactive teleop
(hector/io/keyboard.py, the KeyBoard/CmdPanel equivalent); results go to
stdout/JSONL/PNG.
"""

from __future__ import annotations

import argparse
import json
import sys


def _cpu_backend(args):
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)


def _setup_scenario(args, n_periods=None, seconds=None):
    """Shared scenario setup for run/view/export-html: world config,
    command, plant state, controller carry, and the jitted rollout (srb
    or whole-body, per --plant/--estimator).  Pass either n_periods or
    seconds (converted with the WORLD-APPLIED config's period, so a
    preset changing mpc timing keeps durations correct).  The command
    carries the world's terrain ONLY for the walking gait (standing pins
    flat ground), so downstream consumers must read terrain from the
    COMMAND, not the world, to match what the plant actually
    simulated."""
    from . import runtime as RT
    from . import worlds
    from .plant import srb
    from .config import DEFAULT_CONFIG

    CFG, terrain = worlds.apply(args.world, DEFAULT_CONFIG)
    if n_periods is None:
        n_periods = int(seconds / (CFG.mpc.dt * CFG.mpc.mpc_cadence))
    cmd = (RT.standing_command() if args.gait == "standing"
           else RT.walking_command(vx=args.vx, vy=args.vy,
                                   yaw_rate=args.yaw_rate,
                                   step_height=terrain.step_height,
                                   step_length=terrain.step_length))
    if args.plant == "whole-body":
        from .plant import whole_body as WB
        plant = WB.init_whole_body_state(height=0.545)
        carry = RT.init_controller_carry(
            RT.whole_body_observation(plant), CFG)
        roll = RT.make_rollout_whole_body(n_periods, cfg=CFG,
                                          batched=False,
                                          estimator=args.estimator)
    else:
        plant = srb.init_plant_state(CFG)
        carry = RT.init_controller_carry(plant, CFG)
        roll = RT.make_rollout(n_periods, cfg=CFG, batched=False,
                               estimator=args.estimator)
    return CFG, cmd, plant, carry, roll


def cmd_run(args):
    _cpu_backend(args)
    from .io.metrics import summarize_rollout

    CFG, cmd, plant, carry, roll = _setup_scenario(
        args, seconds=args.seconds)
    carry, plant, diags = roll(carry, plant, cmd)
    summary = summarize_rollout(diags)
    summary["x_traveled"] = float(plant.position[0])
    print(json.dumps(summary, indent=2))
    if args.plot:
        from .io.viz import plot_tracking
        plot_tracking(diags, v_des=args.vx, path=args.plot)
        print(f"wrote {args.plot}")


def cmd_batch(args):
    _cpu_backend(args)
    import jax
    from . import parallel as PAR
    from . import runtime as RT
    from .io import scenarios as SC
    from .config import DEFAULT_CONFIG as CFG
    from .io.metrics import MetricsLogger

    mesh = PAR.data_mesh()
    key = jax.random.PRNGKey(args.seed)
    carry, plant, _ = PAR.make_batch(args.batch, cfg=CFG, mesh=mesh)
    cmd = PAR.shard_batch(SC.random_commands(key, args.batch), mesh)
    n_periods = int(args.seconds / (CFG.mpc.dt * CFG.mpc.mpc_cadence))
    roll = PAR.make_sharded_rollout(n_periods, mesh, CFG)
    carry, plant, metrics = roll(carry, plant, cmd)
    logger = MetricsLogger(args.log)
    rec = logger.log(0, metrics, batch=args.batch,
                     devices=len(mesh.devices.flat))
    print(json.dumps(rec, indent=2))
    if args.checkpoint:
        from .io import checkpoint as CKPT
        CKPT.save(args.checkpoint, n_periods, carry, plant, cmd)
        print(f"checkpointed to {args.checkpoint}")


def cmd_bench(args):
    _cpu_backend(args)
    import bench
    bench.main()


def cmd_teleop(args):
    """Interactive closed-loop teleop (the KeyBoard/CmdPanel experience):
    wasd/jl steer, space stops, q quits.  One MPC period (5 ms sim time)
    per loop iteration; --live renders the ANSI side-view each period
    (keyboard + live viewer together = the Gazebo-GUI experience),
    otherwise a one-line status ticker."""
    _cpu_backend(args)
    import numpy as np
    import jax
    from . import runtime as RT
    from . import math as hm
    from . import worlds
    from .plant import srb
    from .config import DEFAULT_CONFIG
    from .io import keyboard as KB
    from .io import live

    CFG, terrain = worlds.apply(args.world, DEFAULT_CONFIG)
    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG)
    roll = jax.jit(RT.make_rollout(1, cfg=CFG, batched=False))
    value = KB.UserValue()
    print("teleop: w/s=vx  j/l=vy  a/d=yaw  space=stop  q=quit")
    with KB.RawTerminal() as term:
        t = 0.0
        while True:
            key = term.poll_key(timeout=0.0)
            if key in ("q", "\x03"):
                break
            if key:
                value = KB.update_value(value, key)
            vx, vy, yaw_rate = KB.value_to_command(value)
            cmd = RT.walking_command(
                vx=vx, vy=vy, yaw_rate=yaw_rate,
                step_height=terrain.step_height,
                step_length=terrain.step_length)
            carry, plant, diags = roll(carry, plant, cmd)
            t += CFG.mpc.dt * CFG.mpc.mpc_cadence
            if args.live:
                hips_w, feet_w, contact = live.frame_geometry(plant, CFG)
                fz = np.asarray(diags["wrench"], float)[0, :, 2]
                frame = live.render_frame(
                    np.asarray(plant.position),
                    np.asarray(hm.quat_to_rpy(plant.quat)),
                    hips_w, feet_w, contact, fz, t,
                    f"cmd vx={vx:+5.2f} vy={vy:+5.2f} wz={yaw_rate:+5.2f}"
                    f"  (wasd/jl steer, q quits)",
                    step_height=float(terrain.step_height),
                    step_length=float(terrain.step_length))
                print(live.ANSI_HOME + frame, flush=True)
            else:
                p = plant.position
                print(f"\rt={t:7.2f}s  x={float(p[0]):+6.2f} "
                      f"y={float(p[1]):+6.2f} z={float(p[2]):5.2f}  "
                      f"cmd vx={vx:+5.2f} vy={vy:+5.2f} "
                      f"wz={yaw_rate:+5.2f}  ", end="", flush=True)
    print()


def cmd_view(args):
    """Live ANSI side-view of a running sim (the Gazebo-GUI/rviz analog,
    hector/io/live.py): one MPC period per frame, paced near real time;
    --plant whole-body watches the articulated physics."""
    _cpu_backend(args)
    import time as _time
    import numpy as np
    from . import runtime as RT
    from . import math as hm
    from .io import live

    CFG, cmd, plant, carry, roll = _setup_scenario(args, n_periods=1)
    period = CFG.mpc.dt * CFG.mpc.mpc_cadence
    n_frames = max(1, int(args.seconds / period))
    cmd_text = (f"cmd vx={args.vx:+.2f} vy={args.vy:+.2f} "
                f"wz={args.yaw_rate:+.2f}  world={args.world}")
    t = 0.0
    for k in range(n_frames):
        t0 = _time.perf_counter()
        carry, plant, diags = roll(carry, plant, cmd)
        t += period
        obs = (RT.whole_body_observation(plant)
               if args.plant == "whole-body" else plant)
        hips_w, feet_w, contact = live.frame_geometry(obs, CFG)
        fz = np.asarray(diags["wrench"], float)[0, :, 2]
        frame = live.render_frame(
            np.asarray(plant.position), np.asarray(
                hm.quat_to_rpy(plant.quat)),
            hips_w, feet_w, contact, fz, t, cmd_text,
            # draw the terrain the plant SIMULATED (the command's):
            # standing pins flat ground regardless of the world preset
            step_height=float(cmd.terrain_step_height),
            step_length=float(cmd.terrain_step_length))
        print(live.ANSI_HOME + frame, flush=True)
        if args.speed > 0:
            _time.sleep(max(0.0, period / args.speed
                            - (_time.perf_counter() - t0)))
    print()


def cmd_export_html(args):
    """Export an interactive self-contained 3D HTML viewer of a scenario
    rollout (the rviz/Gazebo-GUI analog, hector/io/html_viz.py): full
    skeleton -- trunk box, articulated leg chains, toe boxes -- one frame
    per MPC period, orbitable in any browser with no server."""
    _cpu_backend(args)
    import numpy as np
    from .io import html_viz

    CFG, cmd, plant, carry, roll = _setup_scenario(args, n_periods=1)
    period = CFG.mpc.dt * CFG.mpc.mpc_cadence
    n_frames = max(1, int(args.seconds / period))
    if args.plant == "whole-body":
        from .plant import whole_body as _WB
        get_contact = lambda p: np.asarray(
            p.sticking[:_WB.N_TOE]).reshape(2, -1).any(axis=-1)
    else:
        get_contact = lambda p: np.asarray(p.contact) > 0
    frames, contacts, forces = [], [], []
    for _ in range(n_frames):
        carry, plant, diags = roll(carry, plant, cmd)
        frames.append(html_viz.skeleton_points(
            plant.position, plant.quat, plant.q, CFG))
        contacts.append(get_contact(plant))
        # per-leg world GRF from the telemetry channel (wrench (1, 2, 6))
        forces.append(np.asarray(diags["wrench"], float)[0, :, 0:3])
    # terrain for the drawn grid comes from the COMMAND (what the plant
    # simulated), not the world preset: standing pins flat ground
    html_viz.export_html(
        np.stack(frames), np.stack(contacts), args.out, period,
        terrain=(float(cmd.terrain_step_height),
                 float(cmd.terrain_step_length)),
        forces=np.stack(forces),
        title=f"hector {args.plant} vx={args.vx} world={args.world}")
    print(json.dumps({"wrote": args.out, "frames": n_frames,
                      "seconds": n_frames * period}))


def cmd_replay(args):
    """Offline-trajectory playback (the FSMState_TO capability): load a CSV
    trajectory table; --closed-loop drives the full controller+plant from it
    and reports tracking errors, otherwise summarize the table."""
    _cpu_backend(args)
    import numpy as np
    from .io.trajectory import TrajectoryTable, closed_loop_replay

    table = TrajectoryTable.from_csv(args.csv)
    if args.closed_loop:
        report, diags = closed_loop_replay(table, seconds=args.seconds)
        print(json.dumps(report, indent=2))
        if args.plot:
            from .io.viz import plot_tracking
            plot_tracking(diags, path=args.plot)
            print(f"wrote {args.plot}")
        return
    times = np.asarray(table.times)
    states = np.asarray(table.state_at(table.times))
    print(json.dumps({
        "rows": int(times.shape[0]),
        "t_span": [float(times[0]), float(times[-1])],
        "state_dim": int(states.shape[1]),
        "first_state": [round(float(v), 6) for v in states[0]],
        "final_state": [round(float(v), 6) for v in states[-1]],
    }, indent=2))


def main(argv=None):
    p = argparse.ArgumentParser(prog="hector")
    p.add_argument("--platform", default=None,
                   help="force jax platform (e.g. cpu)")
    sub = p.add_subparsers(dest="command", required=True)

    r = sub.add_parser("run", help="single-scenario closed-loop sim")
    r.add_argument("--gait", choices=["standing", "walking"],
                   default="walking")
    r.add_argument("--vx", type=float, default=0.5)
    r.add_argument("--vy", type=float, default=0.0)
    r.add_argument("--yaw-rate", type=float, default=0.0)
    r.add_argument("--seconds", type=float, default=3.0)
    r.add_argument("--world", default="normal",
                   help="world preset (hector/worlds.py): normal, earth, "
                        "space, stairs, ...")
    r.add_argument("--plant", choices=["srb", "whole-body"], default="srb",
                   help="tier-1 SRB plant or tier-2 articulated physics")
    r.add_argument("--estimator", choices=["cheater", "filtered", "kf"],
                   default="cheater",
                   help="estimator driving the controller "
                        "(hector/estimation.py)")
    r.add_argument("--plot", default=None, help="write tracking PNG")
    r.set_defaults(fn=cmd_run)

    t = sub.add_parser("teleop", help="interactive keyboard teleop")
    t.add_argument("--world", default="normal")
    t.add_argument("--live", action="store_true",
                   help="render the live ANSI side-view each period")
    t.set_defaults(fn=cmd_teleop)

    v = sub.add_parser("view", help="live ANSI view of a running sim")
    v.add_argument("--gait", choices=["standing", "walking"],
                   default="walking")
    v.add_argument("--vx", type=float, default=0.5)
    v.add_argument("--vy", type=float, default=0.0)
    v.add_argument("--yaw-rate", type=float, default=0.0)
    v.add_argument("--seconds", type=float, default=5.0)
    v.add_argument("--world", default="normal")
    v.add_argument("--plant", choices=["srb", "whole-body"], default="srb")
    v.add_argument("--estimator", choices=["cheater", "filtered", "kf"],
                   default="cheater")
    v.add_argument("--speed", type=float, default=1.0,
                   help="playback speed multiple of real time; 0 = "
                        "as fast as the rollout runs")
    v.set_defaults(fn=cmd_view)

    x = sub.add_parser("export-html",
                       help="write a self-contained 3D HTML viewer")
    x.add_argument("out", help="output .html path")
    x.add_argument("--gait", choices=["standing", "walking"],
                   default="walking")
    x.add_argument("--vx", type=float, default=0.5)
    x.add_argument("--vy", type=float, default=0.0)
    x.add_argument("--yaw-rate", type=float, default=0.0)
    x.add_argument("--seconds", type=float, default=3.0)
    x.add_argument("--world", default="normal")
    x.add_argument("--plant", choices=["srb", "whole-body"], default="srb")
    x.add_argument("--estimator", choices=["cheater", "filtered", "kf"],
                   default="cheater")
    x.set_defaults(fn=cmd_export_html)

    rp = sub.add_parser("replay", help="offline trajectory playback (TO)")
    rp.add_argument("csv", help="trajectory CSV (time + 12-dim state + ...)")
    rp.add_argument("--closed-loop", action="store_true",
                    help="drive the controller+plant from the table and "
                         "report tracking errors")
    rp.add_argument("--seconds", type=float, default=None,
                    help="override replay duration")
    rp.add_argument("--plot", default=None, help="write tracking PNG")
    rp.set_defaults(fn=cmd_replay)

    b = sub.add_parser("batch", help="batched randomized scenarios")
    b.add_argument("--batch", type=int, default=1024)
    b.add_argument("--seconds", type=float, default=1.0)
    b.add_argument("--seed", type=int, default=0)
    b.add_argument("--log", default=None, help="JSONL metrics path")
    b.add_argument("--checkpoint", default=None, help="orbax dir")
    b.set_defaults(fn=cmd_batch)

    be = sub.add_parser("bench", help="headline solves/s benchmark")
    be.add_argument("--batch", type=int, default=4096)
    be.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
