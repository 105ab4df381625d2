"""Command-line driver: the ``main.cpp`` + roslaunch replacement.

    python -m hector run --gait walking --vx 0.5 --seconds 3
    python -m hector batch --batch 4096 --seconds 2 --log out.jsonl
    python -m hector bench --batch 4096

Instead of the reference's interactive keyboard teleop, commands come from
flags or a scenario seed; results go to stdout/JSONL/PNG.
"""

from __future__ import annotations

import argparse
import json
import sys


def _cpu_backend(args):
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)


def cmd_run(args):
    _cpu_backend(args)
    import numpy as np
    from . import runtime as RT
    from .plant import srb
    from .config import DEFAULT_CONFIG as CFG
    from .io.metrics import summarize_rollout

    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG)
    cmd = (RT.standing_command() if args.gait == "standing"
           else RT.walking_command(vx=args.vx, vy=args.vy,
                                   yaw_rate=args.yaw_rate))
    n_periods = int(args.seconds / (CFG.mpc.dt * CFG.mpc.mpc_cadence))
    roll = RT.make_rollout(n_periods, cfg=CFG, batched=False)
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
    r.add_argument("--plot", default=None, help="write tracking PNG")
    r.set_defaults(fn=cmd_run)

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
