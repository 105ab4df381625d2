"""2-process DCN scaling artifact (VERDICT r3 item 5).

Extends tests/test_multihost.py's harness into a recorded benchmark: the
SAME sharded closed-loop rollout (hector.parallel.make_sharded_rollout --
per-device scenario shards, psum metric reductions) run at a fixed
per-device batch on

  - 1 process x 2 virtual CPU devices  (single-host baseline), and
  - 2 processes x 2 virtual CPU devices (global mesh of 4; the collective
    crosses the process boundary -- the DCN path on real multi-host TPU).

CAVEAT, recorded in the artifact: this host has 2 physical CPUs, so every
row timeshares all virtual devices over the same 2 cores -- absolute
per-device throughput is NOT meaningful across rows (the 2-process row
runs 2x the scenarios on the same silicon).  What the artifact demonstrates
is that the multi-process global-mesh path (jax.distributed + shard_map +
cross-process psum) compiles, runs the production rollout, and produces
the correct global metrics.  TOTAL throughput staying roughly flat while
the scenario count doubles is the expected signature of core-bound timing.

    python -m benchmarks.multihost_scaling [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import json, sys, time
import numpy as np
sys.path.insert(0, sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from hector import parallel as PL
from hector.config import DEFAULT_CONFIG as CFG

pid = int(sys.argv[2]); nproc = int(sys.argv[3]); port = sys.argv[4]
pdb = int(sys.argv[5]); n_periods = int(sys.argv[6])

if nproc > 1:
    mesh = PL.multihost(coordinator=f"127.0.0.1:{port}",
                        num_processes=nproc, process_id=pid)
else:
    mesh = PL.data_mesh()
ndev = int(np.prod(mesh.devices.shape))
batch = pdb * ndev
carry, plant, cmd = PL.make_batch(batch, cfg=CFG, mesh=mesh)
roll = PL.make_sharded_rollout(n_periods, mesh, CFG)

# compile + warm run (excluded); the metric fetch is the sync point
c, p, m = roll(carry, plant, cmd)
_ = float(np.asarray(m["mean_height"]))

times = []
for rep in range(3):
    t0 = time.perf_counter()
    c, p, m = roll(c, p, cmd)
    val = float(np.asarray(m["mean_height"]))
    times.append(time.perf_counter() - t0)
dt = sorted(times)[1]
solves = batch * n_periods
if pid == 0:
    print("ROW " + json.dumps(dict(
        processes=nproc, global_devices=ndev, per_device_batch=pdb,
        global_batch=batch, n_periods=n_periods,
        closed_loop_solves_per_s=round(solves / dt, 1),
        mean_height=round(val, 4),
        fallen=float(np.asarray(m["fallen_count"])))), flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_row(nproc: int, pdb: int, n_periods: int, timeout: int = 1200):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, REPO, str(pid), str(nproc),
         str(port), str(pdb), str(n_periods)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(nproc)]
    outs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"worker {pid} failed:\n{out}")
    for out in outs:
        for line in out.splitlines():
            if line.startswith("ROW "):
                return json.loads(line[4:])
    raise RuntimeError(f"no ROW emitted:\n{outs}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=256)
    ap.add_argument("--periods", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = []
    for nproc in (1, 2):
        row = run_row(nproc, args.per_device_batch, args.periods)
        rows.append(row)
        print(json.dumps(row), flush=True)

    doc = dict(
        purpose="multi-process (DCN-path) sharded-rollout scaling artifact",
        caveat="2 physical host CPUs timeshare ALL virtual devices: rows "
               "are not absolute-throughput comparable; the artifact "
               "demonstrates the cross-process global-mesh path running "
               "the production rollout with correct global metrics",
        rows=rows)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
