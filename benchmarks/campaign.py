"""BASELINE config 5 at its stated scale on the hardware that exists:
a 256k-scenario closed-loop campaign on one chip, streamed as waves.

VERDICT r4 item 5: the 256k-scenario configuration targets N>=2 hosts;
this campaign runs the SAME total scenario count on a single chip by
streaming ``waves`` waves of ``batch`` scenarios each through the host
pipeline (hector/io/host_pipeline.py: native splitmix64 generation +
double-buffered device_put), with

  - a closed-loop rollout of ``periods`` MPC periods per wave,
  - an orbax checkpoint after wave ``checkpoint_after`` and a REAL
    mid-campaign resume (state restored from disk into fresh buffers,
    continuing the remaining waves),
  - a metrics JSONL artifact (hector/io/metrics.py) with per-wave health
    counters (fallen / quarantined lanes),

so every ingredient the multi-host config needs -- deterministic sharded
scenario regeneration, checkpoint/resume, streaming metrics -- is
demonstrated end-to-end at the full scenario count.

    python -m benchmarks.campaign [--batch 32768] [--waves 8]
        [--periods 50] [--out perf/parts/config5_256k.json]

Prints one JSON object (also written to --out).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_campaign(batch: int = 32768, waves: int = 8, periods: int = 50,
                 checkpoint_after: int = 4, out: str | None = None,
                 jsonl: str | None = None) -> dict:
    from hector import runtime as RT, parallel as PAR
    from hector.io import host_pipeline as HP, checkpoint as CK
    from hector.io.metrics import MetricsLogger
    from hector.config import DEFAULT_CONFIG as CFG

    roll = RT.make_rollout(periods, cfg=CFG, batched=True)
    ckpt_dir = tempfile.mkdtemp(prefix="hector_campaign_")
    logger = MetricsLogger(jsonl)
    stream = HP.ScenarioStream(batch=batch, seed=11, p_standing=0.1,
                               p_stairs=0.2)

    def fresh_state():
        carry, plant, _ = PAR.make_batch(batch, cfg=CFG)
        return carry, plant

    carry, plant = fresh_state()
    wave_rows = []
    total_solves = 0
    resume_record = None
    t_start = time.perf_counter()
    wave = 0
    while wave < waves:
        cmd = next(stream)
        t0 = time.perf_counter()
        carry, plant, diags = roll(carry, plant, cmd)
        fallen = int(np.asarray(diags["fallen"][:, -1]).sum())
        quarantined = int(np.asarray(diags["quarantined"]).any(axis=1).sum())
        dt = time.perf_counter() - t0           # fetch above synced
        solves = batch * periods
        total_solves += solves
        row = dict(wave=wave, batch=batch, periods=periods,
                   wall_s=round(dt, 3),
                   solves_per_s=round(solves / dt, 1),
                   fallen_lanes=fallen, quarantined_lanes=quarantined)
        wave_rows.append(row)
        logger.log(wave, row)
        if wave + 1 == checkpoint_after:
            CK.save(ckpt_dir, wave + 1, carry, plant, cmd)
            # REAL resume: rebuild fresh (zero) state buffers, restore
            # from disk, and continue the campaign from the restored state
            carry, plant = fresh_state()
            step, restored = CK.restore(ckpt_dir, (carry, plant, cmd))
            carry, plant = restored["carry"], restored["plant"]
            resume_record = dict(checkpoint_step=int(step),
                                 resumed_at_wave=wave + 1,
                                 ckpt_dir=ckpt_dir)
        wave += 1
    wall = time.perf_counter() - t_start
    stream.close()
    logger.close()

    rep = dict(
        config="config5_256k_campaign",
        backend=jax.default_backend(),
        devices=jax.local_device_count(),
        batch=batch, waves=waves, periods=periods,
        total_scenarios=batch * waves,
        total_solves=total_solves,
        wall_s=round(wall, 2),
        sustained_solves_per_s=round(total_solves / wall, 1),
        fallen_lanes_total=sum(r["fallen_lanes"] for r in wave_rows),
        quarantined_lanes_total=sum(r["quarantined_lanes"]
                                    for r in wave_rows),
        resume=resume_record,
        waves_detail=wave_rows)
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            json.dump(rep, f, indent=1)
    print(json.dumps(rep), flush=True)
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--periods", type=int, default=50)
    ap.add_argument("--checkpoint-after", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--jsonl", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # after the platform choice: enable_cache() initializes backends
    from benchmarks._cache import enable_cache
    enable_cache()
    run_campaign(batch=args.batch, waves=args.waves, periods=args.periods,
                 checkpoint_after=args.checkpoint_after, out=args.out,
                 jsonl=args.jsonl)


if __name__ == "__main__":
    main()
