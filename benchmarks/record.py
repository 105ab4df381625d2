"""Record the full benchmark matrix on the current hardware into a JSON
artifact (VERDICT r1 weak-item 6 / next-round item 5).

    python -m benchmarks.record [out.json]

Runs, in order:
  - bench.py                      headline full-pipeline solves/s/chip
  - benchmarks.roofline           fused-kernel-only solves/s + roofline
  - BASELINE configs 1-5          (benchmarks/configs.py)
  - sharded closed-loop rollout with the PRODUCTION pallas backend at
    batch >= 8192 (parallel.make_sharded_rollout over the local mesh)

and writes one JSON document with hardware metadata.  Committed artifacts:
PERF.md (summary) + perf/PERF_r*.json (raw).
"""

from __future__ import annotations

import contextlib
import dataclasses
import io
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _capture_json_lines(fn, *args, **kw):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(*args, **kw)
    return [json.loads(line) for line in buf.getvalue().splitlines()
            if line.strip().startswith('{')]


def sharded_pallas_rollout(batch: int = 8192, n_periods: int = 5) -> dict:
    """Closed-loop sharded rollout with the fused Pallas QP kernel
    (production configuration) -- VERDICT item 2c."""
    from hector import parallel as PL
    from hector.config import DEFAULT_CONFIG

    backend = ('riccati_pallas' if jax.default_backend() != 'cpu'
               else 'riccati')
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        solver=dataclasses.replace(DEFAULT_CONFIG.solver, backend=backend))
    mesh = PL.data_mesh()
    carry, plant, cmd = PL.make_batch(batch, cfg=cfg, mesh=mesh)
    roll = PL.make_sharded_rollout(n_periods, mesh, cfg)

    c, p, metrics = roll(carry, plant, cmd)          # compile + run
    _sync = float(metrics['mean_height'])
    times = []
    for _ in range(3):
        # dependency-chain: feed the previous rollout's state back in so
        # dispatches are value-distinct (bench.py measurement discipline)
        carry, plant = c, p
        t0 = time.perf_counter()
        c, p, metrics = roll(carry, plant, cmd)
        _sync = float(metrics['mean_height'])        # device->host fetch
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    return dict(
        config='sharded_pallas_rollout', backend=backend, batch=batch,
        n_periods=n_periods, devices=int(mesh.devices.size),
        closed_loop_solves_per_s=batch * n_periods / dt,
        mean_height=_sync,
        fallen_count=float(metrics['fallen_count']))


def main(out_path: str | None = None):
    from benchmarks._cache import enable_cache
    enable_cache()
    import bench
    from benchmarks import roofline, latency
    from benchmarks.configs import CONFIGS

    doc = dict(
        backend=jax.default_backend(),
        devices=[str(d) for d in jax.devices()],
        results={})

    def guarded(key, fn, *args):
        try:
            doc['results'][key] = fn(*args)
        except Exception as e:          # record, don't abort the matrix
            doc['results'][key] = dict(error=repr(e)[:300])

    guarded('headline', lambda: _capture_json_lines(bench.main)[0])
    guarded('roofline', lambda: _capture_json_lines(roofline.main, 4096)[0])
    guarded('latency', latency.main)
    for k, fn in CONFIGS.items():
        guarded(f'config{k}', fn)
    guarded('sharded_pallas', sharded_pallas_rollout)

    text = json.dumps(doc, indent=2, default=float)
    if out_path:
        with open(out_path, 'w') as fh:
            fh.write(text + '\n')
        # refresh the per-part artifacts next to the combined document so
        # no stale/empty part file survives a recording run (ADVICE r2)
        import os
        parts = os.path.join(os.path.dirname(os.path.abspath(out_path)),
                             'parts')
        if os.path.isdir(parts):
            for key, val in doc['results'].items():
                name = {'headline': 'headline', 'roofline': 'roofline',
                        'latency': 'latency',
                        'sharded_pallas': 'sharded_pallas'}.get(key, key)
                with open(os.path.join(parts, f'{name}.json'), 'w') as fh:
                    fh.write(json.dumps(val, default=float) + '\n')
    print(text, flush=True)
    return doc


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else None)
