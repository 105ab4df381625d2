"""Headline benchmark: batched MPC solves/s on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The unit of work is one full MPC planning step per scenario (FK + Jacobians,
gait table, reference trajectory, QP assembly, fixed-iteration interior-point
solve, wrench extraction + torque map) -- everything the reference does per
updateMPCIfNeeded (ConvexMPCLocomotion.cpp:274-441) including the qpOASES
solve it wraps.

Measurement discipline (hard-won on the tunneled TPU runtime):

- ``jax.block_until_ready`` can return before execution completes and the
  runtime memoizes repeat executions, so naive repeat-timing overstates
  throughput by orders of magnitude.  Synchronization here is a real
  device->host VALUE FETCH of a scalar reduction of the results -- the value
  cannot exist before the computation ran.  (Calibrated: a known-FLOPs bf16
  matmul chain measures 160 TFLOP/s on v5e with fetch sync, vs physically
  impossible numbers with block_until_ready.)
- Each dispatch folds a fresh PRNG key into the plant state so repeat
  dispatches are value-distinct, and K solve steps are CHAINED inside one
  jitted scan (each step's state depends on the previous step's QP solution)
  so nothing can be hoisted, cached, or overlapped.

Baseline: BASELINE.json targets >= 100k solves/s on a v5e-16, i.e. 6250
solves/s/chip.  vs_baseline = measured solves/s/chip / 6250.
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from hector import runtime as RT
    from hector.plant import srb
    from hector.config import DEFAULT_CONFIG as CFG

    try:
        from benchmarks._cache import enable_cache
        enable_cache()
    except Exception:
        pass

    # 32768 is the measured near-saturation point of the v5e chip for the
    # full pipeline (677k @ 4096 -> 952k @ 8192 -> 1.19M @ 16384 ->
    # 1.34M @ 32768 -> +2.7% at 65536); the throughput-vs-batch curve is
    # recorded in perf/parts/config5.json and the latency-constrained
    # operating points in perf/parts/latency.json.
    batch = 32768
    # chain 128 keeps the tunneled-dispatch floor below ~5% of the
    # measurement even on a degraded (~200 ms) tunnel session: the floor
    # has been observed anywhere from ~25 ms to ~215 ms between sessions
    # (perf/parts/latency.json dispatch_overhead_spread_ms), and at
    # chain 8 a 137 ms floor adds ~520 ns to a ~650 ns device solve.
    # Compile time is scan-length independent; one dispatch is ~2-3 s of
    # device work, the same amortization serving mode uses.
    chain_len = 128
    n_devices = jax.local_device_count()

    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG)
    cmd = RT.walking_command(vx=0.5)
    tile = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
    plant = jax.tree.map(tile, plant)
    carry = jax.tree.map(tile, carry)
    cmd = jax.tree.map(tile, cmd)

    plan = RT.plan_step_fn(CFG)

    @jax.jit
    def chained_steps(key, carry, plant, cmd):
        noise = 1e-6 * jax.random.uniform(key, plant.position.shape,
                                          plant.position.dtype)
        plant = plant._replace(position=plant.position + noise)

        def body(state, _):
            c, p = state
            c, wrench, _motor = jax.vmap(plan)(c, p, cmd)
            # chain: next state depends on this step's QP solution
            p = p._replace(position=p.position + 1e-9 * wrench[:, 0, :3])
            return (c, p), None

        (c, p), _ = jax.lax.scan(body, (carry, plant), None,
                                 length=chain_len)
        return jnp.sum(p.position) + jnp.sum(c.planner.f_ff)

    # compile + first run (excluded)
    _ = np.asarray(chained_steps(jax.random.PRNGKey(99), carry, plant, cmd))

    times = []
    for rep in range(3):
        key = jax.random.PRNGKey(rep)
        t0 = time.perf_counter()
        _ = float(np.asarray(chained_steps(key, carry, plant, cmd)))
        times.append(time.perf_counter() - t0)

    dt = statistics.median(times) / chain_len
    per_chip = batch / dt / max(n_devices, 1)
    print(json.dumps({
        "metric": "batched_mpc_solves_per_s_per_chip",
        "value": round(per_chip, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(per_chip / 6250.0, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
