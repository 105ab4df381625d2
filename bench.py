"""Headline benchmark: batched MPC solves/s on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The unit of work is one full MPC planning step per scenario (FK + Jacobians,
gait table, reference trajectory, QP assembly, fixed-iteration PDIP solve,
wrench extraction + torque map) -- everything the reference does per
updateMPCIfNeeded (ConvexMPCLocomotion.cpp:274-441) including the qpOASES
solve it wraps.

Baseline: BASELINE.json targets >= 100k solves/s on a v5e-16, i.e. 6250
solves/s/chip.  vs_baseline = measured solves/s/chip / 6250.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from hector import runtime as RT
    from hector.plant import srb
    from hector.config import DEFAULT_CONFIG as CFG

    batch = 4096
    n_devices = jax.local_device_count()

    plant = srb.init_plant_state(CFG)
    carry = RT.init_controller_carry(plant, CFG)
    cmd = RT.walking_command(vx=0.5)
    tile = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
    plant = jax.tree.map(tile, plant)
    carry = jax.tree.map(tile, carry)
    cmd = jax.tree.map(tile, cmd)

    plan = RT.plan_step_fn(CFG)
    step = jax.jit(jax.vmap(plan))

    # warmup / compile
    out = step(carry, plant, cmd)
    jax.block_until_ready(out[1])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(carry, plant, cmd)
    jax.block_until_ready(out[1])
    dt = time.perf_counter() - t0

    solves_per_s = batch * iters / dt
    per_chip = solves_per_s / n_devices
    print(json.dumps({
        "metric": "batched_mpc_solves_per_s_per_chip",
        "value": round(per_chip, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(per_chip / 6250.0, 3),
    }))


if __name__ == "__main__":
    main()
