"""Measured single-chip peaks: VPU f32 FMA throughput and HBM bandwidth.

The roofline report (benchmarks/roofline.py) needs a MEASURED ceiling, not
the conventional 4 TFLOP/s estimate (VERDICT r3 weak-item 1): this module
calibrates the chip the same way bench.py calibrated the MXU -- known-work
kernels, dependency-chained value-unique dispatches, device->host value
fetch as the sync point.

- VPU f32 peak: a K-deep fused elementwise FMA chain over a large f32
  array.  Per element the chain is serial; across the array it saturates
  the 8x128 vector unit.  Arithmetic intensity = 2K flops / 8 bytes
  (K = 256 -> 64 flops/byte, far above the ~5 flops/byte compute/bandwidth
  crossover, so the measurement is compute-bound by construction).
- HBM bandwidth: y = x + 1 over a ~256 MB array (AI = 0.25 flops/byte,
  bandwidth-bound by construction); bytes = read + write.

    python -m benchmarks.vpu_peak

Prints one JSON object; measure() is importable by roofline.py.
"""

from __future__ import annotations

import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


_FLOOR = None


def _dispatch_floor() -> float:
    """Median wall time of a trivial dispatch + value fetch -- on the
    tunneled runtime this is a ~26 ms round-trip floor that must be
    subtracted from single-dispatch kernel timings (and the kernels below
    are sized to run 5-20x the floor so the subtraction is a small
    correction, not the measurement)."""
    global _FLOOR
    if _FLOOR is None:
        # one shared implementation of the floor sampler (the latency
        # report's paired-differencing uses the same _trivial probe)
        from benchmarks.latency import _trivial
        sample = _trivial()
        _FLOOR = statistics.median([sample() for _ in range(7)])
    return _FLOOR


def _time_fetch(fn, args, reps: int = 5):
    """Median wall time of fn(*args) synced by a device->host value fetch,
    minus the measured trivial-dispatch floor; each rep uses a
    value-unique input (fresh key folded in)."""
    floor = _dispatch_floor()
    _ = float(np.asarray(fn(jax.random.PRNGKey(99), *args)))  # compile
    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(jax.random.PRNGKey(rep), *args)))
        times.append(time.perf_counter() - t0)
    return max(statistics.median(times) - floor, 1e-9)


def measure_vpu_f32(n: int = 1 << 22, k: int = 256, outer: int = 64,
                    ilp: int = 8) -> dict:
    """Measured f32 elementwise-FMA throughput (TFLOP/s).

    ``ilp`` independent chains are interleaved in the loop body so the
    measurement is issue-rate-bound, not FMA-latency-bound (a single
    dependent chain measures pipeline latency, not peak).  The input is
    generated OUTSIDE the timed dispatch (value-uniqueness comes from a
    cheap key-derived scalar perturbation)."""

    x0s = [jax.random.uniform(jax.random.PRNGKey(1000 + i), (n,),
                              jnp.float32) for i in range(ilp)]

    @jax.jit
    def fma_chain(key, xs, a, b):
        eps = (jax.random.uniform(key, (), jnp.float32) - 0.5) * 1e-6
        xs = [x + eps for x in xs]

        def body(xs, _):
            for _i in range(k):
                xs = [x * a + b for x in xs]
            return xs, None

        xs, _ = jax.lax.scan(body, xs, None, length=outer)
        return sum(jnp.sum(x) for x in xs)

    a = jnp.float32(0.999993)
    b = jnp.float32(1e-7)
    dt = _time_fetch(fma_chain, (x0s, a, b))
    flops = 2.0 * n * ilp * k * outer
    return dict(vpu_f32_tflops=flops / dt / 1e12,
                fma_chain_depth=k * outer, elements=n * ilp, ilp=ilp)


def measure_vpu_div(n: int = 1 << 24, k: int = 64, outer: int = 16) -> dict:
    """Measured f32 elementwise DIVIDE throughput (Gop/s) -- divides and
    rsqrts run on the VPU's slow path, so the interior-point kernel's
    op mix (Cholesky rsqrt/div, barrier-weight divides, step-size
    ratios) buys fewer ops/s than its FMA count suggests.  This number
    anchors that part of the cycle accounting."""

    ilp = 8
    x0s = [jax.random.uniform(jax.random.PRNGKey(2000 + i), (n,),
                              jnp.float32) + jnp.float32(1.0)
           for i in range(ilp)]

    @jax.jit
    def div_chain(key, xs, a, b):
        eps = (jax.random.uniform(key, (), jnp.float32) - 0.5) * 1e-6
        xs = [x + eps for x in xs]

        def body(xs, _):
            for _i in range(k):
                xs = [a / (x + b) for x in xs]
            return xs, None

        xs, _ = jax.lax.scan(body, xs, None, length=outer)
        return sum(jnp.sum(x) for x in xs)

    a = jnp.float32(1.7)
    b = jnp.float32(0.3)
    dt = _time_fetch(div_chain, (x0s, a, b))
    # each link = 1 divide + 1 add; count the divides only
    ops = 1.0 * n * ilp * k * outer
    return dict(vpu_f32_div_gops=ops / dt / 1e9)


def measure_hbm_bw(n: int = 1 << 26, outer: int = 255) -> dict:
    """Measured HBM copy-add bandwidth (GB/s).  The adds are chained
    (each pass consumes the previous pass's output) so no pass can be
    elided, and the chain is carried through lax.scan so XLA cannot fuse
    the passes into one loop."""

    x0 = jax.random.uniform(jax.random.PRNGKey(3000), (n,), jnp.float32)

    @jax.jit
    def stream(key, x):
        eps = (jax.random.uniform(key, (), jnp.float32) - 0.5) * 1e-6
        x = x + eps                             # pass 0 (counted)

        def body(x, _):
            return x + jnp.float32(1.0), None

        x, _ = jax.lax.scan(body, x, None, length=outer)
        return jnp.sum(x)

    dt = _time_fetch(stream, (x0,))
    bytes_moved = 2.0 * 4.0 * n * (outer + 1)  # read + write per pass
    return dict(hbm_gbps=bytes_moved / dt / 1e9, elements=n,
                passes=outer + 1)


def measure() -> dict:
    rep = dict(backend=jax.default_backend())
    rep.update(measure_vpu_f32())
    rep.update(measure_vpu_div())
    rep.update(measure_hbm_bw())
    return rep


def main():
    try:
        from benchmarks._cache import enable_cache
        enable_cache()
    except Exception:
        pass
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in measure().items()}), flush=True)


if __name__ == "__main__":
    main()
