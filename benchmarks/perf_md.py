"""Render PERF.md from the recorded benchmark matrix.

    python -m benchmarks.perf_md perf/PERF_r3.json [perf/parts/weak_scaling.json]

Reads the raw JSON document written by ``benchmarks.record`` (plus the
separately-recorded CPU-mesh weak-scaling artifact, which must run in its
own process on the CPU backend) and writes PERF.md at the repo root.
"""

from __future__ import annotations

import json
import os
import sys


def _fmt(x, nd=1):
    if isinstance(x, float):
        return f"{x:,.{nd}f}"
    return f"{x:,}" if isinstance(x, int) else str(x)


def render(doc: dict, weak: dict | None, src_name: str,
           parts_dir: str | None = None) -> str:
    r = doc["results"]
    lines = []
    a = lines.append
    a("# PERF — recorded benchmark matrix")
    a("")
    a(f"Raw artifact: `{src_name}` (hardware: {doc['devices']}, backend "
      f"{doc['backend']}).  Methodology: dependency-chained, value-unique "
      f"dispatches synced by device→host value fetches (see `bench.py` "
      f"docstring).  The reference never recorded numbers — its only "
      f"instrumentation is a per-solve printf (`SolverMPC.cpp:717`).")
    a("")

    h = r.get("headline", {})
    a("## Headline")
    a("")
    a(f"**{_fmt(h.get('value'))} {h.get('unit', '')}** — "
      f"{_fmt(h.get('vs_baseline'), 1)}× the per-chip BASELINE share "
      f"(≥100k solves/s on v5e-16 → 6,250/chip).  One solve = one full MPC "
      f"planning step (FK/Jacobians, gait, reference trajectory, QP build, "
      f"fixed-iteration interior point, wrench + torque map).")
    a("")

    rf = r.get("roofline", {})
    a("## Solver-kernel roofline (speed-of-light)")
    a("")
    if "error" in rf or not rf:
        a(f"NOT RECORDED: {rf.get('error', 'missing')}")
    else:
        a("| quantity | value |")
        a("|---|---|")
        for k, v in rf.items():
            a(f"| {k} | {_fmt(v, 3) if isinstance(v, float) else v} |")
        a("")
        frac = rf.get("fraction_of_speed_of_light")
        if frac:
            kind = ("measured" if "speed_of_light_compute_measured" in rf
                    else "analytic")
            a(f"The fused Riccati kernel sustains "
              f"**{100.0 * frac:.0f}% of the {kind} "
              f"speed-of-light** for its bytes/FLOPs mix.")
    a("")

    lt = r.get("latency", {})
    a("## Real-time budget (per-dispatch latency of one MPC period)")
    a("")
    if "error" in lt or not lt:
        a(f"NOT RECORDED: {lt.get('error', 'missing')}")
    else:
        a(f"Budget: {lt['budget_ms']} ms = one MPC period (5 ticks at "
          f"1 kHz, one 200 Hz QP solve).  Measured dispatch-overhead floor "
          f"on this tunneled runtime: {lt['dispatch_overhead_ms']} ms "
          f"(subtracted for the `net` column — the locally-attached-chip "
          f"number).")
        a("")
        a("| batch | latency (ms) | net (ms) | ≤ budget | ≤ budget (net) |")
        a("|---|---|---|---|---|")
        for row in lt["rows"]:
            a(f"| {row['batch']:,} | {row['latency_ms']} | {row['net_ms']} "
              f"| {'yes' if row['meets_budget'] else 'no'} "
              f"| {'yes' if row['meets_budget_net'] else 'no'} |")
        a("")
        a(f"Largest batch within the 5 ms period budget: "
          f"**{lt['max_batch_within_budget']:,}** end-to-end, "
          f"**{lt['max_batch_within_budget_net']:,}** net of tunnel "
          f"overhead.")
        if lt.get("k_period_rows"):
            a("")
            a("### Serving mode: K device-resident periods per dispatch")
            a("")
            a("One dispatch runs K MPC periods on-device (the rollout "
              "already scans periods), amortizing the round-trip; the "
              "per-period column is END-TO-END (dispatch + K periods + "
              "fetch)/K — no floor subtraction.")
            a("")
            a("| batch | K periods | dispatch total (ms) | per period (ms)"
              " | ≤ 5 ms |")
            a("|---|---|---|---|---|")
            for row in lt["k_period_rows"]:
                a(f"| {row['batch']:,} | {row['k_periods']} "
                  f"| {row['dispatch_total_ms']} | {row['per_period_ms']} "
                  f"| {'yes' if row['meets_budget'] else 'no'} |")
            a("")
            k_min = lt.get("min_k_meeting_budget_end_to_end", 0)
            if k_min:
                a(f"From **K = {k_min}** periods per dispatch the "
                  f"end-to-end per-period time meets the 200 Hz budget on "
                  f"this tunneled runtime — the real-time serving recipe, "
                  f"demonstrated rather than extrapolated.")
    a("")

    a("## BASELINE configs")
    a("")
    a("| config | result |")
    a("|---|---|")
    for k in ("config1", "config2", "config3", "config4", "config5",
              "sharded_pallas"):
        c = r.get(k, {})
        if "error" in c:
            a(f"| {k} | ERROR: {c['error'][:120]} |")
            continue
        head = c.get("config", k)
        keys = [x for x in ("solves_per_s", "closed_loop_solves_per_s",
                            "sim_seconds_per_wall_second", "mean_height",
                            "fallen_frac", "fallen_count", "batch",
                            "devices", "peak_solves_per_s") if x in c]
        body = ", ".join(f"{x}={_fmt(c[x])}" for x in keys)
        a(f"| {head} | {body} |")
    a("")
    c5 = r.get("config5", {})
    if "rows" in c5:
        a("### Throughput-vs-batch saturation (config 5)")
        a("")
        a("| batch | solves/s | vs peak |")
        a("|---|---|---|")
        for row in c5["rows"]:
            a(f"| {row['batch']:,} | {_fmt(row['solves_per_s'])} "
              f"| {row['throughput_vs_peak']:.2f} |")
        a("")
        a("Rising-to-1.0 is the expected shape: small batches underfill "
          "the chip; the knee is where one chip saturates.  Scale past the "
          "knee comes from more chips (the `('data',)` mesh), not bigger "
          "per-chip batches.")
    a("")

    a("## Weak scaling (virtual 8-device CPU mesh)")
    a("")
    if not weak or "rows" not in weak:
        a("NOT RECORDED (run `JAX_PLATFORMS=cpu python -m "
          "benchmarks.weak_scaling`).")
    else:
        has_coll = any("collectives" in r for r in weak["rows"])
        if has_coll:
            a("| devices | global batch | time/step (s) | efficiency "
              "t(1)/t(n) | collective ops | collective payload (B/step) |")
            a("|---|---|---|---|---|---|")
            for row in weak["rows"]:
                c = row.get("collectives", {})
                ops = ", ".join(f"{k}×{v}" for k, v in
                                sorted(c.get("ops", {}).items())) or "none"
                a(f"| {row['devices']} | {row['batch']} | {row['time_s']} "
                  f"| {row['weak_scaling_efficiency']} | {ops} "
                  f"| {c.get('payload_bytes_per_step', 0)} |")
        else:
            a("| devices | global batch | time/step (s) | "
              "efficiency t(1)/t(n) |")
            a("|---|---|---|---|")
            for row in weak["rows"]:
                a(f"| {row['devices']} | {row['batch']} | {row['time_s']} "
                  f"| {row['weak_scaling_efficiency']} |")
        a("")
        if "predicted_ici_time_s" in weak:
            a(f"Compiled-HLO collective accounting (the quantitative "
              f"claim; the virtual-device timing curve is host-core "
              f"contention): worst-case cross-device payload "
              f"**{weak['collective_payload_bytes_max']} B/step** — "
              f"**{weak['predicted_ici_time_s']*1e9:.1f} ns** on one v5e "
              f"ICI link (4.5e10 B/s) against a multi-ms compute step, so "
              f"real-hardware weak scaling is compute-bound by "
              f"construction.")
            a("")
        a(f"_{weak.get('note', '')}_  Sharded pallas-interpret rollout "
          f"(2 periods, 8 devices): "
          f"{'ok' if weak.get('sharded_pallas_interpret_2periods_ok') else 'FAILED'}.")
    a("")

    def _part(name):
        if not parts_dir:
            return None
        p = os.path.join(parts_dir, name)
        if os.path.exists(p) and os.path.getsize(p) > 0:
            with open(p) as fh:
                return json.load(fh)
        return None

    ca = _part("cycle_accounting.json")
    if ca:
        a("## Kernel cycle accounting (measured ceilings)")
        a("")
        pk = ca["peaks"]
        a(f"Chip peaks MEASURED by `benchmarks/vpu_peak.py` (ILP-"
          f"interleaved chains, net of the tunnel dispatch floor): "
          f"f32 VPU FMA **{pk['vpu_f32_tflops']:.2f} TFLOP/s**, f32 divide "
          f"**{pk['vpu_f32_div_gops']:.0f} Gop/s** (~15× slower than FMA), "
          f"HBM **{pk['hbm_gbps']:.0f} GB/s**.")
        a("")
        it = ca["iteration_scaling"]
        a(f"Iteration sweep (batch 16,384): {it['per_iteration_s']*1e3:.2f}"
          f" ms per interior-point iteration, {it['out_of_loop_s']*1e3:.2f}"
          f" ms out-of-loop (load/init/store/dispatch) — the IP loop is "
          f"**{100*it['loop_fraction_at_14']:.0f}%** of kernel time at the "
          f"production 14 iterations.")
        a("")
        a("| batch | kernel solves/s |")
        a("|---|---|")
        for row in ca["occupancy"]:
            a(f"| {row['batch']:,} | {_fmt(row['solves_per_s'])} |")
        a("")
        om = ca["op_mix_pricing"]
        a(f"Where the cycles go (best batch): **"
          f"{100*om['fma_only_fraction']:.0f}% measured-peak FMA work** + "
          f"**{100*(om['priced_fraction']-om['fma_only_fraction']):.0f}% "
          f"divide/rsqrt slow-path** (Cholesky pivots, barrier weights, "
          f"step ratios) = {100*om['priced_fraction']:.0f}% of measured "
          f"cycles priced by the op-mix model; the remaining "
          f"{100*(1-om['priced_fraction']):.0f}% is masked-lane selects, "
          f"compares and Mosaic loop overhead.  HBM time is negligible "
          f"({om['t_hbm_s']*1e9:.1f} ns/solve vs "
          f"{om['t_measured_s']*1e9:.0f} ns measured) — the kernel is "
          f"compute-bound by design.")
        a("")

    mh = _part("multihost.json")
    if mh:
        a("## Multi-process (DCN-path) sharded rollout")
        a("")
        a("| processes | global devices | global batch | closed-loop "
          "solves/s |")
        a("|---|---|---|---|")
        for row in mh["rows"]:
            a(f"| {row['processes']} | {row['global_devices']} "
              f"| {row['global_batch']:,} "
              f"| {_fmt(row['closed_loop_solves_per_s'])} |")
        a("")
        a(f"_{mh.get('caveat', '')}_")
        a("")

    kp = _part("kernel_polish_tpu.json")
    if kp:
        a("## Literal qpOASES parity on the production kernel "
          "(TPU-confirmed)")
        a("")
        a(f"The fused Pallas kernel with the active-set polish "
          f"(`SolverConfig.polish_rounds=8`, hector/qp/pallas_riccati.py) "
          f"vs the reference's ACTUAL vendored qpOASES "
          f"(SolverMPC.cpp:702-712 options) on {kp['scenarios']} "
          f"golden + operating-envelope scenarios, run through the real "
          f"`pallas_call` on backend **{kp['backend']}**: max error "
          f"**{kp['max_err_N']:.2e} N** (median "
          f"{kp['median_err_N']:.1e}), bar 1e-3 N — "
          f"**{'PASSED' if kp['passed'] else 'FAILED'}**, "
          f"{1e-3/max(kp['max_err_N'],1e-12):.0f}× under the bar in pure "
          f"float32.  Production closed-loop rollouts keep polish OFF "
          f"(the interior smoothing is part of the adjudicated walking "
          f"behavior, below).")
        a("")

    sg = _part("standing_sag.json")
    if sg:
        a("## Standing-sag adjudication (reference's own solver in the "
          "loop)")
        a("")
        a("| solver arm | settled mean height (m) |")
        a("|---|---|")
        for arm in sg["arms"]:
            a(f"| {arm['solver']} | {arm['mean_height_tail']:.4f} |")
        a("")
        d = sg.get("production_vs_oracle_m")
        if d is not None:
            a(f"Command height {sg['command_height']} m; every arm sags "
              f"~{sg['sag_production_m']*100:.1f} cm below it, and the "
              f"production solver settles within "
              f"**{abs(d)*1e3:.2f} mm** of the reference's actual qpOASES "
              f"in the same loop — the sub-target equilibrium is MEASURED "
              f"reference parity (the 9 kg mass quirk under-compensates "
              f"gravity, ConvexMPCLocomotion.cpp mass constant), not a "
              f"solver artifact (benchmarks/standing_sag.py).")
        a("")

    c5k = _part("config5_256k.json")
    if c5k:
        a("## Config 5 at stated scale: 256k-scenario campaign (1 chip)")
        a("")
        rs = c5k.get("resume") or {}
        a(f"{c5k['total_scenarios']:,} scenarios ({c5k['waves']} waves × "
          f"{c5k['batch']:,}, {c5k['periods']} MPC periods each) streamed "
          f"through the native host pipeline on {c5k['devices']} "
          f"{c5k['backend']} device(s): **{c5k['total_solves']:,} solves "
          f"in {c5k['wall_s']} s wall** = "
          f"{_fmt(c5k['sustained_solves_per_s'])} solves/s sustained "
          f"end-to-end (incl. generation, H2D, checkpoint).  Mid-campaign "
          f"orbax checkpoint at wave {rs.get('checkpoint_step', '?')} with "
          f"a REAL restore-from-disk resume; health: "
          f"{c5k['fallen_lanes_total']} fallen / "
          f"{c5k['quarantined_lanes_total']} quarantined lanes total.")
        a("")

    ls = _part("lateral_sweep.json")
    if ls:
        a("## Tier-2 lateral-envelope adjudication")
        a("")
        rows = ls["rows"]
        n_fell = sum(1 for x in rows if x["fell"])
        arms = ls.get("arm_summary", {})
        arm_txt = "; ".join(f"{k}: {v['falls']}/{v['lanes']} falls"
                            for k, v in arms.items())
        a(f"{len(rows)} lanes (contact-parameter OFAT × vy ∈ ±{{0.15, "
          f"0.20, 0.25}} × solver arm), {n_fell} falls ({arm_txt}).")
        a("")
        if ls.get("r5_oracle_adjudication"):
            a(f"**r5 oracle adjudication** — "
              f"{ls['r5_oracle_adjudication']}")
            a("")
        hist = ls.get("r4_adjudication", ls.get("conclusion", ""))
        if hist:
            a(f"r4 contact-model adjudication (historical): {hist}")
        a("")

    return "\n".join(lines) + "\n"


def main(doc_path: str, weak_path: str | None = None,
         out: str = "PERF.md"):
    with open(doc_path) as fh:
        doc = json.load(fh)
    weak = None
    if weak_path and os.path.exists(weak_path) and \
            os.path.getsize(weak_path) > 0:
        with open(weak_path) as fh:
            weak = json.load(fh)
    parts_dir = os.path.join(os.path.dirname(os.path.abspath(doc_path)),
                             "parts")
    text = render(doc, weak, os.path.basename(doc_path),
                  parts_dir=parts_dir)
    with open(out, "w") as fh:
        fh.write(text)
    print(f"wrote {out} ({len(text)} bytes)")


if __name__ == "__main__":
    main(sys.argv[1],
         sys.argv[2] if len(sys.argv) > 2 else "perf/parts/weak_scaling.json")
