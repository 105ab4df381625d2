"""Tier-2 lateral-envelope sensitivity sweep (contact-model adjudication).

The articulated plant demonstrably side-steps to |vy| ~ 0.15 m/s while the
reference's teleop surface allows vy in +-0.25 (FSMState_Walking.cpp:31,
driven in full articulated Gazebo physics).  This sweep answers WHETHER the
0.15 limit is physics or a contact-model artifact: it walks the lateral
command boundary (vy in {0.15, 0.20, 0.25} at vx = 0.1) under
one-factor-at-a-time perturbations of every contact-model parameter --
integrator substeps 4 -> 8, mu x/÷ the Gazebo value, anchor/tangent
stiffness x/÷2, and a (counterfactual) doubled toe-box corner spacing --
and records, per lane: fell?, time of fall, peak uncommanded yaw twist,
lateral displacement, and minimum height.

If the fall boundary moves with contact parameters the limit is a model
artifact; if it is robust across the sweep it is contact physics of the
2 cm line foot.  Writes JSON rows to stdout (and perf/parts via
--out FILE).

    python -m benchmarks.lateral_sweep [--periods 600] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


VARIANTS = [
    ("base", {}),
    ("mu_0.6", dict(mu=0.6)),
    ("mu_1.4", dict(mu=1.4)),
    ("k_anchor_half", dict(k_anchor=1.0e4)),
    ("k_anchor_x2", dict(k_anchor=4.0e4)),
    ("k_tangent_half", dict(k_tangent=1.0e3)),
    ("k_tangent_x2", dict(k_tangent=4.0e3)),
    ("toe_width_x2", dict(toe_halfwidth_scale=2.0)),
]
VYS = [0.15, 0.20, 0.25, -0.15, -0.20, -0.25]

# The r4 adjudication this sweep established (kept here so regenerating
# the artifact reproduces it; the per-arm fall counts below it are
# recomputed mechanically from the rows on every run).
ADJUDICATION = (
    "The r3-documented '|vy| ~ 0.15 physical limit' is NOT contact "
    "physics: across mu x0.6/1.4, anchor/tangent stiffness x/2, substeps "
    "4->8 the fall boundary never moves (Mehrotra arm: +vy>=0.2 falls in "
    "all 7 contact variants, -vy all pass); only the counterfactual "
    "doubled toe width shifts it. The determinant is the QP solve's "
    "interior smoothing: fully-converged optima (Mehrotra f32 AND f64; "
    "fixed-sigma at 30 iterations) excite a yaw-twist chatter mode "
    "side-stepping toward the lead leg, while the PRODUCTION fused "
    "kernel's fixed-sigma 14-iteration solve walks the reference's whole "
    "+-0.25 surface: 96/96 lanes on TPU/pallas, 47/48 on CPU/XLA "
    "fixed-sigma (the one fall is the counterfactual wide-toe geometry "
    "at +0.25). Pinned by tests/test_whole_body.py::"
    "test_whole_body_lateral_full_envelope.")


# The r5 oracle adjudication (VERDICT r4 item 2): the reference's ACTUAL
# qpOASES placed in the tier-2 closed loop via a host callback
# (hector/qp/ref_check.py qpoases_callback_solver, --solver qpoases).
ORACLE_ADJUDICATION = (
    "qpOASES-in-the-loop settles the exact-optimum chatter question: the "
    "reference's own active-set solver (vendored qpOASES, setToMPC, "
    "swing elimination) FALLS at every +vy in {0.15, 0.20, 0.25} on the "
    "tier-2 plant (yaw-twist signature, max|yaw| 0.6-3.1 rad, t_fall "
    "0.8-1.5 s) while every -vy lane walks; the polished fused kernel "
    "(exact-optimum mode, --solver polish) reproduces this behavior "
    "lane-for-lane.  Conclusion: (a) behavioral parity with the "
    "reference solver holds exactly at the solver-exactness level; (b) "
    "the production kernel's 14-iteration interior smoothing, which "
    "walks the full +-0.25 envelope, is a genuine stabilizing "
    "improvement over the reference's own solver on this plant, not a "
    "smoothing artifact.  The +/- asymmetry is consistent with the "
    "reproduced reference leg-2 heel-row sign bug "
    "(hector/constraints.py:19-23; exact solvers ride the mis-signed "
    "line-contact boundary, interior-smoothed solutions stay off it).")


def _arm_summary(rows):
    """Mechanical per-(solver, backend) fall counts from the rows."""
    arms = {}
    for r in rows:
        key = f"{r['solver']}/{r['backend']}"
        n, f = arms.get(key, (0, 0))
        arms[key] = (n + 1, f + (1 if r["fell"] else 0))
    return {k: dict(lanes=n, falls=f) for k, (n, f) in arms.items()}


def _solver_cfg(solver: str):
    import dataclasses
    from hector.config import DEFAULT_CONFIG as CFG
    if solver == "default":
        return CFG
    if solver == "fixed-sigma":
        return dataclasses.replace(
            CFG, solver=dataclasses.replace(CFG.solver, mehrotra=False))
    if solver == "mehrotra":
        return dataclasses.replace(
            CFG, solver=dataclasses.replace(CFG.solver, mehrotra=True))
    if solver == "qpoases":
        # the reference's ACTUAL active-set solver in the loop (host
        # callback, CPU rollouts only) -- the r4-item-2 adjudication arm
        return dataclasses.replace(
            CFG, solver=dataclasses.replace(CFG.solver, backend='qpoases'))
    if solver == "polish":
        # the fused/stage solver driven to the exact optimum by the
        # active-set polish (1e-3 N qpOASES parity mode)
        return dataclasses.replace(
            CFG, solver=dataclasses.replace(
                CFG.solver, mehrotra=False, polish_rounds=8))
    raise ValueError(solver)


def sweep(n_substeps: int, periods: int, vx: float = 0.1,
          variants=VARIANTS, vys=VYS, solver: str = "default"):
    """All (variant, vy) lanes vmapped in one rollout at this substep
    count.  Returns a list of result-row dicts.

    solver: 'default' (the backend's production path -- the fused Pallas
    kernel on TPU, which ALWAYS runs the fixed-sigma single-corrector
    step), 'fixed-sigma', or 'mehrotra' (the latter two force the XLA
    Riccati path's algorithm; on TPU they still run through Pallas, so use
    them on the CPU backend)."""
    import jax as _jax
    from hector import runtime as RT
    from hector.plant import whole_body as WB
    CFG = _solver_cfg(solver)

    base = WB.ContactConfig()
    lanes = []
    for name, over in variants:
        for vy in vys:
            lanes.append((name, over, vy))
    B = len(lanes)
    f32 = jnp.float32
    ccfg = WB.ContactConfig(*[
        jnp.asarray([getattr(base, f)
                     if f not in over else over[f]
                     for (name, over, vy) in lanes], f32)
        for f in base._fields])
    vy_arr = jnp.asarray([vy for (_, _, vy) in lanes], f32)

    def one(ccfg_lane, vy, key):
        plant = WB.init_whole_body_state(height=0.545)
        obs0 = RT.whole_body_observation(plant)
        carry = RT.init_controller_carry(obs0, CFG, key=key)
        cmd = RT.walking_command(vx=vx, vy=vy)

        def body(state, _):
            c0, p0 = state
            c, p = c0, p0
            for k in range(CFG.mpc.mpc_cadence):
                obs = RT.whole_body_observation(p)
                c, mc, _w, _s, diag = RT.controller_tick(
                    c, obs, cmd, do_mpc=(k == 0), cfg=CFG)
                p = WB.step(p, mc, cfg=CFG, ccfg=ccfg_lane,
                            n_substeps=n_substeps)
            healthy = (jnp.isfinite(p.position).all()
                       & jnp.isfinite(p.quat).all()
                       & jnp.isfinite(p.q).all())
            p = jax.tree.map(lambda a, b: jnp.where(healthy, a, b), p, p0)
            c = jax.tree.map(lambda a, b: jnp.where(healthy, a, b), c, c0)
            fallen = diag["fallen"] | ~healthy
            out = dict(fallen=fallen, yaw=jnp.abs(diag["yaw"]),
                       height=diag["height"])
            return (c, p), out

        (c, p), d = jax.lax.scan(body, (carry, plant), None, length=periods)
        fell = d["fallen"].any()
        t_fall = jnp.where(
            fell, jnp.argmax(d["fallen"]) * CFG.mpc.mpc_cadence
            * CFG.plant.dt, jnp.nan)
        return dict(
            fell=fell, t_fall=t_fall,
            max_abs_yaw=jnp.max(d["yaw"]),
            min_height=jnp.min(d["height"]),
            final_y=p.position[1], final_x=p.position[0])

    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(0), jnp.arange(B))
    out = jax.jit(jax.vmap(one))(ccfg, vy_arr, keys)
    out = jax.tree.map(np.asarray, out)

    rows = []
    t_total = periods * CFG.mpc.mpc_cadence * CFG.plant.dt
    for i, (name, over, vy) in enumerate(lanes):
        rows.append(dict(
            variant=name, overrides=over, vy=vy, vx=vx,
            solver=solver, backend=_jax.default_backend(),
            n_substeps=n_substeps, seconds=round(t_total, 3),
            fell=bool(out["fell"][i]),
            t_fall_s=(None if not out["fell"][i]
                      else round(float(out["t_fall"][i]), 3)),
            max_abs_yaw=round(float(out["max_abs_yaw"][i]), 3),
            min_height=round(float(out["min_height"][i]), 3),
            final_y=round(float(out["final_y"][i]), 3),
            final_x=round(float(out["final_x"][i]), 3)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--periods", type=int, default=600)
    ap.add_argument("--substeps", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--solver", default="default",
                    choices=["default", "fixed-sigma", "mehrotra",
                             "qpoases", "polish"])
    ap.add_argument("--base-only", action="store_true",
                    help="only the base contact variant (the oracle arms: "
                         "the adjudication question needs base x vy, not "
                         "the full contact sensitivity grid)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) before first use")
    ap.add_argument("--out", default=None)
    ap.add_argument("--append", default=None,
                    help="append rows into an existing --out document")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    variants = VARIANTS[:1] if args.base_only else VARIANTS
    rows = []
    for ns in args.substeps:
        rows += sweep(ns, args.periods, solver=args.solver,
                      variants=variants)
        for r in rows[-len(variants) * len(VYS):]:
            print(json.dumps(r), flush=True)
    out = args.out or args.append
    if args.append and os.path.exists(args.append):
        with open(args.append) as f:
            doc = json.load(f)
        doc["rows"] += rows
    else:
        doc = dict(
            purpose="tier-2 lateral envelope contact-model + solver "
                    "sensitivity (VERDICT r3 item 1)",
            reference_envelope="vy +-0.25 (FSMState_Walking.cpp:31)",
            r4_adjudication=ADJUDICATION,
            r5_oracle_adjudication=ORACLE_ADJUDICATION,
            rows=rows)
    doc["arm_summary"] = _arm_summary(doc["rows"])
    # the baked adjudication text is the r4 historical record; flag whether
    # THIS run's rows still support its headline claim (no fall in any
    # non-counterfactual default/fixed-sigma lane) so a divergent re-run
    # cannot silently ship a contradicted conclusion
    smooth_falls = sum(
        1 for r in doc["rows"]
        if r["solver"] in ("default", "fixed-sigma")
        and r.get("variant") != "toe_width_x2" and r["fell"])
    doc["r4_adjudication_consistent_with_rows"] = smooth_falls == 0
    if out:
        with open(out, "w") as f:
            json.dump(doc, f, indent=1)
    return doc


if __name__ == "__main__":
    main()
