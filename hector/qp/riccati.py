"""Stage-wise Riccati interior-point MPC solver (condensing-free).

The dense path (hector/qp/pdip.py) mirrors the reference's architecture:
condense the h-step dynamics into a 120x120 QP (SolverMPC.cpp:133-193), then
factor a dense 120x120 KKT system per interior-point iteration.  That is the
right shape for qpOASES on a CPU, but on TPU it is FLOP- and HBM-wasteful:
the condensing GEMM (B_qp^T S B_qp, 120x130x120) costs more FLOPs than the
factorization it feeds, and the batched KKT matrix is 236 MB at batch 4096 --
far beyond VMEM, so every iteration round-trips HBM.

This module keeps the optimal-control structure instead (the HPIPM insight):

    min  sum_{k=1..h} (x_k - xd_k)^T S (x_k - xd_k) + sum_k u_k^T alpha u_k
    s.t. x_{k+1} = A x_k + B_k u_k,  x_0 given,
         lb_k <= C u_k <= ub_k                    (input-only constraints)

The Newton/KKT solve of each interior-point iteration becomes a backward
Riccati sweep of 12x12 factorizations plus a forward rollout -- O(h (n+m)^3)
instead of O((hm)^3): ~6x fewer FLOPs at h=10, and the working set is
~25 KB/scenario instead of 57.6 KB *squared* state.  No 120-dim object is
ever formed.  Constraints stay per-stage 16-row blocks (friction pyramid,
Mx, line-contact, Fz budget -- hector/constraints.py) with the same masking
semantics as the dense solver; swing-leg steps mask B's columns
(B_k = B diag(m_k)), reproducing the reference's swing-variable elimination
(SolverMPC.cpp:589-733) at static shape.

Equivalence to the dense QP (verified by tests/test_riccati.py): with
Q = 2 S, R = 2 alpha (+ the same KKT regularization on R's diagonal), the
stage problem's optimality system is an exact block-elimination of the
condensed system H = 2(B_qp^T S B_qp + alpha), so both solvers converge to
the same primal solution.

Interior-point mechanics (masks, Mehrotra predictor-corrector, fraction-to-
boundary, NaN quarantine) are identical to pdip.py; only the linear solve
differs.  All matmuls request Precision.HIGHEST: on TPU the MXU's default
bf16 multiplications quantize forces at the ~0.5 N level, violating the
1e-3 N parity contract.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from .pdip import QPSolution

_HI = jax.lax.Precision.HIGHEST
_mm = functools.partial(jnp.einsum, precision=_HI)


class StageQPData(NamedTuple):
    """One MPC problem in optimal-control (stage) form; every field may
    carry leading batch dims.  Produced by hector.qp.builder.build_stage_qp.
    """

    a_dt: jnp.ndarray     # (..., 13, 13) discrete dynamics Acd = I + dt A
    b_dt: jnp.ndarray     # (..., 13, 12) discrete input map Bcd = dt B
    u_mask: jnp.ndarray   # (..., h, 12) stance-variable mask per stage
    x0: jnp.ndarray       # (..., 13) initial state
    xd: jnp.ndarray       # (..., h, 13) reference states for x_1..x_h
    q_diag: jnp.ndarray   # (13,) state weights S (13th entry 0)
    r_diag: jnp.ndarray   # (12,) input weights alpha
    c_block: jnp.ndarray  # (..., 16, 12) per-stage constraint rows
    lb: jnp.ndarray       # (..., h, 16)
    ub: jnp.ndarray       # (..., h, 16)


def solve_batched(sqp: StageQPData, scfg: SolverConfig = SolverConfig()
                  ) -> QPSolution:
    """Solve a batch of stage-form MPC QPs (leading batch dim on every
    batched field).  Returns the same QPSolution as the dense solver with
    u flattened to (B, 12h)."""
    a, b, u_mask, x0, xd, q_diag, r_diag, c_blk, lb, ub = sqp
    dtype = x0.dtype
    bsz = x0.shape[0]
    h = lb.shape[-2]

    big = jnp.asarray(scfg.big_threshold, dtype)
    mask_l = lb > -big
    mask_u = ub < big
    n_act = jnp.maximum(
        jnp.sum(mask_l, axis=(1, 2)) + jnp.sum(mask_u, axis=(1, 2)),
        1).astype(dtype)
    lb_c = jnp.where(mask_l, lb, 0.0)
    ub_c = jnp.where(mask_u, ub, 0.0)

    # weight vectors may arrive unbatched (13,)/(12,) or batched (B,13)/(B,12)
    # (make_solver's vmap rule broadcasts unbatched fields); normalize to
    # batched so downstream shapes are uniform.
    q2 = jnp.broadcast_to(2.0 * q_diag.astype(dtype), (bsz, 13))
    r2 = jnp.broadcast_to(2.0 * r_diag.astype(dtype), (bsz, 12))
    q2_mat = q2[:, None, :] * jnp.eye(13, dtype=dtype)    # (B,13,13)
    # regularization enters ONLY the Newton (Riccati) matrix, not the
    # gradient -- the dense path likewise regularizes the KKT factorization
    # but computes residuals with the exact H (pdip.py factor()).
    r2_mat = ((r2 + jnp.asarray(scfg.kkt_reg, dtype))[:, None, :]
              * jnp.eye(12, dtype=dtype))                 # (B,12,12)

    # per-stage masked input map: B_k = B diag(mask_k)  (..., h, 13, 12)
    b_st = b[:, None, :, :] * u_mask[:, :, None, :]
    # scan-major layouts (h leading)
    b_sc = jnp.moveaxis(b_st, 1, 0)                       # (h, B, 13, 12)

    eps = jnp.finfo(dtype).eps
    # with polish the IP must run to its clamp-limited stall point (the
    # polish identifies the active set there); the float32 mu freeze at
    # 10*eps ~ 1.2e-6 would stop it a decade early and corrupt the
    # identification.  1e-9 is deep enough for identification while still
    # keeping the complementarity products representable.
    mu_floor = (jnp.asarray(1e-9, dtype) if scfg.polish_rounds > 0
                else jnp.maximum(jnp.asarray(1e-14, dtype), 10.0 * eps))
    s_floor = 10.0 * eps
    d_cap = 0.1 / eps
    sl_cap = jnp.asarray(1e8, dtype)

    def apply_c(u):                                       # (B,h,12)->(B,h,16)
        return _mm('bij,bhj->bhi', c_blk, u)

    def apply_ct(y):                                      # (B,h,16)->(B,h,12)
        return _mm('bij,bhi->bhj', c_blk, y)

    def rollout(u):
        """x_1..x_h from x_0 under u.  (B,h,12) -> (B,h,13)."""
        u_sc = jnp.moveaxis(u, 1, 0)

        def step(x, bu):
            b_k, u_k = bu
            x1 = _mm('bij,bj->bi', a, x) + _mm('bij,bj->bi', b_k, u_k)
            return x1, x1

        _, xs = jax.lax.scan(step, x0, (b_sc, u_sc))
        return jnp.moveaxis(xs, 0, 1)

    def factor(d_row):
        """Backward Riccati sweep.  d_row (B,h,16) barrier row weights.
        Returns per-stage (chol_L (B,h,12,12), K (B,h,12,13), G (B,h,12,13)).
        """
        # Re's constraint part: C^T D_k C, one small einsum for all stages
        cdc = _mm('bki,bhk,bkj->bhij', c_blk, d_row, c_blk)
        rq = cdc + r2_mat[:, None]                        # (B,h,12,12)
        rq_sc = jnp.moveaxis(rq, 1, 0)

        def step(p, inp):
            b_k, rq_k = inp
            bp = _mm('bji,bjl->bil', b_k, p)              # B^T P  (12,13)
            re = rq_k + _mm('bij,bjk->bik', bp, b_k)      # (12,12)
            ell = jnp.linalg.cholesky(re)
            g = _mm('bij,bjk->bik', bp, a)                # (12,13)
            k_gain = jax.scipy.linalg.cho_solve((ell, True), g)
            ap = _mm('bji,bjl->bil', a, p)                # A^T P
            p_new = (q2_mat + _mm('bij,bjk->bik', ap, a)
                     - _mm('bji,bjk->bik', g, k_gain))
            p_new = 0.5 * (p_new + jnp.swapaxes(p_new, -1, -2))
            return p_new, (ell, k_gain, g)

        _, (ells, ks, gs) = jax.lax.scan(
            step, q2_mat, (jnp.flip(b_sc, 0), jnp.flip(rq_sc, 0)))
        # scan ran k=h-1..0; flip back to stage order
        return jnp.flip(ells, 0), jnp.flip(ks, 0), jnp.flip(gs, 0)

    def lqr_solve(fac, q_lin, r_lin):
        """Backward linear sweep + forward rollout -> Newton du (B,h,12).

        q_lin (B,h,13): gradients of the state cost at x_1..x_h;
        r_lin (B,h,12): input-side linear terms.
        """
        ells, ks, gs = fac
        q_sc = jnp.moveaxis(q_lin, 1, 0)
        r_sc = jnp.moveaxis(r_lin, 1, 0)
        # stage-k backward step adds q_lin[k-1]; build the shifted array
        q_shift = jnp.concatenate(
            [jnp.zeros_like(q_sc[:1]), q_sc[:-1]], axis=0)

        def bwd(p_vec, inp):
            b_k, ell, g, r_k, q_km1 = inp
            beta = r_k + _mm('bji,bj->bi', b_k, p_vec)
            kff = jax.scipy.linalg.cho_solve((ell, True), beta[..., None])
            kff = kff[..., 0]
            p_new = (_mm('bji,bj->bi', a, p_vec)
                     - _mm('bji,bj->bi', g, kff) + q_km1)
            return p_new, kff

        p_h = q_sc[-1]
        _, kffs = jax.lax.scan(
            bwd, p_h,
            (jnp.flip(b_sc, 0), jnp.flip(ells, 0), jnp.flip(gs, 0),
             jnp.flip(r_sc, 0), jnp.flip(q_shift, 0)))
        kffs = jnp.flip(kffs, 0)                          # (h, B, 12)

        def fwd(dx, inp):
            b_k, k_gain, kff = inp
            du = -(_mm('bij,bj->bi', k_gain, dx) + kff)
            dx1 = _mm('bij,bj->bi', a, dx) + _mm('bij,bj->bi', b_k, du)
            return dx1, du

        _, dus = jax.lax.scan(
            fwd, jnp.zeros_like(x0), (b_sc, ks, kffs))
        return jnp.moveaxis(dus, 0, 1)                    # (B, h, 12)

    def alpha_max(s, ds, mask, frac):
        ratios = jnp.where(mask & (ds < 0), s / jnp.maximum(-ds, 1e-30),
                           jnp.inf)
        return jnp.minimum(1.0, frac * jnp.min(ratios, axis=(1, 2)))

    # --- scale-aware start (same policy as pdip.py) ---
    zero_d = jnp.zeros((bsz, h, 16), dtype)
    fac0 = factor(zero_d)
    xs0 = rollout(jnp.zeros((bsz, h, 12), dtype))
    q_lin0 = q2[:, None, :] * (xs0 - xd)
    u_unc = lqr_solve(fac0, q_lin0, jnp.zeros((bsz, h, 12), dtype))
    cu0 = apply_c(u_unc)
    sh_l = jnp.where(mask_l, cu0 - lb_c, 1.0)
    sh_u = jnp.where(mask_u, ub_c - cu0, 1.0)
    s_min = jnp.minimum(
        jnp.min(jnp.where(mask_l, sh_l, jnp.inf), axis=(1, 2)),
        jnp.min(jnp.where(mask_u, sh_u, jnp.inf), axis=(1, 2)))
    shift = (jnp.asarray(scfg.init_slack, dtype)
             + jnp.maximum(0.0, -1.5 * s_min))[:, None, None]
    sl0 = jnp.where(mask_l, sh_l + shift, 1.0)
    su0 = jnp.where(mask_u, sh_u + shift, 1.0)
    mu0 = jnp.asarray(scfg.init_dual, dtype)
    ll0 = jnp.where(mask_l, mu0 / sl0, 0.0)
    lu0 = jnp.where(mask_u, mu0 / su0, 0.0)
    u0 = jnp.zeros((bsz, h, 12), dtype)

    def body(_, carry):
        u, s_l, lam_l, s_u, lam_u = carry
        cu = apply_c(u)
        xs = rollout(u)
        q_lin = q2[:, None, :] * (xs - xd)                # (B,h,13)
        r_pl = jnp.where(mask_l, cu - lb_c - s_l, 0.0)
        r_pu = jnp.where(mask_u, ub_c - cu - s_u, 0.0)
        # one reciprocal per bound side (matches the fused kernel exactly:
        # everything downstream multiplies, incl. the primal step sizes)
        inv_sl = 1.0 / jnp.maximum(s_l, s_floor)
        inv_su = 1.0 / jnp.maximum(s_u, s_floor)
        d_l = jnp.where(mask_l, jnp.minimum(lam_l * inv_sl, d_cap), 0.0)
        d_u = jnp.where(mask_u, jnp.minimum(lam_u * inv_su, d_cap), 0.0)
        mu = (jnp.sum(s_l * lam_l * mask_l, axis=(1, 2))
              + jnp.sum(s_u * lam_u * mask_u, axis=(1, 2))) / n_act

        fac = factor(d_l + d_u)

        def newton(tau_l, tau_u):
            v = (jnp.where(mask_u, tau_u * inv_su, 0.0)
                 - jnp.where(mask_l, tau_l * inv_sl, 0.0)
                 - (lam_u - lam_l) - d_u * r_pu + d_l * r_pl)
            r_lin = r2[:, None, :] * u + apply_ct((lam_u - lam_l) + v)
            du = lqr_solve(fac, q_lin, r_lin)
            cdu = apply_c(du)
            ds_l = jnp.where(mask_l, cdu + r_pl, 0.0)
            ds_u = jnp.where(mask_u, -cdu + r_pu, 0.0)
            dl_l = jnp.where(
                mask_l, tau_l * inv_sl - lam_l - d_l * (cdu + r_pl), 0.0)
            dl_u = jnp.where(
                mask_u, tau_u * inv_su - lam_u - d_u * (-cdu + r_pu), 0.0)
            return du, ds_l, dl_l, ds_u, dl_u

        zero_tau = jnp.zeros_like(s_l)
        if scfg.mehrotra:
            du_a, dsl_a, dll_a, dsu_a, dlu_a = newton(zero_tau, zero_tau)
            a_p = jnp.minimum(alpha_max(s_l, dsl_a, mask_l, 1.0),
                              alpha_max(s_u, dsu_a, mask_u, 1.0)
                              )[:, None, None]
            a_d = jnp.minimum(alpha_max(lam_l, dll_a, mask_l, 1.0),
                              alpha_max(lam_u, dlu_a, mask_u, 1.0)
                              )[:, None, None]
            mu_aff = (jnp.sum((s_l + a_p * dsl_a) * (lam_l + a_d * dll_a)
                              * mask_l, axis=(1, 2))
                      + jnp.sum((s_u + a_p * dsu_a) * (lam_u + a_d * dlu_a)
                                * mask_u, axis=(1, 2))) / n_act
            sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3,
                             0.0, 1.0)
            sigma = jnp.nan_to_num(sigma, nan=1.0)
            smu = (sigma * mu)[:, None, None]
            tau_l = smu - dsl_a * dll_a
            tau_u = smu - dsu_a * dlu_a
        else:
            smu = (jnp.asarray(scfg.sigma_fixed, dtype) * mu)[:, None, None]
            tau_l = jnp.where(mask_l, smu, 0.0)
            tau_u = jnp.where(mask_u, smu, 0.0)

        du, ds_l, dl_l, ds_u, dl_u = newton(tau_l, tau_u)

        frac = jnp.asarray(scfg.frac_to_boundary, dtype)
        # primal steps via the already-computed slack reciprocals (matches
        # the fused kernel bit-for-bit): alpha = min(1, frac min s/(-ds))
        # = frac / max(max_i (-ds_i)/s_i, frac)
        rate_p = jnp.maximum(
            jnp.max(jnp.where(mask_l & (ds_l < 0), -ds_l * inv_sl, 0.0),
                    axis=(1, 2)),
            jnp.max(jnp.where(mask_u & (ds_u < 0), -ds_u * inv_su, 0.0),
                    axis=(1, 2)))
        a_p = (frac / jnp.maximum(rate_p, frac))[:, None, None]
        a_d = jnp.minimum(alpha_max(lam_l, dl_l, mask_l, frac),
                          alpha_max(lam_u, dl_u, mask_u, frac))[:, None, None]

        finite = (jnp.all(jnp.isfinite(du), axis=(1, 2))
                  & jnp.all(jnp.isfinite(ds_l) & jnp.isfinite(dl_l)
                            & jnp.isfinite(ds_u) & jnp.isfinite(dl_u),
                            axis=(1, 2)))[:, None, None]
        a_p = jnp.where(finite, a_p, 0.0)
        a_d = jnp.where(finite, a_d, 0.0)

        skip = (mu < mu_floor)[:, None, None] | ~finite
        u_n = jnp.where(skip, u, u + a_p * du)
        s_l_n = jnp.where(skip | ~mask_l, s_l,
                          jnp.clip(s_l + a_p * ds_l, 0.0, sl_cap))
        s_u_n = jnp.where(skip | ~mask_u, s_u,
                          jnp.clip(s_u + a_p * ds_u, 0.0, sl_cap))
        lam_l_n = jnp.where(skip | ~mask_l, lam_l,
                            jnp.clip(lam_l + a_d * dl_l, 0.0, sl_cap))
        lam_u_n = jnp.where(skip | ~mask_u, lam_u,
                            jnp.clip(lam_u + a_d * dl_u, 0.0, sl_cap))
        return (u_n, s_l_n, lam_l_n, s_u_n, lam_u_n)

    carry = jax.lax.fori_loop(
        0, scfg.iterations, body, (u0, sl0, ll0, su0, lu0), unroll=False)
    u, s_l, lam_l, s_u, lam_u = carry
    lam_eff = lam_u - lam_l

    if scfg.polish_rounds > 0:
        # Active-set polish: the IP's d_cap/s_floor clamps stall its
        # iterates ~3-8 mN from the exact optimum independent of precision
        # (the clamp bounds the penalty weight enforcing active rows).
        # Refine with a primal-dual active-set method (PDAS / semismooth
        # Newton, Hintermueller et al.): each round estimates the active
        # set from the sign structure  nu + rho (Cu - b) , solves the
        # equality-constrained subproblem by an augmented Lagrangian
        # (polish_iters exact Newton solves at penalty rho -- the
        # multiplier updates make the active-row violation contract
        # without needing a large, f32-hostile rho), and re-estimates.
        # Both adds AND drops happen naturally through the sign test.
        rho = jnp.asarray(scfg.polish_rho, dtype)
        eq = mask_l & mask_u & (ub_c - lb_c < 1e-12)
        u_p = u
        nu = lam_u - lam_l
        cu_p = apply_c(u_p)
        act_u = (mask_u & (nu + rho * (cu_p - ub_c) > 0)) | eq
        act_l = (mask_l & (-nu + rho * (lb_c - cu_p) > 0) & ~act_u) | eq

        def viol_of(cu_v):
            return jnp.maximum(
                jnp.where(mask_l, lb_c - cu_v, 0.0),
                jnp.where(mask_u, cu_v - ub_c, 0.0)).max(axis=(1, 2))

        # Best-of-rounds by a KKT merit: PDAS can 2-cycle between the
        # correct set and a wrong one on degenerate lanes (observed on
        # ~5% of randomized standing scenarios).  The correct-set round
        # is feasible to ~1e-6 with correctly-signed multipliers; wrong
        # sets either violate constraints O(0.1) or carry wrong-sign
        # multipliers >~1e-3 (a feasible point of an over-constrained
        # set).  merit = max(primal violation, wrong-sign/10); a lane is
        # accepted only at merit <= 10*polish_tol, else it falls back to
        # the IP iterate.
        big0 = jnp.full(u.shape[:1], jnp.inf, dtype)
        u_best, nu_best, bad_best = u_p, nu, big0
        for _ in range(scfg.polish_rounds):
            act = act_l | act_u
            bnd = jnp.where(act_l & ~act_u, lb_c,
                            jnp.where(act_u, ub_c, 0.0))
            nu = jnp.where(act, nu, 0.0)
            fac_p = factor(rho * act.astype(dtype))
            for _ in range(scfg.polish_iters):
                xs_p = rollout(u_p)
                q_lin_p = q2[:, None, :] * (xs_p - xd)
                viol = jnp.where(act, apply_c(u_p) - bnd, 0.0)
                r_lin_p = (r2[:, None, :] * u_p
                           + apply_ct(nu + rho * viol))
                du_p = lqr_solve(fac_p, q_lin_p, r_lin_p)
                fin = jnp.all(jnp.isfinite(du_p), axis=(1, 2))[:, None, None]
                u_p = jnp.where(fin, u_p + du_p, u_p)
                nu = jnp.where(act, nu + rho * (apply_c(u_p) - bnd), 0.0)
            cu_p = apply_c(u_p)
            wrong = jnp.maximum(
                jnp.where(act_u & ~eq, jnp.maximum(-nu, 0.0), 0.0),
                jnp.where(act_l & ~act_u & ~eq, jnp.maximum(nu, 0.0), 0.0)
            ).max(axis=(1, 2))
            bad_r = jnp.where(
                jnp.all(jnp.isfinite(u_p), axis=(1, 2)),
                jnp.maximum(viol_of(cu_p), 0.1 * wrong), jnp.inf)
            better = (bad_r < bad_best)[:, None, None]
            u_best = jnp.where(better, u_p, u_best)
            nu_best = jnp.where(better, nu, nu_best)
            bad_best = jnp.minimum(bad_r, bad_best)
            act_u = (mask_u & (nu + rho * (cu_p - ub_c) > 0)) | eq
            act_l = (mask_l & (-nu + rho * (lb_c - cu_p) > 0) & ~act_u) | eq
        # guard: accept the best polished lane only if finite and it does
        # not violate any constraint (else keep the IP iterate)
        ok = ((bad_best <= 10.0 * scfg.polish_tol)
              & jnp.all(jnp.isfinite(u_best), axis=(1, 2)))[:, None, None]
        u = jnp.where(ok, u_best, u)
        lam_eff = jnp.where(ok, nu_best, lam_eff)

    # --- final residuals: dual residual via the adjoint sweep ---
    cu = apply_c(u)
    xs = rollout(u)
    q_lin = q2[:, None, :] * (xs - xd)
    q_sc = jnp.moveaxis(q_lin, 1, 0)

    def adj(nu, q_km1):
        return _mm('bji,bj->bi', a, nu) + q_km1, nu

    q_shift = jnp.concatenate([jnp.zeros_like(q_sc[:1]), q_sc[:-1]], axis=0)
    _, nus = jax.lax.scan(adj, q_sc[-1], jnp.flip(q_shift, 0))
    nus = jnp.flip(nus, 0)                                # nu_{k+1} per stage
    bt_nu = _mm('hbji,hbj->hbi', b_sc, nus)
    r_d = (r2[:, None, :] * u + jnp.moveaxis(bt_nu, 0, 1)
           + apply_ct(lam_eff))
    r_pl = jnp.where(mask_l, jnp.maximum(lb_c - cu, 0.0), 0.0)
    r_pu = jnp.where(mask_u, jnp.maximum(cu - ub_c, 0.0), 0.0)
    mu = (jnp.sum(s_l * lam_l * mask_l, axis=(1, 2))
          + jnp.sum(s_u * lam_u * mask_u, axis=(1, 2))) / n_act
    return QPSolution(
        u=u.reshape(bsz, h * 12), mu=mu,
        r_dual=jnp.max(jnp.abs(r_d), axis=(1, 2)),
        r_prim=jnp.maximum(jnp.max(r_pl, axis=(1, 2)),
                           jnp.max(r_pu, axis=(1, 2))))


def make_solver(scfg: SolverConfig = SolverConfig()):
    """Unbatched-callable stage-form solver; vmap routes the whole batch
    into one solve_batched call (same pattern as pdip.make_solver)."""

    @jax.custom_batching.custom_vmap
    def solve_one(sqp: StageQPData) -> QPSolution:
        sqp1 = jax.tree.map(lambda x: x[None], sqp)
        sol = solve_batched(sqp1, scfg)
        return jax.tree.map(lambda x: x[0], sol)

    @solve_one.def_vmap
    def _rule(axis_size, in_batched, sqp):
        in_batched = in_batched[0] if isinstance(in_batched, (list, tuple)) \
            else in_batched
        sqp_b = jax.tree.map(
            lambda x, bt: x if bt else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape),
            sqp, in_batched)
        sol = solve_batched(sqp_b, scfg)
        return sol, jax.tree.map(lambda _: True, sol)

    return solve_one


def solve(sqp: StageQPData, scfg: SolverConfig = SolverConfig()
          ) -> QPSolution:
    """Single-problem convenience wrapper."""
    return make_solver(scfg)(sqp)
