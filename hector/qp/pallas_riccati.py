"""Fused Pallas TPU kernel: the ENTIRE stage-wise Riccati interior-point
solve in one kernel, batch-minor, VMEM-resident.

Why this exists (see hector/qp/riccati.py for the math): the stage-form
solver eliminates condensing and the dense 120x120 KKT, but as pure JAX its
~1500 tiny batched ops per solve are dispatch- and HBM-bound on TPU (each
(B,12,13) matmul round-trips HBM).  This kernel runs the complete
fixed-centering interior-point loop -- rollout, barrier weights, backward
Riccati sweep, forward rollout, step sizes, iterate updates -- for a tile of
SUB*LANE = 1024 scenarios without touching HBM: total HBM traffic per solve
is one read of the ~3.6 KB/scenario problem data and one write of the
solution.

Layout: every per-scenario scalar is an (8, 128) slab (sublane x lane), so
each scalar operation of the textbook algorithms is one full-width VPU op
across 1024 scenarios -- no MXU (matrices differ per lane; there is nothing
to share), no padding waste (matrix dims 12/13/16 live as *leading* array
dims, i.e. separate slabs, not as padded sublanes).

Structure exploited (vs the generic 13x13/13x12 dense matmuls):

- A = I + dt*Ac is sparse: rows 0:3 couple to cols 6:9 through the
  euler-rate block, rows 3:6 to cols 9:12 through dt*I, row 11 to col 12
  through -dt (gravity); srbd.ct_dynamics / SolverMPC.cpp:312-331.
- B is nonzero only in rows 6:12: rows 6:9 dense (I^-1 [r_i]x and I^-1
  blocks), rows 9:12 the two dt/m diagonals.
- Swing masking B_k = B diag(m_k) is a row scale of B^T products.
- The backward sweep stores ONLY the feedback gain K_k = Re_k^{-1} G_k and
  feedforward kff_k per stage (6.9 MB/tile): the Cholesky factor L_k and
  W_k = L_k^{-1} G_k are consumed in-stage via the identities
  G_k^T Re_k^{-1} G_k = W_k^T W_k and G_k^T kff_k = W_k^T z_k
  (z_k = L_k^{-1} beta_k), so nothing else persists.

The interior-point mechanics mirror riccati.solve_batched with
mehrotra=False (single corrected step, sigma = scfg.sigma_fixed): float32
converges to its ~6-8 mN accuracy floor by ~14 iterations on the Hector QP
family (tests/test_riccati.py), matching the dense float32 solver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SolverConfig
from .pdip import QPSolution
from .riccati import StageQPData

SUB = 8
LANE = 128
TILE = SUB * LANE
H = 10      # horizon / gait segments (GaitGenerator ctor; SolverMPC h=10)
NX = 13     # state dim  [rpy, p, omega, v, g] (SolverMPC.cpp:420)
NU = 12     # input dim  [F_L, F_R, M_L, M_R]
NC = 16     # constraint rows per stage (SolverMPC.cpp:511-555)


def _kernel(s69_ref, scal_ref, b69_ref, c_ref, um_ref, x0_ref, xd_ref,
            lb_ref, ub_ref, u_out, stats_out, *, q2, r2, reg, scfg_s):
    u, stats = _solve_tile(
        s69_ref[0], scal_ref[0], b69_ref[0], c_ref[0], um_ref[0], x0_ref[0],
        xd_ref[0], lb_ref[0], ub_ref[0], q2=q2, r2=r2, reg=reg,
        scfg_s=scfg_s)
    u_out[0] = u
    stats_out[0] = stats


def _solve_tile(s69, scal, b69, cm, umask, x0, xd, lb, ub,
                *, q2, r2, reg, scfg_s):
    """One tile's complete interior-point solve as a pure array function.

    Shapes as documented in _kernel; the trailing two dims are the
    (sublane, lane) batch tile.  Separated from the pallas plumbing so tests
    can execute the exact kernel computation under plain XLA.
    """
    (iters, sigma, frac, big, init_slack, init_dual,
     pol_rounds, pol_iters, pol_rho, pol_tol) = scfg_s
    f32 = jnp.float32
    # the objective carries the reference's factor 2 (H = 2(B'SB+alpha),
    # SolverMPC.cpp:569); fold it into the static weights once, exactly as
    # riccati.solve_batched does with q2/r2
    q2 = tuple(2.0 * float(v) for v in q2)
    r2 = tuple(2.0 * float(v) for v in r2)

    dtl = scal[0]             # (S, L)         dt (= Acd[3,9])
    a1112 = scal[1]           # (S, L)         Acd[11,12] = -dt
    em = scal[2]              # (S, L)         dt/m (= Bcd[9,0])

    # Full-row masks (used by the polish and final-residual sections)
    mask_l = lb > -big
    mask_u = ub < big
    fl = mask_l.astype(f32)
    fu = mask_u.astype(f32)
    lb_c = lb * fl
    ub_c = ub * fu

    # One-sided row specialization for the IP loop (r4 harvest item): the
    # bound STRUCTURE is static (constraints.py) -- a lower bound can only
    # ever be finite on the friction/Mx/Fz rows {0..4, 7} of each leg, an
    # upper bound only on the Mx/line-contact/Fz rows {4..7}; the other
    # side is BIG/deactivated always (incl. swing and padded lanes).  The
    # barrier state therefore lives on 12 lower + 8 upper rows instead of
    # 2 x 16, cutting the per-iteration slack/dual/step bookkeeping by
    # ~40% with bit-identical math (dead rows contributed exactly zero).
    LR = (0, 1, 2, 3, 4, 7, 8, 9, 10, 11, 12, 15)
    UR = (4, 5, 6, 7, 12, 13, 14, 15)
    NL_, NU_ = len(LR), len(UR)
    _li = {r: i for i, r in enumerate(LR)}
    _ui = {r: i for i, r in enumerate(UR)}

    def take_rows(x, rs):
        """(H, NC, S, L) -> (H, len(rs), S, L), static row slices."""
        return jnp.stack([x[:, r] for r in rs], axis=1)

    def full_rows(x_l, x_u):
        """Scatter side arrays back to the full (H, NC, S, L) layout."""
        out = []
        for r in range(NC):
            if r in _li and r in _ui:
                out.append(x_l[:, _li[r]] + x_u[:, _ui[r]])
            elif r in _li:
                out.append(x_l[:, _li[r]])
            else:
                out.append(x_u[:, _ui[r]])
        return jnp.stack(out, axis=1)

    mask_lr = take_rows(mask_l, LR)
    mask_ur = take_rows(mask_u, UR)
    flr = mask_lr.astype(f32)
    fur = mask_ur.astype(f32)
    lb_r = take_rows(lb_c, LR)
    ub_r = take_rows(ub_c, UR)
    n_act = jnp.maximum(
        jnp.sum(flr, axis=(0, 1)) + jnp.sum(fur, axis=(0, 1)), 1.0)

    eps = jnp.finfo(f32).eps
    # with polish the IP runs to its clamp-limited stall point (the active
    # set is identified there); the mu freeze would stop one decade early
    mu_floor = 0.0 if pol_rounds > 0 else 10.0 * eps
    s_floor = 10.0 * eps
    d_cap = 0.1 / eps
    sl_cap = 1e8

    # ---- sparse-structure helpers (all on (dim, S, L) stacks) ----

    def amatvec(x):
        """y = Acd x."""
        y = [x[i] for i in range(NX)]
        for r in range(3):
            y[r] = y[r] + (s69[r][0] * x[6] + s69[r][1] * x[7]
                           + s69[r][2] * x[8])
            y[3 + r] = y[3 + r] + dtl * x[9 + r]
        y[11] = y[11] + a1112 * x[12]
        return jnp.stack(y)

    def atmatvec(x):
        """y = Acd^T x."""
        y = [x[i] for i in range(NX)]
        for c in range(3):
            y[6 + c] = y[6 + c] + (s69[0][c] * x[0] + s69[1][c] * x[1]
                                   + s69[2][c] * x[2])
            y[9 + c] = y[9 + c] + dtl * x[3 + c]
        y[12] = y[12] + a1112 * x[11]
        return jnp.stack(y)

    def bmatvec(mk, du):
        """y = (Bcd diag(mk)) du; mk (NU,S,L) stage mask, du (NU,S,L)."""
        dum = du * mk
        y = [jnp.zeros_like(x0[0]) for _ in range(NX)]
        for r in range(3):
            y[6 + r] = jnp.sum(b69[r] * dum, axis=0)
        for a in range(3):
            y[9 + a] = em * (dum[a] + dum[3 + a])
        return jnp.stack(y)

    def btmatvec(mk, p):
        """y = diag(mk) Bcd^T p -> (NU, S, L)."""
        out = []
        for i in range(NU):
            acc = (b69[0][i] * p[6] + b69[1][i] * p[7] + b69[2][i] * p[8])
            if i < 6:
                acc = acc + em * p[9 + (i % 3)]
            out.append(acc)
        return jnp.stack(out) * mk

    # Mosaic lowers middle-axis integer indexing to (unsupported) gathers,
    # so every access below indexes leading axes only; C columns are
    # pre-assembled once from leading-axis slices.
    cm_rows = [cm[r] for r in range(NC)]                  # (NU, S, L) each
    cm_cols = [jnp.stack([cm_rows[r][j] for r in range(NC)])
               for j in range(NU)]                        # (NC, S, L) each

    def apply_c(u):
        """(H,NU,S,L) -> (H,NC,S,L): per-stage C u."""
        out = []
        for k in range(H):
            uk = u[k]
            acc = uk[0][None] * cm_cols[0]
            for j in range(1, NU):
                acc = acc + uk[j][None] * cm_cols[j]
            out.append(acc)
        return jnp.stack(out)

    def apply_ct(y):
        """(H,NC,S,L) -> (H,NU,S,L): per-stage C^T y."""
        out = []
        for k in range(H):
            yk = y[k]
            acc = yk[0][None] * cm_rows[0]
            for r in range(1, NC):
                acc = acc + yk[r][None] * cm_rows[r]
            out.append(acc)
        return jnp.stack(out)

    def rollout(u):
        """x_1..x_h under u -> (H, NX, S, L)."""
        x = x0
        xs = []
        for k in range(H):
            x = amatvec(x) + bmatvec(umask[k], u[k])
            xs.append(x)
        return jnp.stack(xs)

    q2_arr = [jnp.full_like(x0[0], q2[i]) for i in range(NX)]
    q2_vec = jnp.stack(q2_arr)                            # (NX, S, L)
    q2_diag_mat = jnp.stack(
        [jnp.stack([q2_arr[i] if i == j else jnp.zeros_like(x0[0])
                    for j in range(NX)]) for i in range(NX)])

    def newton_dir(d_row, q_lin, r_lin):
        """One LQR solve: backward Riccati sweep + forward rollout.

        d_row (H,NC,S,L) barrier weights; q_lin (H,NX,S,L); r_lin
        (H,NU,S,L).  Returns du (H,NU,S,L).
        """
        # P, p initialized at the terminal stage
        p_mat = q2_diag_mat
        p_vec = q_lin[H - 1]
        ks = [None] * H
        kffs = [None] * H

        for k in range(H - 1, -1, -1):
            mk = umask[k]
            # masked B columns, hoisted (recomputing b69[r][j]*mk[j] inside
            # the Re row loop costs NU x the slabs it needs)
            bm = [[b69[r][j] * mk[j] for j in range(NU)] for r in range(3)]
            em_m = [em * mk[a] for a in range(6)]
            # rq = C^T D C + diag(r2 + reg), exploiting the 2-leg column
            # blocks (leg rows touch only that leg's F and M columns) AND
            # symmetry: only the lower triangle is ever read (Cholesky),
            # so only ci >= cj pairs are formed (r4 harvest item)
            dk = d_row[k]
            rq = [[None] * NU for _ in range(NU)]
            for leg in range(2):
                rows = range(8 * leg, 8 * leg + 8)
                cols = ([0, 1, 2, 6, 7, 8] if leg == 0
                        else [3, 4, 5, 9, 10, 11])
                for a_i, ci in enumerate(cols):
                    for cj in cols[:a_i + 1]:
                        acc = None
                        for r in rows:
                            t = (dk[r] * cm_rows[r][ci]) * cm_rows[r][cj]
                            acc = t if acc is None else acc + t
                        rq[ci][cj] = acc
            zero = jnp.zeros_like(x0[0])
            for i in range(NU):
                for j in range(i + 1):
                    if rq[i][j] is None:
                        rq[i][j] = zero
                rq[i][i] = rq[i][i] + (r2[i] + reg)

            # bp = diag(mk) Bcd^T P  (NU rows of (NX,S,L))
            bp = []
            for i in range(NU):
                acc = (b69[0][i][None] * p_mat[6] + b69[1][i][None] * p_mat[7]
                       + b69[2][i][None] * p_mat[8])
                if i < 6:
                    acc = acc + em[None] * p_mat[9 + (i % 3)]
                bp.append(acc * mk[i][None])

            # Re = rq + bp (Bcd diag(mk)): lower triangle only (the
            # Cholesky below reads re_rows[i][j] for j <= i exclusively)
            re_rows = []
            for i in range(NU):
                row = [rq[i][j] for j in range(i + 1)] + [None] * (NU - i - 1)
                for r in range(3):
                    for j in range(i + 1):
                        row[j] = row[j] + bp[i][6 + r] * bm[r][j]
                for a in range(3):
                    if a <= i:
                        row[a] = row[a] + bp[i][9 + a] * em_m[a]
                    if 3 + a <= i:
                        row[3 + a] = row[3 + a] + bp[i][9 + a] * em_m[3 + a]
                re_rows.append(row)

            # Cholesky of Re (NU x NU of slabs), lower L + reciprocal diag
            ell = [[None] * NU for _ in range(NU)]
            rinv = [None] * NU
            for j in range(NU):
                pivot = re_rows[j][j]
                for t in range(j):
                    pivot = pivot - ell[j][t] * ell[j][t]
                ljj = jnp.sqrt(jnp.maximum(pivot, 1e-30))
                rinv[j] = 1.0 / ljj
                ell[j][j] = ljj
                for i in range(j + 1, NU):
                    v = re_rows[i][j]
                    for t in range(j):
                        v = v - ell[i][t] * ell[j][t]
                    ell[i][j] = v * rinv[j]

            # G = bp Acd  (NU rows of (NX,S,L)), sparse A
            gs = []
            for i in range(NU):
                g = [bp[i][m] for m in range(NX)]
                for c in range(3):
                    g[6 + c] = g[6 + c] + (s69[0][c] * bp[i][0]
                                           + s69[1][c] * bp[i][1]
                                           + s69[2][c] * bp[i][2])
                    g[9 + c] = g[9 + c] + dtl * bp[i][3 + c]
                g[12] = g[12] + a1112 * bp[i][11]
                gs.append(jnp.stack(g))

            # W = L^-1 G (forward substitution on rows)
            w = []
            for i in range(NU):
                v = gs[i]
                for t in range(i):
                    v = v - ell[i][t][None] * w[t]
                w.append(v * rinv[i][None])

            # beta = r_lin + B_m^T p ; z = L^-1 beta
            beta = btmatvec(mk, p_vec) + r_lin[k]
            z = []
            for i in range(NU):
                v = beta[i]
                for t in range(i):
                    v = v - ell[i][t] * z[t]
                z.append(v * rinv[i])

            # K = L^-T W, kff = L^-T z (back substitution)
            kk = [None] * NU
            kf = [None] * NU
            for i in range(NU - 1, -1, -1):
                vk = w[i]
                vf = z[i]
                for t in range(i + 1, NU):
                    vk = vk - ell[t][i][None] * kk[t]
                    vf = vf - ell[t][i] * kf[t]
                kk[i] = vk * rinv[i][None]
                kf[i] = vf * rinv[i]
            ks[k] = jnp.stack(kk)          # (NU, NX, S, L)
            kffs[k] = jnp.stack(kf)        # (NU, S, L)

            # p_new = A^T p - W^T z + q_lin[k-1]
            wz = None
            for i in range(NU):
                t = z[i][None] * w[i]
                wz = t if wz is None else wz + t
            p_vec = atmatvec(p_vec) - wz
            if k >= 1:
                p_vec = p_vec + q_lin[k - 1]

            # P_new = diag(q2) + A^T P A - W^T W.  W^T W is symmetric: only
            # its lower triangle is formed (91 of 169 slab products), the
            # upper mirrored by ALIASING the same slabs into the stacked
            # layout (r4 harvest item; saves ~45% of the P-update FMAs)
            m_pa = amat_cols(p_mat)
            m_apa = atmat_rows(m_pa)
            ww_tri = [[None] * (a + 1) for a in range(NX)]
            for i in range(NU):
                wi = w[i]
                for a in range(NX):
                    wa = wi[a]
                    for b in range(a + 1):
                        t = wa * wi[b]
                        ww_tri[a][b] = (t if ww_tri[a][b] is None
                                        else ww_tri[a][b] + t)
            ww = jnp.stack(
                [jnp.stack([ww_tri[a][b] if b <= a else ww_tri[b][a]
                            for b in range(NX)]) for a in range(NX)])
            # + diag(q2) without scatter (Mosaic has no scatter-add)
            p_mat = m_apa - ww + q2_diag_mat

        # forward rollout
        dx = jnp.zeros_like(x0)
        dus = []
        for k in range(H):
            kd = jnp.sum(ks[k] * dx[None, :], axis=1)     # (NU, S, L)
            du = -(kd + kffs[k])
            dus.append(du)
            dx = amatvec(dx) + bmatvec(umask[k], du)
        return jnp.stack(dus)

    def amat_cols(p_mat):
        """Y = Acd^T P as rows.  p_mat (NX,NX,S,L) must be SYMMETRIC
        (every Riccati P is): Y[j,:] = sum_m Acd[m,j] P[m,:], and all
        indexing stays on the leading axis (Mosaic has no >2D gather)."""
        m = [p_mat[j] for j in range(NX)]
        for c in range(3):
            m[6 + c] = m[6 + c] + (p_mat[0] * s69[0][c][None]
                                   + p_mat[1] * s69[1][c][None]
                                   + p_mat[2] * s69[2][c][None])
            m[9 + c] = m[9 + c] + dtl[None] * p_mat[3 + c]
        m[12] = m[12] + a1112[None] * p_mat[11]
        return jnp.stack(m)

    def atmat_rows(y_mat):
        """Given Y = Acd^T P as rows (from amat_cols), return N = Y Acd.

        Row i of Y Acd is (Y[i,:] Acd) = Acd^T applied to the row vector,
        i.e. the same sparse update as atmatvec, per row."""
        n = []
        for i in range(NX):
            yi = y_mat[i]                                  # (NX, S, L)
            r = [yi[m] for m in range(NX)]
            for c in range(3):
                r[6 + c] = r[6 + c] + (s69[0][c] * yi[0]
                                       + s69[1][c] * yi[1]
                                       + s69[2][c] * yi[2])
                r[9 + c] = r[9 + c] + dtl * yi[3 + c]
            r[12] = r[12] + a1112 * yi[11]
            n.append(jnp.stack(r))
        return jnp.stack(n)

    def alpha_max(s, ds, fmask, fr):
        ratios = jnp.where((fmask > 0) & (ds < 0),
                           s / jnp.maximum(-ds, 1e-30), jnp.inf)
        return jnp.minimum(1.0, fr * jnp.min(ratios, axis=(0, 1)))

    # ---- initialization (same policy as riccati.solve_batched) ----
    zero_u = jnp.zeros((H, NU) + x0.shape[1:], f32)
    zero_d = jnp.zeros((H, NC) + x0.shape[1:], f32)
    xs0 = rollout(zero_u)
    q_lin0 = (xs0 - xd) * q2_vec[None]
    u_unc = newton_dir(zero_d, q_lin0, zero_u[:, :NU])
    cu0 = apply_c(u_unc)
    cu0_l = take_rows(cu0, LR)
    cu0_u = take_rows(cu0, UR)
    sh_l = jnp.where(mask_lr, cu0_l - lb_r, 1.0)
    sh_u = jnp.where(mask_ur, ub_r - cu0_u, 1.0)
    s_min = jnp.minimum(
        jnp.min(jnp.where(mask_lr, sh_l, jnp.inf), axis=(0, 1)),
        jnp.min(jnp.where(mask_ur, sh_u, jnp.inf), axis=(0, 1)))
    shift = (init_slack + jnp.maximum(0.0, -1.5 * s_min))[None, None]
    sl = jnp.where(mask_lr, sh_l + shift, 1.0)
    su = jnp.where(mask_ur, sh_u + shift, 1.0)
    ll = jnp.where(mask_lr, init_dual / sl, 0.0)
    lu = jnp.where(mask_ur, init_dual / su, 0.0)
    u = zero_u
    # loop-invariant: R diagonal as a column stack (hoisted -- rebuilt
    # per iteration it materializes NU constant slabs every pass)
    r2_col = jnp.stack([jnp.full_like(x0[0], r2[i]) for i in range(NU)])

    def body(_, carry):
        u, s_l, lam_l, s_u, lam_u = carry
        cu = apply_c(u)
        cu_l = take_rows(cu, LR)
        cu_u = take_rows(cu, UR)
        xs = rollout(u)
        q_lin = (xs - xd) * q2_vec[None]
        r_pl = jnp.where(mask_lr, cu_l - lb_r - s_l, 0.0)
        r_pu = jnp.where(mask_ur, ub_r - cu_u - s_u, 0.0)
        # one reciprocal per bound side; everything downstream multiplies
        # (divides run on the VPU slow path at ~1/15 FMA throughput --
        # perf/parts/cycle_accounting.json)
        inv_sl = 1.0 / jnp.maximum(s_l, s_floor)
        inv_su = 1.0 / jnp.maximum(s_u, s_floor)
        d_l = jnp.where(mask_lr, jnp.minimum(lam_l * inv_sl, d_cap), 0.0)
        d_u = jnp.where(mask_ur, jnp.minimum(lam_u * inv_su, d_cap), 0.0)
        mu = (jnp.sum(s_l * lam_l * flr, axis=(0, 1))
              + jnp.sum(s_u * lam_u * fur, axis=(0, 1))) / n_act

        smu = (sigma * mu)[None, None]
        tls = jnp.where(mask_lr, smu * inv_sl, 0.0)
        tus = jnp.where(mask_ur, smu * inv_su, 0.0)

        # C^T arg = (lam_u - lam_l) + v with
        # v = tus - tls - (lam_u - lam_l) - d_u r_pu + d_l r_pl,
        # i.e. the (lam_u - lam_l) terms cancel exactly:
        arg_l = d_l * r_pl - tls
        arg_u = tus - d_u * r_pu
        r_lin = r2_col[None] * u + apply_ct(full_rows(arg_l, arg_u))

        du = newton_dir(full_rows(d_l, d_u), q_lin, r_lin)
        cdu = apply_c(du)
        cdu_l = take_rows(cdu, LR)
        cdu_u = take_rows(cdu, UR)
        ds_l = jnp.where(mask_lr, cdu_l + r_pl, 0.0)
        ds_u = jnp.where(mask_ur, -cdu_u + r_pu, 0.0)
        dl_l = jnp.where(mask_lr,
                         tls - lam_l - d_l * (cdu_l + r_pl), 0.0)
        dl_u = jnp.where(mask_ur,
                         tus - lam_u - d_u * (-cdu_u + r_pu), 0.0)

        # primal steps via the ALREADY-COMPUTED slack reciprocals: alpha =
        # min(1, frac min_i s_i/(-ds_i)) = min(1, frac / max_i (-ds_i)/s_i)
        # -- one divide per side instead of one per row (the dual side has
        # no precomputed reciprocal, so it keeps the ratio form)
        rate_p = jnp.maximum(
            jnp.max(jnp.where(mask_lr & (ds_l < 0), -ds_l * inv_sl, 0.0),
                    axis=(0, 1)),
            jnp.max(jnp.where(mask_ur & (ds_u < 0), -ds_u * inv_su, 0.0),
                    axis=(0, 1)))
        a_p = (frac / jnp.maximum(rate_p, frac))[None, None]
        a_d = jnp.minimum(alpha_max(lam_l, dl_l, flr, frac),
                          alpha_max(lam_u, dl_u, fur, frac))[None, None]

        finite = (jnp.all(jnp.isfinite(du), axis=(0, 1))
                  & jnp.all(jnp.isfinite(ds_l) & jnp.isfinite(dl_l),
                            axis=(0, 1))
                  & jnp.all(jnp.isfinite(ds_u) & jnp.isfinite(dl_u),
                            axis=(0, 1)))[None, None]
        a_p = jnp.where(finite, a_p, 0.0)
        a_d = jnp.where(finite, a_d, 0.0)

        skip = (mu < mu_floor)[None, None] | ~finite
        u_n = jnp.where(skip, u, u + a_p * du)
        s_l_n = jnp.where(skip | ~mask_lr, s_l,
                          jnp.clip(s_l + a_p * ds_l, 0.0, sl_cap))
        s_u_n = jnp.where(skip | ~mask_ur, s_u,
                          jnp.clip(s_u + a_p * ds_u, 0.0, sl_cap))
        lam_l_n = jnp.where(skip | ~mask_lr, lam_l,
                            jnp.clip(lam_l + a_d * dl_l, 0.0, sl_cap))
        lam_u_n = jnp.where(skip | ~mask_ur, lam_u,
                            jnp.clip(lam_u + a_d * dl_u, 0.0, sl_cap))
        return (u_n, s_l_n, lam_l_n, s_u_n, lam_u_n)

    # unroll=False: Mosaic's fori lowering supports only rolled or FULLY
    # unrolled loops, and a 14x body blows the (already 10-20 min)
    # kernel compile budget for at best a few-percent loop-overhead win
    u, s_l, lam_l, s_u, lam_u = jax.lax.fori_loop(
        0, iters, body, (u, sl, ll, su, lu), unroll=False)
    # side -> full-row signed multipliers for the residual/polish sections
    lam_row = full_rows(-lam_l, lam_u)

    if pol_rounds > 0:
        # ---- primal-dual active-set polish (mirrors the
        # riccati.solve_batched polish block; see its comments for the
        # method and the KKT merit).  Rounds and inner AL iterations run
        # in ONE rolled fori loop (one newton_dir body, compile-budget
        # friendly); the PDAS set re-estimation and best-of-rounds merit
        # tracking fire on inner-loop boundaries via a traced predicate.
        # eq rows (lb == ub, the swing-leg zero rows) stay active always.
        feq = fl * fu * (ub_c - lb_c < 1e-12).astype(f32)
        nu0 = lam_row
        cu0p = apply_c(u)

        def estimate(nu_e, cu_e, a_u_prev_unused=None):
            t_u = nu_e + pol_rho * (cu_e - ub_c)
            t_l = -nu_e + pol_rho * (lb_c - cu_e)
            a_u = jnp.maximum(fu * (t_u > 0).astype(f32), feq)
            a_l = jnp.maximum(
                fl * (t_l > 0).astype(f32) * (1.0 - a_u), feq)
            return a_l, a_u

        a_l0, a_u0 = estimate(nu0, cu0p)
        nu0 = jnp.maximum(a_l0, a_u0) * nu0
        inf_sl = jnp.full(x0.shape[1:], jnp.inf, f32)

        def pol_body(t, carry):
            u_p, nu, a_l, a_u, u_b, nu_b, bad_b = carry
            act = jnp.maximum(a_l, a_u)
            # lower-active (and eq) rows target lb; upper-active rows ub
            low = jnp.maximum(a_l * (1.0 - a_u), feq)
            bnd = low * lb_c + (1.0 - low) * a_u * ub_c
            xs_p = rollout(u_p)
            q_lin_p = (xs_p - xd) * q2_vec[None]
            cu_p = apply_c(u_p)
            viol = act * (cu_p - bnd)
            r_lin_p = r2_col[None] * u_p + apply_ct(nu + pol_rho * viol)
            du_p = newton_dir(pol_rho * act, q_lin_p, r_lin_p)
            fin = jnp.all(jnp.isfinite(du_p), axis=(0, 1))[None, None]
            u_p = jnp.where(fin, u_p + du_p, u_p)
            cu_p = apply_c(u_p)
            nu = act * (nu + pol_rho * (cu_p - bnd))

            round_end = jnp.equal(jax.lax.rem(t + 1, pol_iters), 0)
            # merit = max(primal violation, wrong-sign multiplier / 10)
            bad_p = jnp.max(jnp.maximum(fl * (lb_c - cu_p),
                                        fu * (cu_p - ub_c)), axis=(0, 1))
            wrong = jnp.max(jnp.maximum(
                a_u * (1.0 - feq) * jnp.maximum(-nu, 0.0),
                low * (1.0 - feq) * jnp.maximum(nu, 0.0)), axis=(0, 1))
            bad_r = jnp.where(jnp.all(jnp.isfinite(u_p), axis=(0, 1)),
                              jnp.maximum(bad_p, 0.1 * wrong), jnp.inf)
            better = (round_end & (bad_r < bad_b))[None, None]
            u_b = jnp.where(better, u_p, u_b)
            nu_b = jnp.where(better, nu, nu_b)
            bad_b = jnp.where(round_end, jnp.minimum(bad_r, bad_b), bad_b)
            # PDAS set re-estimation between rounds
            a_l_n, a_u_n = estimate(nu, cu_p)
            a_l = jnp.where(round_end, a_l_n, a_l)
            a_u = jnp.where(round_end, a_u_n, a_u)
            return u_p, nu, a_l, a_u, u_b, nu_b, bad_b

        _, _, _, _, u_b, nu_b, bad_b = jax.lax.fori_loop(
            0, pol_rounds * pol_iters, pol_body,
            (u, nu0, a_l0, a_u0, u, nu0, inf_sl), unroll=False)
        # accept per lane only at small KKT merit (else keep the IP
        # iterate -- the graceful-degradation fallback)
        ok = ((bad_b <= 10.0 * pol_tol)
              & jnp.all(jnp.isfinite(u_b), axis=(0, 1)))[None, None]
        u = jnp.where(ok, u_b, u)
        lam_row = jnp.where(ok, nu_b, lam_row)

    # ---- final residuals ----
    cu = apply_c(u)
    xs = rollout(u)
    q_lin = (xs - xd) * q2_vec[None]
    # adjoint sweep for the dual residual
    nu_vec = q_lin[H - 1]
    r_d_max = jnp.zeros_like(x0[0])
    ct_dl = apply_ct(lam_row)
    for k in range(H - 1, -1, -1):
        r_d_k = (r2_col * u[k] + btmatvec(umask[k], nu_vec) + ct_dl[k])
        r_d_max = jnp.maximum(r_d_max, jnp.max(jnp.abs(r_d_k), axis=0))
        if k >= 1:
            nu_vec = atmatvec(nu_vec) + q_lin[k - 1]
    r_pl = jnp.where(mask_l, jnp.maximum(lb_c - cu, 0.0), 0.0)
    r_pu = jnp.where(mask_u, jnp.maximum(cu - ub_c, 0.0), 0.0)
    mu = (jnp.sum(s_l * lam_l * flr, axis=(0, 1))
          + jnp.sum(s_u * lam_u * fur, axis=(0, 1))) / n_act
    r_prim = jnp.maximum(jnp.max(r_pl, axis=(0, 1)),
                         jnp.max(r_pu, axis=(0, 1)))
    return u, jnp.stack([mu, r_d_max, r_prim])


def _to_tiles(x, bsz, n_tiles):
    """(B, ...) -> (n_tiles, ..., SUB, LANE) with zero padding."""
    pad = n_tiles * TILE - bsz
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    x = x.reshape((n_tiles, SUB, LANE) + x.shape[1:])
    return jnp.moveaxis(x, (1, 2), (-2, -1))


def _from_tiles(x, bsz):
    """(n_tiles, ..., SUB, LANE) -> (B, ...)."""
    x = jnp.moveaxis(x, (-2, -1), (1, 2))
    x = x.reshape((-1,) + x.shape[3:])
    return x[:bsz]


@functools.partial(jax.jit, static_argnames=(
    "q2", "r2", "scfg", "interpret"))
def _solve_tiles(s69, scal, b69, cmat, umask, x0, xd, lb, ub,
                 *, q2, r2, scfg: SolverConfig, interpret: bool):
    n_tiles = s69.shape[0]
    sl_shape = s69.shape[-2:]
    scfg_s = (scfg.iterations, float(scfg.sigma_fixed),
              float(scfg.frac_to_boundary), float(scfg.big_threshold),
              float(scfg.init_slack), float(scfg.init_dual),
              int(scfg.polish_rounds), int(scfg.polish_iters),
              float(scfg.polish_rho), float(scfg.polish_tol))
    kern = functools.partial(
        _kernel, q2=q2, r2=r2, reg=float(scfg.kkt_reg), scfg_s=scfg_s)
    spec = lambda *dims: pl.BlockSpec(
        (1,) + dims + sl_shape,
        lambda i: (i,) + (0,) * (len(dims) + 2),
        memory_space=pltpu.VMEM if not interpret else None)
    u_t, stats_t = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, H, NU) + sl_shape, jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 3) + sl_shape, jnp.float32),
        ],
        grid=(n_tiles,),
        in_specs=[
            spec(3, 3), spec(3), spec(3, NU), spec(NC, NU), spec(H, NU),
            spec(NX), spec(H, NX), spec(H, NC), spec(H, NC),
        ],
        out_specs=[spec(H, NU), spec(3)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(s69, scal, b69, cmat, umask, x0, xd, lb, ub)
    return u_t, stats_t


def solve_batched(sqp: StageQPData, scfg: SolverConfig = SolverConfig(),
                  q_diag=None, r_diag=None, interpret: bool = False
                  ) -> QPSolution:
    """Solve a batch of stage-form Hector MPC QPs with the fused kernel.

    q_diag / r_diag must be STATIC (python tuples) when called under jit
    (they parameterize the kernel); if None they are concretized from
    sqp.q_diag / sqp.r_diag (works eagerly).
    """
    a_dt, b_dt, u_mask, x0, xd, qd, rd, c_blk, lb, ub = sqp
    if q_diag is None:
        q_diag = tuple(np.asarray(qd).reshape(-1)[-NX:].tolist())
    if r_diag is None:
        r_diag = tuple(np.asarray(rd).reshape(-1)[-NU:].tolist())

    s69 = a_dt[:, 0:3, 6:9]
    scal = jnp.stack([a_dt[:, 3, 9], a_dt[:, 11, 12], b_dt[:, 9, 0]],
                     axis=1)
    b69 = b_dt[:, 6:9, :]
    return _solve_from_parts(s69, scal, b69, u_mask, x0, xd, c_blk, lb, ub,
                             scfg=scfg, q_diag=q_diag, r_diag=r_diag,
                             interpret=interpret)


def _solve_from_parts(s69, scal, b69, u_mask, x0, xd, c_blk, lb, ub, *,
                      scfg, q_diag, r_diag, interpret) -> QPSolution:
    bsz = x0.shape[0]
    n_tiles = -(-bsz // TILE)
    f32 = jnp.float32
    tiles = [_to_tiles(x, bsz, n_tiles) for x in (
        s69.astype(f32), scal.astype(f32), b69.astype(f32),
        c_blk.astype(f32), u_mask.astype(f32),
        x0.astype(f32), xd.astype(f32), lb.astype(f32), ub.astype(f32))]
    # padded lanes: fully deactivated rows (lb=-2big < -big masks them)
    if n_tiles * TILE != bsz:
        big2 = 2.0 * scfg.big_threshold
        lane = jax.lax.broadcasted_iota(
            jnp.int32, tiles[7].shape, tiles[7].ndim - 2) * LANE \
            + jax.lax.broadcasted_iota(jnp.int32, tiles[7].shape,
                                       tiles[7].ndim - 1)
        tile_idx = jax.lax.broadcasted_iota(jnp.int32, tiles[7].shape, 0)
        flat = tile_idx * TILE + lane
        tiles[7] = jnp.where(flat >= bsz, -big2, tiles[7])
        tiles[8] = jnp.where(flat >= bsz, big2, tiles[8])

    u_t, stats_t = _solve_tiles(
        *tiles, q2=q_diag, r2=r_diag, scfg=scfg, interpret=interpret)
    u = _from_tiles(u_t, bsz).reshape(bsz, H * NU).astype(x0.dtype)
    stats = _from_tiles(stats_t, bsz).astype(x0.dtype)
    return QPSolution(u=u, mu=stats[:, 0], r_dual=stats[:, 1],
                      r_prim=stats[:, 2])


def solve_parts_batched(parts, scfg: SolverConfig = SolverConfig(),
                        q_diag=None, r_diag=None,
                        interpret: bool = False) -> QPSolution:
    """Fused solve from the compact production build
    (hector.qp.builder.StageQPParts): same kernel, no full-stage-form
    extraction.  q_diag/r_diag must be static tuples."""
    if q_diag is None or r_diag is None:
        raise ValueError('solve_parts_batched requires static q_diag/r_diag')
    s69, scal, b69, u_mask, x0, xd, c_blk, lb, ub = parts
    return _solve_from_parts(s69, scal, b69, u_mask, x0, xd, c_blk, lb, ub,
                             scfg=scfg, q_diag=q_diag, r_diag=r_diag,
                             interpret=interpret)


def make_parts_solver(scfg: SolverConfig = SolverConfig(), q_diag=None,
                      r_diag=None, interpret: bool = False):
    """Unbatched-callable fused solver over StageQPParts (the compact
    production build); vmap routes the whole batch into one kernel
    invocation, exactly like make_solver."""

    kw = dict(q_diag=q_diag, r_diag=r_diag, interpret=interpret)

    @jax.custom_batching.custom_vmap
    def solve_one(parts) -> QPSolution:
        p1 = jax.tree.map(lambda x: x[None], parts)
        sol = solve_parts_batched(p1, scfg, **kw)
        return jax.tree.map(lambda x: x[0], sol)

    @solve_one.def_vmap
    def _rule(axis_size, in_batched, parts):
        in_batched = in_batched[0] if isinstance(in_batched, (list, tuple)) \
            else in_batched
        parts_b = jax.tree.map(
            lambda x, bt: x if bt else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape),
            parts, in_batched)
        sol = solve_parts_batched(parts_b, scfg, **kw)
        return sol, jax.tree.map(lambda _: True, sol)

    return solve_one


def make_solver(scfg: SolverConfig = SolverConfig(), q_diag=None,
                r_diag=None, interpret: bool = False):
    """Unbatched-callable fused solver; vmap routes the whole batch into one
    kernel invocation (same pattern as pdip.make_solver)."""

    kw = dict(q_diag=q_diag, r_diag=r_diag, interpret=interpret)

    @jax.custom_batching.custom_vmap
    def solve_one(sqp: StageQPData) -> QPSolution:
        sqp1 = jax.tree.map(lambda x: x[None], sqp)
        sol = solve_batched(sqp1, scfg, **kw)
        return jax.tree.map(lambda x: x[0], sol)

    @solve_one.def_vmap
    def _rule(axis_size, in_batched, sqp):
        in_batched = in_batched[0] if isinstance(in_batched, (list, tuple)) \
            else in_batched
        sqp_b = jax.tree.map(
            lambda x, bt: x if bt else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape),
            sqp, in_batched)
        sol = solve_batched(sqp_b, scfg, **kw)
        return sol, jax.tree.map(lambda _: True, sol)

    return solve_one
