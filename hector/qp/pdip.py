"""Batched fixed-iteration primal-dual interior-point QP solver.

This replaces qpOASES (``third_party/qpOASES``, used at SolverMPC.cpp:702-712)
-- the heart of the TPU-native rebuild.  qpOASES is an online active-set
method: data-dependent iteration counts and working-set updates that batch
terribly.  A Mehrotra predictor-corrector interior-point method has a FIXED
iteration count and identical dense linear algebra for every scenario, so
thousands of QPs become one batched Cholesky pipeline on the MXU.

Problem form (from hector/qp/builder.py):

    min 1/2 u^T H u + g^T u   s.t.   lb <= C u <= ub

with C block-diagonal: the same (16, 12) block per horizon step.  The KKT
normal matrix is H + C^T D C where C^T D C is block-diagonal (12, 12) per
step -- built with one small einsum instead of a 160x120 dense product.

Rows with bounds beyond ``big_threshold`` are treated as one-sided/absent via
masks (the reference instead passes BIG_NUMBER=5e10 into qpOASES); rows fully
deactivated by the gait mask have both sides masked and are inert.

Two-sided-bound KKT derivation (per row; l/u subscripts = lower/upper side):
    s_l = Cu - lb >= 0,  s_u = ub - Cu >= 0,  duals lam_l, lam_u >= 0
    stationarity: H u + g - C^T lam_l + C^T lam_u = 0
    Newton step with target complementarity tau:
      d_lam_l = tau_l/s_l - lam_l - (lam_l/s_l) (C du + r_pl)
      d_lam_u = tau_u/s_u - lam_u - (lam_u/s_u) (-C du + r_pu)
    eliminating gives  (H + C^T D C) du = -r_d - C^T v  with
      D = lam_l/s_l + lam_u/s_u
      v = tau_u/s_u - tau_l/s_l - (lam_u - lam_l) - (lam_u/s_u) r_pu
          + (lam_l/s_l) r_pl
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from .builder import QPData


class QPSolution(NamedTuple):
    u: jnp.ndarray        # (..., n) primal solution
    mu: jnp.ndarray       # (...,) final complementarity measure
    r_dual: jnp.ndarray   # (...,) final dual-residual inf-norm
    r_prim: jnp.ndarray   # (...,) final primal-residual inf-norm


def _apply_c(c_block, u, h):
    """C u: (h, 16) from u (12h,)."""
    return jnp.einsum('ij,hj->hi', c_block, u.reshape(h, 12))


def _apply_ct(c_block, y):
    """C^T y: (12h,) from y (h, 16)."""
    return jnp.einsum('ij,hi->hj', c_block, y).reshape(-1)


def _alpha_max(s, ds, mask, frac):
    ratios = jnp.where(mask & (ds < 0), s / jnp.maximum(-ds, 1e-30), jnp.inf)
    return jnp.minimum(1.0, frac * jnp.min(ratios))


def solve(qp: QPData, scfg: SolverConfig = SolverConfig()) -> QPSolution:
    """Solve one QP (vmap for batches).  Fixed iteration count => fixed
    shapes, no data-dependent control flow: jit/vmap/shard_map clean."""
    h_mat, g_vec, c_block, lb, ub = qp
    dtype = h_mat.dtype
    n = h_mat.shape[-1]
    h = lb.shape[-2]

    big = jnp.asarray(scfg.big_threshold, dtype)
    mask_l = lb > -big
    mask_u = ub < big
    n_act = jnp.maximum(jnp.sum(mask_l) + jnp.sum(mask_u), 1).astype(dtype)
    lb_c = jnp.where(mask_l, lb, 0.0)
    ub_c = jnp.where(mask_u, ub, 0.0)

    eye_reg = scfg.kkt_reg * jnp.eye(n, dtype=dtype)

    # Mehrotra-style scale-aware start: u0 = unconstrained minimizer (H is
    # PD thanks to Alpha_rep), slacks shifted strictly positive around it,
    # duals chosen so every active product s*lam == mu0 (perfectly centered).
    chol_h = jnp.linalg.cholesky(h_mat + eye_reg)
    u0 = jax.scipy.linalg.cho_solve((chol_h, True), -g_vec)
    cu0 = _apply_c(c_block, u0, h)
    sh_l = jnp.where(mask_l, cu0 - lb_c, 1.0)
    sh_u = jnp.where(mask_u, ub_c - cu0, 1.0)
    s_min = jnp.minimum(jnp.min(jnp.where(mask_l, sh_l, jnp.inf)),
                        jnp.min(jnp.where(mask_u, sh_u, jnp.inf)))
    shift = jnp.asarray(scfg.init_slack, dtype) + jnp.maximum(0.0, -1.5 * s_min)
    sl0 = jnp.where(mask_l, sh_l + shift, 1.0)
    su0 = jnp.where(mask_u, sh_u + shift, 1.0)
    mu0 = jnp.asarray(scfg.init_dual, dtype)
    ll0 = jnp.where(mask_l, mu0 / sl0, 0.0)
    lu0 = jnp.where(mask_u, mu0 / su0, 0.0)

    # dtype-aware safeguards: freeze converged scenarios (extra iterations
    # are no-ops), floor slacks in divisions, and cap the barrier weights so
    # the KKT matrix never overflows -- this is what makes ONE fixed
    # iteration count safe for a whole heterogeneous batch in float32.
    eps = jnp.finfo(dtype).eps
    mu_floor = jnp.maximum(jnp.asarray(1e-14, dtype), 10.0 * eps)
    s_floor = 10.0 * eps
    d_cap = 0.1 / eps

    def body(_, carry):
        u, s_l, lam_l, s_u, lam_u = carry
        cu = _apply_c(c_block, u, h)
        r_d = h_mat @ u + g_vec + _apply_ct(c_block, lam_u - lam_l)
        r_pl = jnp.where(mask_l, cu - lb_c - s_l, 0.0)
        r_pu = jnp.where(mask_u, ub_c - cu - s_u, 0.0)
        sl_safe = jnp.maximum(s_l, s_floor)
        su_safe = jnp.maximum(s_u, s_floor)
        d_l = jnp.where(mask_l, jnp.minimum(lam_l / sl_safe, d_cap), 0.0)
        d_u = jnp.where(mask_u, jnp.minimum(lam_u / su_safe, d_cap), 0.0)
        mu = (jnp.sum(s_l * lam_l * mask_l) +
              jnp.sum(s_u * lam_u * mask_u)) / n_act

        # KKT normal matrix: H + C^T D C, block-diagonal addition per step
        d_row = d_l + d_u                                 # (h, 16)
        blocks = jnp.einsum('ki,hk,kj->hij', c_block, d_row, c_block)
        m = h_mat.reshape(h, 12, h, 12)
        idx = jnp.arange(h)
        m = m.at[idx, :, idx, :].add(blocks)
        m = m.reshape(n, n) + eye_reg
        chol = jnp.linalg.cholesky(m)

        def newton(tau_l, tau_u):
            v = (jnp.where(mask_u, tau_u / su_safe, 0.0)
                 - jnp.where(mask_l, tau_l / sl_safe, 0.0)
                 - (lam_u - lam_l) - d_u * r_pu + d_l * r_pl)
            rhs = -(r_d + _apply_ct(c_block, v))
            du = jax.scipy.linalg.cho_solve((chol, True), rhs)
            cdu = _apply_c(c_block, du, h)
            ds_l = jnp.where(mask_l, cdu + r_pl, 0.0)
            ds_u = jnp.where(mask_u, -cdu + r_pu, 0.0)
            dl_l = jnp.where(
                mask_l, tau_l / sl_safe - lam_l - d_l * (cdu + r_pl), 0.0)
            dl_u = jnp.where(
                mask_u, tau_u / su_safe - lam_u - d_u * (-cdu + r_pu), 0.0)
            return du, ds_l, dl_l, ds_u, dl_u

        zero_tau = jnp.zeros_like(s_l)
        # affine (predictor) step
        du_a, dsl_a, dll_a, dsu_a, dlu_a = newton(zero_tau, zero_tau)
        a_p = jnp.minimum(_alpha_max(s_l, dsl_a, mask_l, 1.0),
                          _alpha_max(s_u, dsu_a, mask_u, 1.0))
        a_d = jnp.minimum(_alpha_max(lam_l, dll_a, mask_l, 1.0),
                          _alpha_max(lam_u, dlu_a, mask_u, 1.0))
        mu_aff = (jnp.sum((s_l + a_p * dsl_a) * (lam_l + a_d * dll_a) * mask_l)
                  + jnp.sum((s_u + a_p * dsu_a) * (lam_u + a_d * dlu_a)
                            * mask_u)) / n_act
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        # corrector step
        tau_l = sigma * mu - dsl_a * dll_a
        tau_u = sigma * mu - dsu_a * dlu_a
        du, ds_l, dl_l, ds_u, dl_u = newton(tau_l, tau_u)

        frac = jnp.asarray(scfg.frac_to_boundary, dtype)
        a_p = jnp.minimum(_alpha_max(s_l, ds_l, mask_l, frac),
                          _alpha_max(s_u, ds_u, mask_u, frac))
        a_d = jnp.minimum(_alpha_max(lam_l, dl_l, mask_l, frac),
                          _alpha_max(lam_u, dl_u, mask_u, frac))

        done = mu < mu_floor
        u_n = jnp.where(done, u, u + a_p * du)
        s_l_n = jnp.where(done | ~mask_l, s_l, s_l + a_p * ds_l)
        s_u_n = jnp.where(done | ~mask_u, s_u, s_u + a_p * ds_u)
        lam_l_n = jnp.where(done | ~mask_l, lam_l, lam_l + a_d * dl_l)
        lam_u_n = jnp.where(done | ~mask_u, lam_u, lam_u + a_d * dl_u)
        return (u_n, s_l_n, lam_l_n, s_u_n, lam_u_n)

    carry = jax.lax.fori_loop(
        0, scfg.iterations, body, (u0, sl0, ll0, su0, lu0),
        unroll=False)
    u, s_l, lam_l, s_u, lam_u = carry

    cu = _apply_c(c_block, u, h)
    r_d = h_mat @ u + g_vec + _apply_ct(c_block, lam_u - lam_l)
    r_pl = jnp.where(mask_l, jnp.maximum(lb_c - cu, 0.0), 0.0)
    r_pu = jnp.where(mask_u, jnp.maximum(cu - ub_c, 0.0), 0.0)
    mu = (jnp.sum(s_l * lam_l * mask_l) + jnp.sum(s_u * lam_u * mask_u)) / n_act
    return QPSolution(
        u=u, mu=mu,
        r_dual=jnp.max(jnp.abs(r_d)),
        r_prim=jnp.maximum(jnp.max(r_pl), jnp.max(r_pu)))
