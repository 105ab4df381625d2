"""Batched fixed-iteration primal-dual interior-point QP solver.

This replaces qpOASES (``third_party/qpOASES``, used at SolverMPC.cpp:702-712)
-- the heart of the TPU-native rebuild.  qpOASES is an online active-set
method: data-dependent iteration counts and working-set updates that batch
terribly.  A Mehrotra predictor-corrector interior-point method has a FIXED
iteration count and identical dense linear algebra for every scenario, so
thousands of QPs become one batched linear-algebra pipeline.

Problem form (from hector/qp/builder.py):

    min 1/2 u^T H u + g^T u   s.t.   lb <= C u <= ub

with C block-diagonal: the same (16, 12) block per horizon step.  The KKT
normal matrix is H + C^T D C where C^T D C is block-diagonal (12, 12) per
step -- assembled with one small einsum + static-index scatter, never a
dense 160x120 product.

Linear-algebra backends (SolverConfig.backend):

- 'xla': jnp.linalg.cholesky + cho_solve on (B, n, n) -- reference path,
  works everywhere, slow on TPU for small-n large-B;
- 'pallas': hector.qp.pallas_chol lane-vectorized kernels on (n, n, B)
  batch-minor layout -- the TPU production path (~30x faster at B=4096);
- 'pallas_interpret': same kernels in interpreter mode (CPU tests);
- 'auto': pallas on TPU, xla elsewhere.

``make_solver`` wraps the batched implementation in jax.custom_batching so
per-scenario code (hector/mpc.py) can call it unbatched and a surrounding
vmap routes the WHOLE batch into one kernel invocation instead of
per-example lowering.

Rows with bounds beyond ``big_threshold`` are treated as one-sided/absent via
masks (the reference instead passes BIG_NUMBER=5e10 into qpOASES); rows fully
deactivated by the gait mask have both sides masked and are inert.

Two-sided-bound KKT derivation (per row; l/u = lower/upper side):
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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from .builder import QPData
from . import pallas_chol as PC


class QPSolution(NamedTuple):
    u: jnp.ndarray        # (..., n) primal solution
    mu: jnp.ndarray       # (...,) final complementarity measure
    r_dual: jnp.ndarray   # (...,) final dual-residual inf-norm
    r_prim: jnp.ndarray   # (...,) final primal-residual inf-norm


def _resolve_backend(backend: str) -> str:
    if backend != 'auto':
        return backend
    return 'pallas' if jax.default_backend() not in ('cpu',) else 'xla'


def _block_indices(h: int):
    """(h,12,12) row/col index arrays addressing the per-step diagonal
    blocks of the (12h, 12h) KKT matrix."""
    step = jnp.arange(h)[:, None, None] * 12
    r = step + jnp.arange(12)[None, :, None]
    c = step + jnp.arange(12)[None, None, :]
    return jnp.broadcast_to(r, (h, 12, 12)), jnp.broadcast_to(c, (h, 12, 12))


def solve_batched(qp: QPData, scfg: SolverConfig = SolverConfig()
                  ) -> QPSolution:
    """Solve a batch of QPs; every QPData field carries a leading batch dim."""
    h_mat, g_vec, c_block, lb, ub = qp
    dtype = h_mat.dtype
    bsz, n = g_vec.shape
    h = lb.shape[-2]
    backend = _resolve_backend(scfg.backend)

    big = jnp.asarray(scfg.big_threshold, dtype)
    mask_l = lb > -big
    mask_u = ub < big
    n_act = jnp.maximum(
        jnp.sum(mask_l, axis=(1, 2)) + jnp.sum(mask_u, axis=(1, 2)),
        1).astype(dtype)                                   # (B,)
    lb_c = jnp.where(mask_l, lb, 0.0)
    ub_c = jnp.where(mask_u, ub, 0.0)

    ridx, cidx = _block_indices(h)
    diag = jnp.arange(n)
    reg = jnp.asarray(scfg.kkt_reg, dtype)

    eps = jnp.finfo(dtype).eps
    mu_floor = jnp.maximum(jnp.asarray(1e-14, dtype), 10.0 * eps)
    s_floor = 10.0 * eps
    d_cap = 0.1 / eps
    sl_cap = jnp.asarray(1e8, dtype)  # keeps s*lam finite in float32

    def apply_c(u):
        return jnp.einsum('bij,bhj->bhi', c_block, u.reshape(bsz, h, 12))

    def apply_ct(y):
        return jnp.einsum('bij,bhi->bhj', c_block, y).reshape(bsz, n)

    if backend in ('pallas', 'pallas_interpret'):
        interp = backend == 'pallas_interpret'
        h_nnb = jnp.transpose(h_mat, (1, 2, 0))            # (n, n, B) once

        def factor(d_row):
            blocks = jnp.einsum('bki,bhk,bkj->hijb', c_block, d_row, c_block)
            m = h_nnb.at[ridx, cidx, :].add(blocks)
            m = m.at[diag, diag, :].add(reg)
            return PC.cholesky_nnb(m, interpret=interp)

        def kkt_solve(l, rhs):
            x = PC.cholesky_solve_nnb(l, rhs.T, interpret=interp)
            return x.T
    else:
        def factor(d_row):
            blocks = jnp.einsum('bki,bhk,bkj->bhij', c_block, d_row, c_block)
            m = h_mat.at[:, ridx, cidx].add(blocks)
            m = m.at[:, diag, diag].add(reg)
            return jnp.linalg.cholesky(m)

        def kkt_solve(l, rhs):
            y = jax.scipy.linalg.solve_triangular(l, rhs[..., None],
                                                  lower=True)
            x = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(l, -1, -2), y, lower=False)
            return x[..., 0]

    def alpha_max(s, ds, mask, frac):
        ratios = jnp.where(mask & (ds < 0), s / jnp.maximum(-ds, 1e-30),
                           jnp.inf)
        return jnp.minimum(1.0, frac * jnp.min(ratios, axis=(1, 2)))  # (B,)

    # scale-aware start: u0 = unconstrained minimizer, slacks shifted
    # strictly positive around it, duals perfectly centered at mu0.
    l0 = factor(jnp.zeros((bsz, h, 16), dtype))
    u0 = kkt_solve(l0, -g_vec)
    cu0 = apply_c(u0)
    sh_l = jnp.where(mask_l, cu0 - lb_c, 1.0)
    sh_u = jnp.where(mask_u, ub_c - cu0, 1.0)
    s_min = jnp.minimum(
        jnp.min(jnp.where(mask_l, sh_l, jnp.inf), axis=(1, 2)),
        jnp.min(jnp.where(mask_u, sh_u, jnp.inf), axis=(1, 2)))  # (B,)
    shift = (jnp.asarray(scfg.init_slack, dtype)
             + jnp.maximum(0.0, -1.5 * s_min))[:, None, None]
    sl0 = jnp.where(mask_l, sh_l + shift, 1.0)
    su0 = jnp.where(mask_u, sh_u + shift, 1.0)
    mu0 = jnp.asarray(scfg.init_dual, dtype)
    ll0 = jnp.where(mask_l, mu0 / sl0, 0.0)
    lu0 = jnp.where(mask_u, mu0 / su0, 0.0)
    u0 = jnp.zeros_like(g_vec)

    def body(_, carry):
        u, s_l, lam_l, s_u, lam_u = carry
        cu = apply_c(u)
        r_d = (jnp.einsum('bij,bj->bi', h_mat, u) + g_vec
               + apply_ct(lam_u - lam_l))
        r_pl = jnp.where(mask_l, cu - lb_c - s_l, 0.0)
        r_pu = jnp.where(mask_u, ub_c - cu - s_u, 0.0)
        sl_safe = jnp.maximum(s_l, s_floor)
        su_safe = jnp.maximum(s_u, s_floor)
        d_l = jnp.where(mask_l, jnp.minimum(lam_l / sl_safe, d_cap), 0.0)
        d_u = jnp.where(mask_u, jnp.minimum(lam_u / su_safe, d_cap), 0.0)
        mu = (jnp.sum(s_l * lam_l * mask_l, axis=(1, 2))
              + jnp.sum(s_u * lam_u * mask_u, axis=(1, 2))) / n_act   # (B,)

        chol = factor(d_l + d_u)

        def newton(tau_l, tau_u):
            v = (jnp.where(mask_u, tau_u / su_safe, 0.0)
                 - jnp.where(mask_l, tau_l / sl_safe, 0.0)
                 - (lam_u - lam_l) - d_u * r_pu + d_l * r_pl)
            rhs = -(r_d + apply_ct(v))
            du = kkt_solve(chol, rhs)
            cdu = apply_c(du)
            ds_l = jnp.where(mask_l, cdu + r_pl, 0.0)
            ds_u = jnp.where(mask_u, -cdu + r_pu, 0.0)
            dl_l = jnp.where(
                mask_l, tau_l / sl_safe - lam_l - d_l * (cdu + r_pl), 0.0)
            dl_u = jnp.where(
                mask_u, tau_u / su_safe - lam_u - d_u * (-cdu + r_pu), 0.0)
            return du, ds_l, dl_l, ds_u, dl_u

        zero_tau = jnp.zeros_like(s_l)
        du_a, dsl_a, dll_a, dsu_a, dlu_a = newton(zero_tau, zero_tau)
        a_p = jnp.minimum(alpha_max(s_l, dsl_a, mask_l, 1.0),
                          alpha_max(s_u, dsu_a, mask_u, 1.0))[:, None, None]
        a_d = jnp.minimum(alpha_max(lam_l, dll_a, mask_l, 1.0),
                          alpha_max(lam_u, dlu_a, mask_u, 1.0))[:, None, None]
        mu_aff = (jnp.sum((s_l + a_p * dsl_a) * (lam_l + a_d * dll_a)
                          * mask_l, axis=(1, 2))
                  + jnp.sum((s_u + a_p * dsu_a) * (lam_u + a_d * dlu_a)
                            * mask_u, axis=(1, 2))) / n_act
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
        sigma = jnp.nan_to_num(sigma, nan=1.0)

        smu = (sigma * mu)[:, None, None]
        tau_l = smu - dsl_a * dll_a
        tau_u = smu - dsu_a * dlu_a
        du, ds_l, dl_l, ds_u, dl_u = newton(tau_l, tau_u)

        frac = jnp.asarray(scfg.frac_to_boundary, dtype)
        a_p = jnp.minimum(alpha_max(s_l, ds_l, mask_l, frac),
                          alpha_max(s_u, ds_u, mask_u, frac))[:, None, None]
        a_d = jnp.minimum(alpha_max(lam_l, dl_l, mask_l, frac),
                          alpha_max(lam_u, dl_u, mask_u, frac))[:, None, None]

        # NaN quarantine: a lane whose Newton direction went non-finite
        # (degenerate/near-infeasible QP in float32) takes a zero step and
        # keeps its last good iterate instead of poisoning the batch.
        finite = (jnp.all(jnp.isfinite(du), axis=1)
                  & jnp.all(jnp.isfinite(ds_l) & jnp.isfinite(dl_l)
                            & jnp.isfinite(ds_u) & jnp.isfinite(dl_u),
                            axis=(1, 2)))[:, None, None]
        a_p = jnp.where(finite, a_p, 0.0)
        a_d = jnp.where(finite, a_d, 0.0)

        skip = (mu < mu_floor)[:, None, None] | ~finite
        u_n = jnp.where(skip[..., 0], u, u + a_p[..., 0] * du)
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

    cu = apply_c(u)
    r_d = (jnp.einsum('bij,bj->bi', h_mat, u) + g_vec
           + apply_ct(lam_u - lam_l))
    r_pl = jnp.where(mask_l, jnp.maximum(lb_c - cu, 0.0), 0.0)
    r_pu = jnp.where(mask_u, jnp.maximum(cu - ub_c, 0.0), 0.0)
    mu = (jnp.sum(s_l * lam_l * mask_l, axis=(1, 2))
          + jnp.sum(s_u * lam_u * mask_u, axis=(1, 2))) / n_act
    return QPSolution(
        u=u, mu=mu,
        r_dual=jnp.max(jnp.abs(r_d), axis=1),
        r_prim=jnp.maximum(jnp.max(r_pl, axis=(1, 2)),
                           jnp.max(r_pu, axis=(1, 2))))


def make_solver(scfg: SolverConfig = SolverConfig()):
    """Unbatched-callable solver whose vmap rule dispatches the WHOLE batch
    to solve_batched (one kernel launch instead of per-lane lowering)."""

    @jax.custom_batching.custom_vmap
    def solve_one(qp: QPData) -> QPSolution:
        qp1 = jax.tree.map(lambda x: x[None], qp)
        sol = solve_batched(qp1, scfg)
        return jax.tree.map(lambda x: x[0], sol)

    @solve_one.def_vmap
    def _rule(axis_size, in_batched, qp):
        in_batched = in_batched[0] if isinstance(in_batched, (list, tuple)) \
            else in_batched
        qp_b = jax.tree.map(
            lambda x, b: x if b else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape),
            qp, in_batched)
        sol = solve_batched(qp_b, scfg)
        return sol, jax.tree.map(lambda _: True, sol)

    return solve_one


def solve(qp: QPData, scfg: SolverConfig = SolverConfig()) -> QPSolution:
    """Single-QP convenience wrapper (tests, unbatched rollouts)."""
    return make_solver(scfg)(qp)
