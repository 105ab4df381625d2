"""Fused Pallas Riccati kernel: equivalence with the pure-JAX stage solver.

The kernel's complete computation is exposed as a pure array function
(hector.qp.pallas_riccati._solve_tile) so it can run under plain XLA on CPU
-- byte-identical math to what Mosaic executes on TPU, minus the pallas
plumbing (which tests nothing numerical).  The first run compiles a large
unrolled program (~minutes); conftest's persistent compilation cache makes
subsequent runs cheap.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hector import kinematics as K
from hector import math as HM
from hector.config import MPCConfig, SolverConfig, JOINT_OFFSETS
from hector.qp.builder import build_stage_qp
from hector.qp import riccati
from hector.qp import pallas_riccati as PR
import pytest

pytestmark = pytest.mark.slow

GOLD = np.load(__file__.rsplit('/', 1)[0] + '/golden/solver.npz')
CFG = MPCConfig()
I_BODY = jnp.diag(jnp.asarray([0.5413, 0.5200, 0.0691]))
OFFS = np.array(JOINT_OFFSETS)


def _inputs(k, dtype=jnp.float32):
    g = GOLD
    r_body = HM.quat_to_rot(jnp.asarray(g[f's{k}_quat'], dtype))
    r_foot = K.foot_rotation(
        jnp.asarray(g[f's{k}_joint_angles'].reshape(2, 5) + OFFS, dtype))
    return (jnp.asarray(g[f's{k}_x0'], dtype),
            jnp.asarray(g[f's{k}_traj'], dtype), r_body, r_foot,
            jnp.asarray(g[f's{k}_r_feet'], dtype), I_BODY.astype(dtype),
            jnp.asarray(g[f's{k}_gait'], dtype), CFG)


def test_kernel_tile_matches_pure_jax_and_certified():
    """_solve_tile (the kernel body) on the 3 golden scenarios packed into a
    (1,3) batch tile: must match the pure-JAX fixed-sigma solver to ~1e-4
    and the certified optima to the float32 floor (< 1e-2 N)."""
    sqps = [build_stage_qp(*_inputs(k)) for k in range(3)]
    sqp = jax.tree.map(lambda *xs: jnp.stack(xs), *sqps)
    a_dt, b_dt, u_mask, x0, xd, qd, rd, c_blk, lb, ub = sqp
    f32 = jnp.float32

    def pack(x):
        return jnp.moveaxis(x.astype(f32), 0, -1)[..., None, :]

    s69 = pack(a_dt[:, 0:3, 6:9])
    b69 = pack(b_dt[:, 6:9, :])
    scal = pack(jnp.stack([a_dt[:, 3, 9], a_dt[:, 11, 12], b_dt[:, 9, 0]],
                          axis=1))
    scfg = SolverConfig(iterations=14, mehrotra=False, sigma_fixed=0.1)
    scfg_s = (scfg.iterations, scfg.sigma_fixed, scfg.frac_to_boundary,
              scfg.big_threshold, scfg.init_slack, scfg.init_dual,
              scfg.polish_rounds, scfg.polish_iters, scfg.polish_rho,
              scfg.polish_tol)
    q2 = tuple(np.asarray(qd)[0].tolist())
    r2 = tuple(np.asarray(rd)[0].tolist())
    f = jax.jit(functools.partial(
        PR._solve_tile, q2=q2, r2=r2, reg=scfg.kkt_reg, scfg_s=scfg_s))
    u_t, stats = f(s69, scal, b69, pack(c_blk), pack(u_mask), pack(x0),
                   pack(xd), pack(lb), pack(ub))
    u_t = np.asarray(u_t)            # (H, NU, 1, 3)
    stats = np.asarray(stats)        # (3, 1, 3)

    sol_j = riccati.solve_batched(
        jax.tree.map(lambda x: x.astype(f32), sqp), scfg)
    for k in range(3):
        u_k = u_t[..., 0, k].reshape(-1)
        gold = GOLD[f's{k}_q_soln']
        assert np.abs(u_k - gold).max() < 1e-2, f'scenario {k}'
        assert np.abs(u_k - np.asarray(sol_j.u[k])).max() < 2e-4
        assert stats[0, 0, k] < 1e-4          # complementarity
        assert stats[2, 0, k] < 1e-4          # primal residual


def test_solve_batched_padding_roundtrip():
    """solve_batched pads B to a tile multiple; padded lanes must not
    perturb real lanes, and tiling/untiling must round-trip exactly.
    Runs in interpret-free mode only on TPU; on CPU we verify the
    host-side tiling helpers directly."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 7, 3)).astype(np.float32))
    t = PR._to_tiles(x, 5, 1)
    assert t.shape == (1, 7, 3, PR.SUB, PR.LANE)
    back = PR._from_tiles(t, 5)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_kernel_tile_polish_meets_qpoases_bar():
    """The literal BASELINE line ON THE PRODUCTION KERNEL MATH: with the
    active-set polish enabled (SolverConfig.polish_rounds), the fused
    kernel's computation lands within 1e-3 N of the certified optima in
    pure float32 -- typically ~2e-5 N, 50x under the bar.  (The qpOASES
    cross-check of the same certified optima is test_qpoases_parity.py::
    test_qpoases_matches_certified_optima; the fresh-scenario battery
    against real qpOASES is test_kernel_polish_vs_qpoases there.)"""
    sqps = [build_stage_qp(*_inputs(k)) for k in range(3)]
    sqp = jax.tree.map(lambda *xs: jnp.stack(xs), *sqps)
    a_dt, b_dt, u_mask, x0, xd, qd, rd, c_blk, lb, ub = sqp
    f32 = jnp.float32

    def pack(x):
        return jnp.moveaxis(x.astype(f32), 0, -1)[..., None, :]

    s69 = pack(a_dt[:, 0:3, 6:9])
    b69 = pack(b_dt[:, 6:9, :])
    scal = pack(jnp.stack([a_dt[:, 3, 9], a_dt[:, 11, 12], b_dt[:, 9, 0]],
                          axis=1))
    scfg = SolverConfig(iterations=14, mehrotra=False, sigma_fixed=0.1,
                        polish_rounds=8)
    scfg_s = (scfg.iterations, scfg.sigma_fixed, scfg.frac_to_boundary,
              scfg.big_threshold, scfg.init_slack, scfg.init_dual,
              scfg.polish_rounds, scfg.polish_iters, scfg.polish_rho,
              scfg.polish_tol)
    q2 = tuple(np.asarray(qd)[0].tolist())
    r2 = tuple(np.asarray(rd)[0].tolist())
    f = jax.jit(functools.partial(
        PR._solve_tile, q2=q2, r2=r2, reg=scfg.kkt_reg, scfg_s=scfg_s))
    u_t, stats = f(s69, scal, b69, pack(c_blk), pack(u_mask), pack(x0),
                   pack(xd), pack(lb), pack(ub))
    u_t = np.asarray(u_t)
    stats = np.asarray(stats)
    for k in range(3):
        u_k = u_t[..., 0, k].reshape(-1)
        gold = GOLD[f's{k}_q_soln']
        err = np.abs(u_k - gold).max()
        assert err < 1e-3, f'scenario {k}: {err}'
        assert stats[2, 0, k] < 1e-6          # polished primal residual
