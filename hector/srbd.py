"""Single-rigid-body-with-moments dynamics and horizon condensing.

TPU-native rebuild of ``ConvexMPC/SolverMPC.cpp``'s dynamics path:

- state x (13) = [rpy(3), p(3), omega_world(3), v(3), g] (SolverMPC.cpp:420)
- input u (12) = [F_L(3), F_R(3), M_L(3), M_R(3)]
- continuous A/B: ``ct_ss_mats`` (SolverMPC.cpp:312-331)
- Euler discretization + condensing into A_qp/B_qp: ``c2qp``
  (SolverMPC.cpp:133-193).

The reference builds A_qp/B_qp with an O(h^2) triple loop of 13x13 Eigen
products recomputing each power from scratch (O(h^3) matmuls total).  Here
the powers are one sequential chain (h matmuls), the lower-triangular block
Toeplitz B_qp is assembled from h precomputed blocks at trace time (h is
static), and everything batches over scenarios via vmap -- XLA sees a few
small batched GEMMs instead of scalar loops.

Quirks preserved: the MPC model mass is 9.0 (not Biped.mass=13.856;
SolverMPC.cpp:423) and the reference's c2qp hardcodes 10 steps regardless of
the horizon argument -- we make h a static argument, tested at h=10.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import skew, inv3


def ct_dynamics(i_world, mass, r_feet, euler_rate):
    """Continuous-time (A (13,13), B (13,12)).

    i_world: (..., 3, 3); r_feet: (..., 2, 3) foot positions relative to CoM
    (world frame); euler_rate: (..., 3, 3) omega_world -> rpy-rate map.
    Matches ``ct_ss_mats`` (SolverMPC.cpp:312-331): note B maps BOTH feet's
    moments through I_world^-1 directly (columns 6:9 and 9:12), and gravity
    enters via A[11,12] = -1 acting on the constant state x[12]=g.
    """
    batch = i_world.shape[:-2]
    dtype = i_world.dtype
    a = jnp.zeros(batch + (13, 13), dtype)
    a = a.at[..., 0:3, 6:9].set(euler_rate)
    a = a.at[..., 3:6, 9:12].set(jnp.eye(3, dtype=dtype))
    a = a.at[..., 11, 12].set(-1.0)

    i_inv = inv3(i_world)
    b = jnp.zeros(batch + (13, 12), dtype)
    # angular acceleration from contact forces: I^-1 [r_i]x F_i
    b = b.at[..., 6:9, 0:3].set(i_inv @ skew(r_feet[..., 0, :]))
    b = b.at[..., 6:9, 3:6].set(i_inv @ skew(r_feet[..., 1, :]))
    # ... and from contact moments directly
    b = b.at[..., 6:9, 6:9].set(i_inv)
    b = b.at[..., 6:9, 9:12].set(i_inv)
    # linear acceleration
    eye_m = jnp.eye(3, dtype=dtype) / mass
    b = b.at[..., 9:12, 0:3].set(eye_m)
    b = b.at[..., 9:12, 3:6].set(eye_m)
    return a, b


def condense(a_ct, b_ct, dt, horizon: int):
    """(A_qp (13h, 13), B_qp (13h, 12h)) from Euler-discretized dynamics.

    Acd = I + dt*A, Bcd = dt*B (SolverMPC.cpp:145-146);
    A_qp block i = Acd^(i+1); B_qp block (i, j) = Acd^(i-j) Bcd for j <= i.
    horizon is static; the loop unrolls at trace time into a short chain of
    batched 13x13 matmuls.
    """
    dtype = a_ct.dtype
    eye = jnp.eye(13, dtype=dtype)
    acd = eye + dt * a_ct
    bcd = dt * b_ct

    # powers[k] = Acd^k, k = 0..horizon
    powers = [jnp.broadcast_to(eye, a_ct.shape)]
    for _ in range(horizon):
        powers.append(powers[-1] @ acd)

    a_qp = jnp.concatenate(powers[1:], axis=-2)  # (..., 13h, 13)

    # pb[k] = Acd^k @ Bcd
    pb = [bcd] + [powers[k] @ bcd for k in range(1, horizon)]
    zero = jnp.zeros_like(bcd)
    rows = []
    for i in range(horizon):
        blocks = [pb[i - j] if j <= i else zero for j in range(horizon)]
        rows.append(jnp.concatenate(blocks, axis=-1))
    b_qp = jnp.concatenate(rows, axis=-2)        # (..., 13h, 12h)
    return a_qp, b_qp
