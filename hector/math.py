"""Rotation / quaternion / interpolation math.

TPU-native reimplementation of the conventions in
``hector_control/include/common/Math/orientation_tools.h`` and the solver's
own helpers in ``ConvexMPC/SolverMPC.cpp:65-107,333-342``.  All functions are
pure, shape-static, and written on trailing axes so they vmap/jit cleanly.

Quaternion layout everywhere: (w, x, y, z), matching the reference
(``RobotState.cpp:18-21``).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rot(q):
    """Body->world rotation matrix from a unit quaternion.

    Matches Eigen's ``q.toRotationMatrix()`` used in ``RobotState.cpp:33``.
    (The transpose of this is the reference's ``rBody``, i.e. the
    world->body matrix produced by ``ori::quaternionToRotationMatrix``,
    ``orientation_tools.h:182-200``.)
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_to_rpy(q):
    """ZYX Euler angles (returned as roll, pitch, yaw).

    Matches ``SolverMPC.cpp:333-342`` / ``orientation_tools.h:208-221``.
    The reference only clamps the asin argument from above
    (``t_min(..., .99999)``); we clamp both sides so the batched kernel never
    produces NaN -- identical output for all non-degenerate states.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    as_ = jnp.clip(2.0 * (w * y - x * z), -0.99999, 0.99999)
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(as_)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rpy_to_quat(rpy):
    """Inverse of quat_to_rpy (ZYX convention), for plant state init."""
    half = rpy * 0.5
    cr, cp, cy = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sr, sp, sy = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    return jnp.stack([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ], axis=-1)


def rot_x(t):
    c, s = jnp.cos(t), jnp.sin(t)
    o, i = jnp.zeros_like(t), jnp.ones_like(t)
    r = jnp.stack([i, o, o, o, c, -s, o, s, c], axis=-1)
    return r.reshape(t.shape + (3, 3))


def rot_y(t):
    c, s = jnp.cos(t), jnp.sin(t)
    o, i = jnp.zeros_like(t), jnp.ones_like(t)
    r = jnp.stack([c, o, s, o, i, o, -s, o, c], axis=-1)
    return r.reshape(t.shape + (3, 3))


def rot_z(t):
    c, s = jnp.cos(t), jnp.sin(t)
    o, i = jnp.zeros_like(t), jnp.ones_like(t)
    r = jnp.stack([c, -s, o, s, c, o, o, o, i], axis=-1)
    return r.reshape(t.shape + (3, 3))


def yaw_rot(yaw):
    """R_yaw as in ``RobotState.cpp:36-40``."""
    return rot_z(yaw)


def euler_rate_matrix(rpy):
    """omega_world -> rpy-rate map; the closed form of
    ``euler_to_rotation(...)`` = ``Rb.inverse()`` at ``SolverMPC.cpp:65-89``.

    Rb = [[cy*cp, -sy, 0], [sy*cp, cy, 0], [-sp, 0, 1]];  this returns
    Rb^-1 = [[cy/cp, sy/cp, 0], [-sy, cy, 0], [cy*tp, sy*tp, 1]] analytically
    (no 3x3 inverse in the hot path).
    """
    p, y = rpy[..., 1], rpy[..., 2]
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    inv_cp = 1.0 / cp
    tp = sp * inv_cp
    o, i = jnp.zeros_like(p), jnp.ones_like(p)
    r = jnp.stack([
        cy * inv_cp, sy * inv_cp, o,
        -sy, cy, o,
        cy * tp, sy * tp, i,
    ], axis=-1)
    return r.reshape(rpy.shape[:-1] + (3, 3))


def skew(v):
    """3-vector -> skew-symmetric matrix ([r]x as in ``SolverMPC.cpp:302-309``)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def inv3(m):
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    Used for I_world^-1 in the dynamics build; avoids lax.linalg on tiny
    matrices so XLA fuses it into the surrounding elementwise graph.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    adj = jnp.stack([
        co_a, -(b * i - c * h), b * f - c * e,
        co_b, a * i - c * g, -(a * f - c * d),
        co_c, -(a * h - b * g), a * e - b * d,
    ], axis=-1).reshape(m.shape)
    return adj * inv_det[..., None, None]


def cubic_bezier(y0, yf, x):
    """``Interpolate::cubicBezier`` (``Math/Interpolation.h:53-60``)."""
    bezier = x * x * x + 3.0 * (x * x * (1.0 - x))
    return y0 + bezier * (yf - y0)


def cubic_bezier_d(y0, yf, x):
    """``Interpolate::cubicBezierFirstDerivative`` (``Interpolation.h:67-74``).

    Note: derivative w.r.t. phase, NOT time (the reference never divides by
    swingTime -- see the FIX comment at ``SwingLegController.cpp:141``).
    """
    bezier = 6.0 * x * (1.0 - x)
    return bezier * (yf - y0)


def quat_integrate(q, omega_world, dt):
    """Integrate unit quaternion under world angular velocity (plant side)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ox, oy, oz = omega_world[..., 0], omega_world[..., 1], omega_world[..., 2]
    # qdot = 0.5 * omega_quat * q  (world-frame omega => left multiply)
    dw = -0.5 * (ox * x + oy * y + oz * z)
    dx = 0.5 * (ox * w + oy * z - oz * y)
    dy = 0.5 * (oy * w + oz * x - ox * z)
    dz = 0.5 * (oz * w + ox * y - oy * x)
    qn = jnp.stack([w + dt * dw, x + dt * dx, y + dt * dy, z + dt * dz], axis=-1)
    return qn / jnp.linalg.norm(qn, axis=-1, keepdims=True)
