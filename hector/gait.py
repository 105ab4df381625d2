"""Gait phase machine as pure array functions.

TPU-native redesign of ``ConvexMPC/GaitGenerator.cpp``: the reference's Gait
object carries mutable ``_iteration``/``_phase`` state; here everything is a
pure function of the global tick counter and the (per-scenario) gait
parameters, so the whole thing vmaps over scenarios with heterogeneous gaits
and stays inside one jitted program.

Gait parameters are float/int arrays, not python config, so a batch can mix
walking/standing scenarios: offsets (2,), durations (2,) in segments, and
n_segments (static python int -- the MPC horizon table length).
"""

from __future__ import annotations

import jax.numpy as jnp


def phase_state(tick, iterations_per_mpc: int, n_segments: int):
    """(gait segment index, continuous phase in [0,1)).

    Matches ``Gait::setIterations`` (GaitGenerator.cpp:109-113):
    iteration = (tick / perMPC) % n ; phase = (tick mod perMPC*n)/(perMPC*n).
    """
    period = iterations_per_mpc * n_segments
    iteration = (tick // iterations_per_mpc) % n_segments
    phase = (tick % period).astype(jnp.float32) / period
    return iteration, phase


def contact_subphase(phase, offsets, durations, n_segments: int):
    """Per-leg contact sub-phase in [0,1]; 0 when not in contact.

    Matches ``Gait::getContactSubPhase`` (GaitGenerator.cpp:29-47).
    offsets/durations are in segments (will be normalized by n_segments).
    """
    off = offsets / n_segments
    dur = durations / n_segments
    progress = phase[..., None] - off
    progress = jnp.where(progress < 0, progress + 1.0, progress)
    return jnp.where(progress > dur, 0.0, progress / dur)


def swing_subphase(phase, offsets, durations, n_segments: int):
    """Per-leg swing sub-phase in [0,1]; 0 when not swinging.

    Matches ``Gait::getSwingSubPhase`` (GaitGenerator.cpp:53-78).
    """
    off = offsets / n_segments
    dur = durations / n_segments
    swing_off = off + dur
    swing_off = jnp.where(swing_off > 1.0, swing_off - 1.0, swing_off)
    swing_dur = 1.0 - dur
    progress = phase[..., None] - swing_off
    progress = jnp.where(progress < 0, progress + 1.0, progress)
    # guard 0/0 for full-stance gaits (standing: swing_dur == 0)
    sub = jnp.where(progress > swing_dur, 0.0,
                    progress / jnp.where(swing_dur == 0.0, 1.0, swing_dur))
    return jnp.where(swing_dur == 0.0, 0.0, sub)


def mpc_gait_table(iteration, offsets, durations, n_segments: int):
    """(n_segments, 2) contact table starting at the current segment.

    Matches ``Gait::mpc_gait`` (GaitGenerator.cpp:85-103): entry [i, leg] is
    1 when that leg is in stance ``i`` segments ahead of now.
    """
    idx = jnp.arange(n_segments)
    iters = (idx[:, None] + iteration) % n_segments
    progress = (iters - offsets.astype(jnp.int32)[None, :]) % n_segments
    return (progress < durations.astype(jnp.int32)[None, :]).astype(jnp.float32)
