"""Gait phase machine parity vs a literal transcription of
GaitGenerator.cpp (computed inline here in numpy -- small enough that the
transcription is the documentation)."""

import numpy as np
import jax.numpy as jnp

from hector import gait as G

N = 10


def ref_mpc_table(iteration, offsets, durations):
    tbl = np.zeros((N, 2))
    for i in range(N):
        it = (i + iteration) % N
        for j in range(2):
            prog = it - offsets[j]
            if prog < 0:
                prog += N
            tbl[i, j] = 1.0 if prog < durations[j] else 0.0
    return tbl


def ref_subphases(phase, offsets, durations):
    offp = np.asarray(offsets) / N
    durp = np.asarray(durations) / N
    contact = np.zeros(2)
    swing = np.zeros(2)
    for i in range(2):
        pr = phase - offp[i]
        if pr < 0:
            pr += 1
        contact[i] = 0.0 if pr > durp[i] else pr / durp[i]
        so = offp[i] + durp[i]
        if so > 1:
            so -= 1
        sd = 1 - durp[i]
        pr = phase - so
        if pr < 0:
            pr += 1
        if sd == 0:
            swing[i] = 0.0
        else:
            swing[i] = 0.0 if pr > sd else pr / sd
    return contact, swing


def test_phase_state():
    it, ph = G.phase_state(jnp.asarray(437), 40, N)
    assert int(it) == (437 // 40) % N
    np.testing.assert_allclose(float(ph), (437 % 400) / 400.0)


def test_mpc_table_walking():
    offs = jnp.asarray([0.0, 5.0])
    durs = jnp.asarray([5.0, 5.0])
    for iteration in range(N):
        tbl = G.mpc_gait_table(jnp.asarray(iteration), offs, durs, N)
        np.testing.assert_array_equal(
            np.asarray(tbl), ref_mpc_table(iteration, [0, 5], [5, 5]))


def test_mpc_table_standing():
    tbl = G.mpc_gait_table(jnp.asarray(4), jnp.asarray([0.0, 0.0]),
                           jnp.asarray([10.0, 10.0]), N)
    np.testing.assert_array_equal(np.asarray(tbl), np.ones((N, 2)))


def test_subphases_walking():
    offs = jnp.asarray([0.0, 5.0])
    durs = jnp.asarray([5.0, 5.0])
    for phase in [0.0, 0.1, 0.25, 0.49, 0.5, 0.51, 0.75, 0.99]:
        c, s = ref_subphases(phase, [0, 5], [5, 5])
        cj = G.contact_subphase(jnp.asarray(phase), offs, durs, N)
        sj = G.swing_subphase(jnp.asarray(phase), offs, durs, N)
        np.testing.assert_allclose(np.asarray(cj), c, atol=1e-12)
        np.testing.assert_allclose(np.asarray(sj), s, atol=1e-12)


def test_subphases_standing_no_nan():
    c = G.contact_subphase(jnp.asarray(0.3), jnp.asarray([0.0, 0.0]),
                           jnp.asarray([10.0, 10.0]), N)
    s = G.swing_subphase(jnp.asarray(0.3), jnp.asarray([0.0, 0.0]),
                         jnp.asarray([10.0, 10.0]), N)
    np.testing.assert_allclose(np.asarray(c), [0.3, 0.3])
    np.testing.assert_allclose(np.asarray(s), [0.0, 0.0])
