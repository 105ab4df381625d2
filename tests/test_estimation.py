"""Estimator subsystem tests."""

import numpy as np
import jax
import jax.numpy as jnp

from hector import estimation as E
from hector.plant import srb
from hector.config import DEFAULT_CONFIG as CFG


def test_cheater_matches_control_estimate():
    plant = srb.init_plant_state(CFG)
    est = E.cheater(plant)
    np.testing.assert_allclose(np.asarray(est.position),
                               np.asarray(plant.position))
    np.testing.assert_allclose(np.asarray(est.r_body), np.eye(3), atol=1e-7)


def test_noisy_sensors_statistics():
    plant = srb.init_plant_state(CFG)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    pos, vel, quat, gyro = jax.vmap(
        lambda k: E.noisy_sensors(k, plant))(keys)
    err = np.asarray(pos) - np.asarray(plant.position)
    assert abs(err.std() - 0.002) < 0.0005
    # quaternions stay unit
    np.testing.assert_allclose(np.linalg.norm(np.asarray(quat), axis=1),
                               1.0, atol=1e-6)


def test_filter_reduces_noise():
    plant = srb.init_plant_state(CFG)
    fs = E.init_filter_state(plant)
    keys = jax.random.split(jax.random.PRNGKey(1), 200)
    errs_raw, errs_filt = [], []
    for k in keys:
        pos, vel, quat, gyro = E.noisy_sensors(k, plant)
        fs, est = E.filtered(fs, pos, vel, quat, gyro)
        errs_raw.append(np.linalg.norm(np.asarray(vel - plant.v_world)))
        errs_filt.append(
            np.linalg.norm(np.asarray(est.v_world - plant.v_world)))
    assert np.mean(errs_filt[20:]) < 0.55 * np.mean(errs_raw[20:])
