"""Golden-fixture provenance: the committed .npz fixtures must be exactly
reproducible from the standalone reference transcription in
``tests/golden/generate_golden.py``.

This closes the audit chain: reference C++ formulas (cited file:line in the
generator) -> float64 numpy transcription -> certified optima -> committed
fixtures -> parity tests (test_kinematics.py / test_qp.py).

Equivalent CLI check:
    python tests/golden/generate_golden.py && git diff --exit-code tests/golden/
"""

import importlib.util
import io
import os
import zipfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        'generate_golden', os.path.join(HERE, 'golden', 'generate_golden.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


GG = _load_generator()


def _npz_bytes(arrays):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, 'w', zipfile.ZIP_STORED) as zf:
        for name in sorted(arrays):
            data = io.BytesIO()
            np.lib.format.write_array(data, np.asarray(arrays[name]),
                                      allow_pickle=False)
            info = zipfile.ZipInfo(name + '.npy',
                                   date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, data.getvalue())
    return buf.getvalue()


def test_kinematics_fixture_regenerates_byte_identically():
    regenerated = _npz_bytes(GG.generate_kinematics())
    with open(os.path.join(HERE, 'golden', 'kinematics.npz'), 'rb') as fh:
        committed = fh.read()
    assert regenerated == committed


def test_solver_fixture_regenerates_byte_identically():
    """~25 s: three certified active-set QP solves + scipy cross-checks."""
    regenerated = _npz_bytes(GG.generate_solver())
    with open(os.path.join(HERE, 'golden', 'solver.npz'), 'rb') as fh:
        committed = fh.read()
    assert regenerated == committed


def test_certified_solver_on_toy_qp():
    """The generator's certified QP solver on a hand-checkable problem:
    min (x0-1)^2 + (x1-2)^2  s.t.  0 <= x0 + x1 <= 1, 0 <= x0 - x1 <= 5.
    The unconstrained optimum (1,2) projects onto x0+x1=1 at (0,1), which
    violates x0-x1 >= 0; with both rows active the optimum is (0.5, 0.5)."""
    h = 2.0 * np.eye(2)
    g = np.array([-2.0, -4.0])
    a = np.array([[1.0, 1.0], [1.0, -1.0]])
    lb = np.array([0.0, 0.0])
    ub = np.array([1.0, 5.0])
    x = GG.certified_qp_solve(h, g, a, lb, ub)
    np.testing.assert_allclose(x, [0.5, 0.5], atol=1e-9)
