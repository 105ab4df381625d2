"""3D HTML viewer export (hector/io/html_viz.py) -- the rviz analog."""

import json
import re

import numpy as np
import jax.numpy as jnp

from hector.io import html_viz
from hector.plant import srb
from hector.config import DEFAULT_CONFIG as CFG


def test_skeleton_points_shape_and_geometry():
    plant = srb.init_plant_state(CFG)
    pts = html_viz.skeleton_points(plant.position, plant.quat, plant.q)
    assert pts.shape == (26, 3)
    # trunk corners centered on the trunk origin
    np.testing.assert_allclose(pts[:8].mean(axis=0),
                               np.asarray(plant.position), atol=1e-5)
    # feet below the trunk, near the ground
    assert pts[13:17, 2].min() < 0.1
    # left leg points have y > right leg points (mean)
    assert pts[8:17, 1].mean() > pts[17:26, 1].mean()
    # every segment references a valid point
    assert all(0 <= a < 26 and 0 <= b < 26
               for a, b in html_viz.segments())


def test_export_html_roundtrip(tmp_path):
    frames = np.zeros((3, 26, 3))
    frames[:, :, 2] = 0.5
    contacts = np.asarray([[1, 0], [0, 1], [1, 1]])
    out = str(tmp_path / "view.html")
    html_viz.export_html(frames, contacts, out, dt_frame=0.005,
                         terrain=(0.03, 0.5))
    s = open(out).read()
    assert "<canvas" in s and "requestAnimationFrame" in s
    d = json.loads(re.search(r"const D=(\{.*?\});\n", s, re.S).group(1))
    assert len(d["pts"]) == 3 and len(d["pts"][0]) == 26
    assert d["terrain"] == [0.03, 0.5]
    assert d["contact"] == [[1, 0], [0, 1], [1, 1]]


def test_cli_export_html_end_to_end(tmp_path):
    import contextlib
    import io
    from hector import cli

    out = str(tmp_path / "e2e.html")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["export-html", out, "--vx", "0.4", "--seconds", "0.1"])
    rep = json.loads(buf.getvalue())
    assert rep["frames"] == 20
    s = open(out).read()
    assert len(s) > 5000 and "hector srb" in s
