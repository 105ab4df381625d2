"""Live terminal viewer (hector/io/live.py + ``hector view``)."""

import contextlib
import io

import numpy as np
import jax.numpy as jnp

from hector import runtime as RT
from hector.io import live
from hector.plant import srb
from hector.config import DEFAULT_CONFIG as CFG


def test_render_frame_markers():
    plant = srb.init_plant_state(CFG)
    hips_w, feet_w, contact = live.frame_geometry(plant, CFG)
    frame = live.render_frame(
        np.asarray(plant.position), np.zeros(3), hips_w, feet_w,
        np.asarray([True, False]), np.asarray([200.0, 0.0]), 1.25,
        "cmd vx=+0.50")
    lines = frame.splitlines()
    assert len(lines) == live.H + 2                 # 2 HUD + canvas rows
    assert all(len(l) <= live.W for l in lines)
    body = "\n".join(lines[2:])
    assert "O" in body                              # trunk drawn
    assert "L" in body and "r" in body              # stance L, swing r
    assert "^" in body                              # force arrow (200 N)
    assert "#" in body                              # ground fill
    assert "t=  1.25s" in lines[0]
    assert "contact=[#.]" in lines[1]


def test_render_frame_stairs_terrain():
    plant = srb.init_plant_state(CFG)
    hips_w, feet_w, contact = live.frame_geometry(plant, CFG)
    flat = live.render_frame(np.asarray(plant.position), np.zeros(3),
                             hips_w, feet_w, contact, np.zeros(2), 0.0)
    stairs = live.render_frame(np.asarray(plant.position), np.zeros(3),
                               hips_w, feet_w, contact, np.zeros(2), 0.0,
                               step_height=0.2, step_length=0.4)
    # the stair ground profile differs from flat
    assert flat != stairs


def test_view_command_runs():
    """``hector view`` renders frames to stdout without a terminal."""
    from hector import cli

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["view", "--vx", "0.4", "--seconds", "0.05",
                  "--speed", "0"])
    out = buf.getvalue()
    assert out.count(live.ANSI_HOME) == 10          # 10 periods of 5 ms
    assert "Fz=" in out and "O" in out


def test_teleop_live_headless(monkeypatch):
    """``hector teleop --live`` driven headless through a fake terminal:
    keys steer, frames render, q quits."""
    from hector import cli
    from hector.io import keyboard as KB

    class FakeTerm:
        def __init__(self):
            self.keys = ["w", "w", None, None, "q"]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            pass

        def poll_key(self, timeout=0.0):
            return self.keys.pop(0) if self.keys else "q"

    monkeypatch.setattr(KB, "RawTerminal", lambda: FakeTerm())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(["teleop", "--live"])
    out = buf.getvalue()
    assert out.count(live.ANSI_HOME) == 4      # one frame per period
    assert "O" in out and "Fz=" in out
