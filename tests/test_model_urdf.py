"""URDF numeric cross-check: re-derive plant/model.py's transcribed
constants from the reference's xacro property sheet and assert equality.

hector/plant/model.py hand-transcribes hector_description/xacro/
{const,leg,robot}.xacro (with the fixed *_trans motor links lumped into
their parent links).  Tier-2 physics silently depends on that
transcription, so this test re-reads the ACTUAL xacro files from the
reference checkout, rebuilds every joint offset / axis / lumped inertial
with an independent implementation of the lumping, and compares.

Structural rules encoded here (cited, from leg.xacro):
  - hip joint:   origin (hip_offset_x, +-hip_offset_y, -hip_offset_z),
                 axis z               (robot.xacro:123-129, leg.xacro:9-13)
  - hip2 joint:  origin (hip2_offset_x, m*hip2_offset_y, -hip2_offset_z),
                 axis x               (leg.xacro:78-82)
  - thigh joint: origin (thigh_offset_x, m*thigh_offset_y, thigh_offset_z),
                 rpy (0, 0.25pi, 0), axis y      (leg.xacro:147-156)
  - calf joint:  origin (calf_offset_x, 0, -calf_offset_z),
                 rpy (0, -0.5pi, 0), axis y      (leg.xacro:241-245)
  - toe joint:   origin (toe_offset_x, 0, toe_offset_z),
                 rpy (0, 0.25pi, 0), axis y      (leg.xacro:281-285)
  - fixed trans links: hip_trans into hip (leg.xacro:55-75), hip2_trans
    into hip2 (:124-144), thigh1/2_trans into thigh (:194-238); their
    inertial rpy -pi/2 about x permutes diag(ixx,iyy,izz)->(ixx,izz,iyy)
  - mirrored (m=-1) quantities: every *_trans offset y, com y of
    thigh/calf/toe, hip2's com is written literally (leg.xacro:114)

Skipped wholesale if the reference checkout is unavailable.
"""

import os
import re

import numpy as np
import pytest

from hector.plant import model

XACRO_DIR = "/root/reference/Hector_ROS_Simulation/hector_description/xacro"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(XACRO_DIR, "const.xacro")),
    reason="reference hector_description checkout not available")


def _props():
    txt = open(os.path.join(XACRO_DIR, "const.xacro")).read()
    return {m.group(1): float(m.group(2)) for m in re.finditer(
        r'property name="(\w+)"\s+value="([-0-9.e]+)"', txt)}


def _rot_x90neg_diag(ixx, iyy, izz):
    # inertial <origin rpy="-pi/2 0 0"> on the trans links permutes the
    # diagonal (y<->z)
    return np.diag([ixx, izz, iyy])


def _lump(parts):
    m_tot = sum(p[0] for p in parts)
    com = sum(p[0] * np.asarray(p[1]) for p in parts) / m_tot
    inertia = np.zeros((3, 3))
    for m, c, i_c in parts:
        d = np.asarray(c) - com
        inertia += np.asarray(i_c) + m * (np.dot(d, d) * np.eye(3)
                                          - np.outer(d, d))
    return m_tot, com, inertia


def _xacro_leg(p, m):
    """Independent rebuild of the 5-joint lumped leg from the xacro
    property dict; m = mirror (+1 L / -1 R)."""
    def diag(prefix):
        return np.diag([p[prefix + "_ixx"], p[prefix + "_iyy"],
                        p[prefix + "_izz"]])

    trans_i = _rot_x90neg_diag(p["hip_trans_ixx"], p["hip_trans_iyy"],
                               p["hip_trans_izz"])
    t_m = p["hip_trans_mass"]
    hip = _lump([
        (p["hip_mass"],
         [p["hip_com_x"], p["hip_com_y"], p["hip_com_z"]], diag("hip")),
        (t_m, [p["hip_trans_offset_x"], p["hip_trans_offset_y"] * m,
               p["hip_trans_offset_z"]], trans_i)])
    hip2 = _lump([
        # hip2's inertial origin is a literal in leg.xacro:114 (not
        # mirrored): xyz="-0.033217 -0.010231 0"
        (p["hip2_mass"], [-0.033217, -0.010231, 0.0], diag("hip2")),
        (t_m, [p["hip2_trans_offset_x"], p["hip2_trans_offset_y"] * m,
               p["hip2_trans_offset_z"]], trans_i)])
    thigh = _lump([
        (p["thigh_mass"],
         [p["thigh_com_x"], p["thigh_com_y"] * m, p["thigh_com_z"]],
         diag("thigh")),
        (t_m, [p["thigh1_trans_offset_x"], p["thigh1_trans_offset_y"] * m,
               p["thigh1_trans_offset_z"]], trans_i),
        (t_m, [p["thigh2_trans_offset_x"], p["thigh2_trans_offset_y"] * m,
               p["thigh2_trans_offset_z"]], trans_i)])
    calf = (p["calf_mass"],
            np.array([p["calf_com_x"], p["calf_com_y"] * m,
                      p["calf_com_z"]]), diag("calf"))
    toe = (p["toe_mass"],
           np.array([p["toe_com_x"], p["toe_com_y"] * m, p["toe_com_z"]]),
           diag("toe"))

    offsets = np.array([
        [p["hip_offset_x"], p["hip_offset_y"] * m, -p["hip_offset_z"]],
        [p["hip2_offset_x"], p["hip2_offset_y"] * m, -p["hip2_offset_z"]],
        [p["thigh_offset_x"], p["thigh_offset_y"] * m, p["thigh_offset_z"]],
        [p["calf_offset_x"], 0.0, -p["calf_offset_z"]],
        [p["toe_offset_x"], 0.0, p["toe_offset_z"]],
    ])
    pre_pitch = [0.0, 0.0, 0.25 * np.pi, -0.5 * np.pi, 0.25 * np.pi]
    axes = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0]],
                    float)
    lumped = [hip, hip2, thigh, calf, toe]
    return offsets, pre_pitch, axes, lumped


def test_leg_constants_match_xacro():
    p = _props()
    models = model.stacked_leg_models()
    for leg, m in ((0, 1.0), (1, -1.0)):
        offsets, pre_pitch, axes, lumped = _xacro_leg(p, m)
        np.testing.assert_allclose(models["offset"][leg], offsets,
                                   atol=1e-12, err_msg=f"leg {leg} offsets")
        np.testing.assert_allclose(models["axis"][leg], axes, atol=1e-12)
        for j, ang in enumerate(pre_pitch):
            c, s = np.cos(ang), np.sin(ang)
            ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            np.testing.assert_allclose(models["pre"][leg, j], ry, atol=1e-12,
                                       err_msg=f"leg {leg} joint {j} pre")
        for j, (mass, com, inertia) in enumerate(lumped):
            np.testing.assert_allclose(models["mass"][leg, j], mass,
                                       rtol=1e-12)
            np.testing.assert_allclose(models["com"][leg, j], com,
                                       atol=1e-12,
                                       err_msg=f"leg {leg} joint {j} com")
            np.testing.assert_allclose(models["inertia"][leg, j], inertia,
                                       atol=1e-12,
                                       err_msg=f"leg {leg} joint {j} I")


def test_trunk_and_totals_match_xacro():
    p = _props()
    np.testing.assert_allclose(model.TRUNK_MASS, p["trunk_mass"])
    np.testing.assert_allclose(
        model.TRUNK_INERTIA,
        np.diag([p["trunk_ixx"], p["trunk_iyy"], p["trunk_izz"]]))
    # URDF total mass: trunk + 2 x (hip + hip2 + thigh + calf + toe links
    # + 4 trans links)
    leg_mass = (p["hip_mass"] + p["hip2_mass"] + p["thigh_mass"]
                + p["calf_mass"] + p["toe_mass"] + 4 * p["hip_trans_mass"])
    np.testing.assert_allclose(model.total_mass(),
                               p["trunk_mass"] + 2 * leg_mass, rtol=1e-12)


def test_limits_and_contact_geometry_match_xacro():
    p = _props()
    from hector.config import DEFAULT_CONFIG as CFG
    assert CFG.plant.torque_limit == p["hip_torque_max"] == 33.5
    assert CFG.plant.joint_vel_limit == p["hip_velocity_max"] == 21.0
    # toe collision box (leg.xacro:305-310): origin (toe_x, toe_y*mirror,
    # toe_z), box toe_length x toe_width x toe_height.  x and z corners
    # match the URDF exactly; y is a DOCUMENTED DIVERGENCE: the URDF sole
    # is toe_y = 19.4 mm outboard, production models it centered (the
    # controller's own foot model; rationale in model.py
    # CONTACT_POINTS_TOE comment), with the offset kept as the
    # ContactConfig.toe_y_offset sensitivity axis.
    half_l, half_w, half_h = (p["toe_length"] / 2, p["toe_width"] / 2,
                              p["toe_height"] / 2)
    cx, cy, cz = p["toe_x"], p["toe_y"], p["toe_z"]
    expect = np.array([
        [cx + half_l, half_w, cz - half_h],
        [cx + half_l, -half_w, cz - half_h],
        [cx - half_l, half_w, cz - half_h],
        [cx - half_l, -half_w, cz - half_h],
    ])
    np.testing.assert_allclose(model.CONTACT_POINTS_TOE, expect, atol=1e-12)
    assert model.TOE_BOX_Y_CENTER == cy   # the URDF offset, recorded
    # trunk collision box corners (robot.xacro:49-54)
    from hector.plant.rnea import TRUNK_CORNERS
    assert sorted(map(tuple, np.abs(TRUNK_CORNERS)))[0] == (
        p["trunk_length"] / 2, p["trunk_width"] / 2, p["trunk_height"] / 2)
