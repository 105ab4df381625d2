"""Regenerate the golden parity fixtures from first principles.

This script is the auditable provenance of ``tests/golden/kinematics.npz``
and ``tests/golden/solver.npz``: a standalone float64 numpy transcription of
the reference's closed-form expressions (NO imports from the ``hector``
package), evaluated at pinned inputs, plus certified optima for the reduced
QPs.  Re-running it must reproduce the committed fixtures byte-identically:

    python tests/golden/generate_golden.py && git diff --exit-code tests/golden/

Transcribed reference formulas (paths relative to
/root/reference/Hector_ROS_Simulation/hector_control/):

- foot FK + force/moment Jacobians: src/common/LegController.cpp:108-195
  (symbolic expressions, offsets 0.3*3.14159 applied internally as at
  LegController.cpp:111-113);
- analytic 5-DoF leg IK: src/common/SwingLegController.cpp:157-187
  (M_PI offsets, side = -1 for leg 0);
- foot rotation matrices: ConvexMPC/SolverMPC.cpp:426-433;
- quat_to_rpy: SolverMPC.cpp:332-341 (incl. the 0.99999 asin clamp);
- euler_to_rotation (inverse euler-rate matrix): SolverMPC.cpp:66-89;
- continuous-time SRB-with-moments dynamics ct_ss_mats: SolverMPC.cpp:311-331
  (mass hardcoded 9.0 at the :423 call site);
- Euler discretization + condensing c2qp: SolverMPC.cpp:133-186 (power loops
  hardcoded to 10 steps);
- bounds U_b/L_b: SolverMPC.cpp:460-482 (BIG_NUMBER=5e10, f_max=500*gait);
- 16-row constraint block F_control: SolverMPC.cpp:485-550 (mu=2.0, lt=0.09,
  lh=0.06, including the leg-2 heel row's missing minus sign on M_vec at
  SolverMPC.cpp:544 -- reproduced verbatim);
- cost qH/qg: SolverMPC.cpp:569-570;
- swing-leg variable/constraint elimination: SolverMPC.cpp:589-637
  (near_zero/near_two tests and the quirky cs index arithmetic).

Certified optima (s{k}_q_soln) stand in for qpOASES: each reduced QP is
solved with scipy trust-constr and polished by an exact active-set KKT
solve; the result is only accepted with a full optimality certificate
(primal feasibility, stationarity, dual signs, complementarity) -- for a
convex QP that certificate is a proof of global optimality.

Input provenance: the pinned states below are arbitrary plausible robot
states (literals; repr round-trips exactly).  The kinematics inputs are
pinned pseudo-random joint vectors in the URDF's +-45/100 deg joint range.
"""

import io
import os
import zipfile

import numpy as np

# ---------------------------------------------------------------------------
# Constants (cited in the module docstring)
# ---------------------------------------------------------------------------

PI_SOLVER = 3.14159265359      # ConvexMPCLocomotion.cpp:300, SolverMPC.cpp:380
BIG_NUMBER = 5e10              # SolverMPC.cpp:16
F_MAX = 500.0                  # setup_problem arg, ConvexMPCLocomotion.cpp:410
DT_MPC = 0.04                  # dt * iterationsBetweenMPC
HORIZON = 10
MPC_MASS = 9.0                 # SolverMPC.cpp:423
GRAVITY = 9.81
MU = 2.0                       # SolverMPC.cpp:488
LT, LH = 0.09, 0.06            # SolverMPC.cpp:489-490
MX_BOUND = 0.01                # SolverMPC.cpp:473
I_BODY = np.diag([0.5413, 0.5200, 0.0691])   # RobotState.cpp:45
WEIGHTS = np.array([100.0, 100.0, 250.0, 200.0, 200.0, 300.0,
                    1.0, 1.0, 1.0, 1.0, 1.0, 1.0])
ALPHA = np.array([1e-4, 1e-4, 5e-4, 1e-4, 1e-4, 5e-4,
                  1e-2, 1e-2, 1e-2, 1e-2, 1e-2, 1e-2])
# uniform-PI offset vector used to PREPARE inputs (data.q after updateData +
# updateMPCIfNeeded applications; the npz convention documented in
# tests/test_kinematics.py: the build uses PI_SOLVER uniformly, the
# reference's own first application uses 3.14159 -- difference < 3e-6 rad,
# absorbed by the kinematics tests' 2e-5 tolerance)
OFFSETS = np.array([0.0, 0.0, 0.3 * PI_SOLVER, -0.6 * PI_SOLVER,
                    0.3 * PI_SOLVER])

# ---------------------------------------------------------------------------
# Pinned inputs
# ---------------------------------------------------------------------------

SCENARIOS = [
    # s0: standing gait, mild tilt
    dict(
        rpy=[0.02, -0.03, 0.1],
        p=[0.01, -0.005, 0.54],
        v=[0.05, 0.01, -0.02],
        w=[0.01, -0.02, 0.05],
        q_raw=[-0.29684081726065514, 0.19273705102965977, 0.1782416572512277,
               -0.019239028293767557, -0.11818054390841187,
               -0.132944632739536, -0.14707824740752523,
               -0.03295421647041208, 0.0027289553747719686,
               0.03209841124469548],
        r_feet=[[0.02500381866418668, 0.08102742760980775,
                 -0.547993348603551],
                [-0.014111447961216977, -0.09099171240037633,
                 -0.5250578621841495]],
        gait=[[1.0, 1.0]] * 10,
    ),
    # s1: walking gait (leg 0 stance first), forward walk
    dict(
        rpy=[0.01, 0.04, 0.3],
        p=[0.2, 0.05, 0.55],
        v=[0.45, -0.03, 0.01],
        w=[0.1, 0.05, -0.1],
        q_raw=[0.06752376256381848, -0.27363479522316997,
               -0.2785918327358423, 0.008933292162822182,
               -0.02027638480482652, 0.2503006639157113,
               0.07753575269460627, 0.008470587959708342,
               -0.0018759387638974667, -0.1514910467836015],
        r_feet=[[0.039820011337375706, 0.07488716917764651,
                 -0.5613876520705761],
                [-0.018293523231449876, -0.06044159409272461,
                 -0.5635915186456862]],
        gait=[[1, 0], [1, 0], [0, 1], [0, 1], [0, 1],
              [0, 1], [0, 1], [1, 0], [1, 0], [1, 0]],
    ),
    # s2: walking gait mid-phase, backward-left walk with yaw
    dict(
        rpy=[-0.08, 0.06, -0.5],
        p=[-0.05, 0.1, 0.52],
        v=[-0.2, 0.1, 0.03],
        w=[-0.2, 0.1, 0.3],
        q_raw=[0.19802863788104735, -0.20732335136313607,
               -0.13944041726172873, 0.22819929238849718,
               0.005874485921053885, 0.20829014781952154,
               0.08383030016551574, 0.1450625684171143,
               -0.2451026369621726, 0.02468629282589324],
        r_feet=[[0.000471761021700233, 0.07768128483527358,
                 -0.5252185475759118],
                [-0.042303914240587576, -0.09197573104052019,
                 -0.539850630317917]],
        gait=[[0, 1], [0, 1], [0, 1], [1, 0], [1, 0],
              [1, 0], [1, 0], [1, 0], [0, 1], [0, 1]],
    ),
]

# Kinematics fixture inputs: 8 pinned pseudo-random joint configurations
# (2 legs x 5 joints, within the URDF joint ranges), IK targets, and the
# "data.q" vectors (post single-offset mutation) the IK's toe row reads.
KIN_Q_RAW = [[[-0.29771870975681813, 0.22773940108257784, 0.385402451724846, -0.3490292285503138, -0.40588400637756983], [0.23161505130710214, 0.10210955617717465, -0.36212101321463663, 0.47276903844728746, -0.08150538879024183]], [[0.3564641913997403, 0.48100646485147447, -0.025814985266046753, 0.056584834739251466, -0.438978174783343], [0.2675068843757914, 0.14407872670492639, -0.0732848044542237, -0.4174316425971506, -0.010188494334299358]], [[-0.4510932571185877, 0.39456938716033574, -0.33597387228541864, 0.03887868422832841, -0.47217148136552023], [0.11491577696680755, 0.12491572529158124, -0.30322823704749147, -0.3902011078805362, 0.18826411693780276]], [[-0.19204713323107647, -0.464703119925686, 0.4378648727105794, 0.11218396983810675, 0.1334179137654231], [0.27279474127374626, 0.003811485259858527, -0.40325397512204, -0.35503589872747576, 0.26555775860820174]], [[0.3916823778882993, 0.4728217403613084, 0.4676776320063666, -0.44851239202775284, -0.1719364332333021], [-0.44006129248611314, -0.2546561189106591, 0.031146445791310873, 0.2247862162305978, 0.3702266677530571]], [[0.09311744280509093, 0.3122328737262009, -0.40542990801345524, 0.027685940580384538, -0.39952655002296233], [-0.2984171343221065, -0.13079309769107694, -0.32760253805303996, -0.1142030068562997, 0.10631300757968853]], [[0.08570636137425591, 0.226679813310664, -0.38255917585854315, -0.28395406913742793, -0.485791494369436], [0.32250528190918426, -0.3931157068756741, -0.30324295556503644, -0.27434358359676403, 0.09649707921033313]], [[0.27357199996160897, 0.2835335226470803, 0.24577913562411235, -0.3847595718748609, 0.4685581764131568], [0.27449709973330494, -0.4787062374114911, -0.06803734809041351, -0.18472051537242662, -0.413308180786642]]]
IK_TARGET = [[[0.05327842700595631, -0.05831559385721592, -0.4562701992835405], [0.14568324739104752, -0.005895189957061148, -0.5002425518325151]], [[0.05628625944285204, -0.07494864483941939, -0.5104631828833289], [-0.1299121249805999, -0.04063912222362636, -0.45817017484366684]], [[0.060219743314502694, -0.02190795481531023, -0.49211083822923557], [-0.015249504012210341, -0.03258038066877621, -0.4520108539597717]], [[0.030612903874042252, 0.08980697123140244, -0.3827634195893156], [-0.1186755027148555, -0.09954624653642952, -0.5107912443382225]], [[0.02051673971024559, -0.0905509952316212, -0.4941201706684243], [-0.08136003783294714, -0.07643216951421827, -0.48888145364187363]], [[0.12735979172280334, 0.062466716335755096, -0.36893093903723306], [0.14431202075876134, 0.015113408078867963, -0.496057515969781]], [[0.09730265274596858, -0.004808304268057825, -0.35375071979040307], [-0.07292389287031789, -0.0037612325519649215, -0.5030424860005793]], [[0.0269684120648509, 0.0886815520945976, -0.3591578476917515], [0.052765319410650185, 0.002003646206482218, -0.39000436575468517]]]
IK_QDATA = [[[-0.29771870975681813, 0.22773940108257784, 1.327880247801846, -2.233984820704314, 0.5365937896994302], [0.23161505130710214, 0.10210955617717465, 0.5803567828623634, -1.4121865537067126, 0.8609724072867582]], [[0.3564641913997403, 0.48100646485147447, 0.9166628108109532, -1.8283707574147485, 0.503499621293657], [0.2675068843757914, 0.14407872670492639, 0.8691929916227763, -2.3023872347511505, 0.9322893017427006]], [[-0.4510932571185877, 0.39456938716033574, 0.6065039237915814, -1.8460769079256716, 0.47030631471147977], [0.11491577696680755, 0.12491572529158124, 0.6392495590295085, -2.275156700034536, 1.1307419130148029]], [[-0.19204713323107647, -0.464703119925686, 1.3803426687875793, -1.7727716223158931, 1.075895709842423], [0.27279474127374626, 0.003811485259858527, 0.53922382095496, -2.2399914908814758, 1.2080355546852017]], [[0.3916823778882993, 0.4728217403613084, 1.4101554280833666, -2.3334679841817527, 0.7705413628436979], [-0.44006129248611314, -0.2546561189106591, 0.9736242418683109, -1.6601693759234022, 1.3127044638300571]], [[0.09311744280509093, 0.3122328737262009, 0.5370478880635448, -1.8572696515736156, 0.5429512460540377], [-0.2984171343221065, -0.13079309769107694, 0.61487525802396, -1.9991585990102996, 1.0487908036566886]], [[0.08570636137425591, 0.226679813310664, 0.5599186202184568, -2.168909661291428, 0.45668630170756397], [0.32250528190918426, -0.3931157068756741, 0.6392348405119636, -2.159299175750764, 1.0389748752873331]], [[0.27357199996160897, 0.2835335226470803, 1.1882569317011122, -2.269715164028861, 1.4110359724901569], [0.27449709973330494, -0.4787062374114911, 0.8744404479865865, -2.0696761075264267, 0.529169615290358]]]


# ---------------------------------------------------------------------------
# Reference transcriptions: kinematics (LegController.cpp:108-195)
# ---------------------------------------------------------------------------

def leg_fk_and_jacobians(q_raw5, leg):
    """Transcription of computeLegJacobianAndPosition.

    Applies the reference's own 0.3*3.14159 knee-chain offsets internally
    (LegController.cpp:111-113) -- q_raw5 is the RAW motor vector.
    Returns (J_fm (6,5), J_f (3,5), p (3,)).
    """
    q = np.array(q_raw5, dtype=np.float64).copy()
    q[2] += 0.3 * 3.14159
    q[3] -= 0.6 * 3.14159
    q[4] += 0.3 * 3.14159
    q0, q1, q2, q3, q4 = q
    side = 1.0 if leg == 0 else -1.0
    s0, c0 = np.sin(q0), np.cos(q0)
    s1, c1 = np.sin(q1), np.cos(q1)
    s2, c2 = np.sin(q2), np.cos(q2)
    s3, c3 = np.sin(q3), np.cos(q3)
    s4, c4 = np.sin(q4), np.cos(q4)
    s23, c23 = np.sin(q2 + q3), np.cos(q2 + q3)
    s234, c234 = np.sin(q2 + q3 + q4), np.cos(q2 + q3 + q4)

    # chain sums (LegController.cpp:131-186)
    se = 0.04 * s234 + 0.22 * s23 + 0.22 * s2
    ce = 0.04 * c234 + 0.22 * c23 + 0.22 * c2
    se2 = 0.04 * s234 + 0.22 * s23
    ce2 = 0.04 * c234 + 0.22 * c23
    se3 = 0.04 * s234
    ce3 = 0.04 * c234
    hy = 0.018 * side + 0.0025

    jfm = np.zeros((6, 5))
    jfm[0, 0] = s0 * (se + 0.0135) + c0 * (0.015 * side + c1 * hy - s1 * ce)
    jfm[1, 0] = s0 * (0.015 * side + c1 * hy - s1 * ce) - c0 * (se + 0.0135)
    jfm[2, 0] = 0.0
    jfm[3:6, 0] = (0.0, 0.0, 1.0)
    jfm[0, 1] = -s0 * (s1 * hy + c1 * ce)
    jfm[1, 1] = c0 * (s1 * hy + c1 * ce)
    jfm[2, 1] = s1 * ce - c1 * hy
    jfm[3:6, 1] = (c0, s0, 0.0)
    for col, (sx, cx) in zip((2, 3, 4), ((se, ce), (se2, ce2), (se3, ce3))):
        jfm[0, col] = s0 * s1 * sx - c0 * cx
        jfm[1, col] = -s0 * cx - c0 * s1 * sx
        jfm[2, col] = c1 * sx
        jfm[3:6, col] = (-c1 * s0, c0 * c1, s1)
    jf = jfm[0:3].copy()

    # foot position (LegController.cpp:190-194); note the FK's own constants
    # (toe 9/250 = 0.036) differ from the Jacobian's 0.04 -- reference quirk
    a = c0 * s2 + c2 * s0 * s1
    b = c0 * c2 - s0 * s1 * s2
    cc = c2 * s0 + c0 * s1 * s2
    d = s0 * s2 - c0 * c2 * s1
    p = np.zeros(3)
    p[0] = (-(3 * c0) / 200 - (9 * s4 * (c3 * b - s3 * a)) / 250
            - (11 * c0 * s2) / 50 - (side * s0) / 50 - (11 * c3 * a) / 50
            - (11 * s3 * b) / 50 - (9 * c4 * (c3 * a + s3 * b)) / 250
            - (23 * c1 * side * s0) / 1000 - (11 * c2 * s0 * s1) / 50)
    p[1] = ((c0 * side) / 50 - (9 * s4 * (c3 * cc - s3 * d)) / 250
            - (3 * s0) / 200 - (11 * s0 * s2) / 50 - (11 * c3 * d) / 50
            - (11 * s3 * cc) / 50 - (9 * c4 * (c3 * d + s3 * cc)) / 250
            + (23 * c0 * c1 * side) / 1000 + (11 * c0 * c2 * s1) / 50)
    p[2] = ((23 * side * s1) / 1000 - (11 * c1 * c2) / 50
            - (9 * c4 * (c1 * c2 * c3 - c1 * s2 * s3)) / 250
            + (9 * s4 * (c1 * c2 * s3 + c1 * c3 * s2)) / 250
            - (11 * c1 * c2 * c3) / 50 + (11 * c1 * s2 * s3) / 50
            - 3.0 / 50.0)
    return jfm, jf, p


def foot_rotation(q5):
    """Transcription of the R_foot_L/R symbolic matrices
    (SolverMPC.cpp:426-433), evaluated at the given (already offset) angles.
    """
    q0, q1, q2, q3, q4 = np.asarray(q5, dtype=np.float64)
    s0, c0 = np.sin(q0), np.cos(q0)
    s1, c1 = np.sin(q1), np.cos(q1)
    s2, c2 = np.sin(q2), np.cos(q2)
    s3, c3 = np.sin(q3), np.cos(q3)
    s4, c4 = np.sin(q4), np.cos(q4)
    s234, c234 = np.sin(q2 + q3 + q4), np.cos(q2 + q3 + q4)
    a = c0 * s2 + c2 * s0 * s1
    b = c0 * c2 - s0 * s1 * s2
    cc = c2 * s0 + c0 * s1 * s2
    d = s0 * s2 - c0 * c2 * s1
    r = np.zeros((3, 3))
    r[0, 0] = -s4 * (c3 * a + s3 * b) - c4 * (s3 * a - c3 * b)
    r[0, 1] = -c1 * s0
    r[0, 2] = c4 * (c3 * a + s3 * b) - s4 * (s3 * a - c3 * b)
    r[1, 0] = c4 * (c3 * cc - s3 * d) - s4 * (s3 * cc + c3 * d)
    r[1, 1] = c0 * c1
    r[1, 2] = c4 * (s3 * cc + c3 * d) + s4 * (c3 * cc - s3 * d)
    r[2, 0] = -s234 * c1
    r[2, 1] = s1
    r[2, 2] = c234 * c1
    return r


def leg_ik(target, q_data5, leg):
    """Transcription of swingLegController::computeIK
    (SwingLegController.cpp:157-187).  side = -1 for leg 0 (note: OPPOSITE
    of the FK's side convention -- reference quirk).  q_data5 is data.q
    (post single-offset mutation); the toe row reads -q(3)-q(2) from it.
    """
    side = -1.0 if leg == 0 else 1.0
    hip_roll = np.array([0.0465 - 0.06, 0.0, -0.126 + 2 * (-0.0705)])
    f = np.asarray(target, dtype=np.float64) - hip_roll
    d3 = np.sqrt(np.sum(f * f))
    d_yoz = np.sqrt(f[1] ** 2 + f[2] ** 2)
    dh = 0.0205
    dv = np.sqrt(max(0.00001, d_yoz ** 2 - dh ** 2))
    d_xoz = (d3 ** 2 - dh ** 2) ** 0.5
    clamp = lambda v: min(1.0, max(-1.0, v))
    acos_arg1 = clamp(d_xoz / (2.0 * 0.22))
    acos_arg2 = clamp(dv / d_xoz)
    divisor = abs(f[0])
    if divisor == 0.0:
        divisor = 1e-6
    ja = np.zeros(5)
    ja[0] = 0.0
    ja[1] = (np.arcsin(clamp(f[1] / d_yoz))
             + np.arcsin(clamp(dh * side / d_yoz)))
    ja[2] = np.arccos(acos_arg1) - np.arccos(acos_arg2) * f[0] / divisor
    ja[3] = 2.0 * np.arcsin(clamp(d_xoz / 2.0 / 0.22)) - np.pi
    ja[4] = -q_data5[3] - q_data5[2]
    ja[2] -= 0.3 * np.pi
    ja[3] += 0.6 * np.pi
    ja[4] -= 0.3 * np.pi
    return ja


# ---------------------------------------------------------------------------
# Reference transcriptions: solver pipeline (SolverMPC.cpp)
# ---------------------------------------------------------------------------

def rpy_to_quat(rpy):
    """ZYX euler -> wxyz quaternion (input preparation only; the reference
    consumes quaternions from Gazebo and never does this conversion)."""
    r, p, y = np.asarray(rpy, dtype=np.float64)
    cr, sr = np.cos(r / 2), np.sin(r / 2)
    cp, sp = np.cos(p / 2), np.sin(p / 2)
    cy, sy = np.cos(y / 2), np.sin(y / 2)
    return np.array([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy])


def quat_to_rpy(q):
    """SolverMPC.cpp:332-341 (with the 0.99999 asin clamp)."""
    w, x, y, z = q
    as_ = min(2.0 * (w * y - x * z), 0.99999)
    return np.array([
        np.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y)),
        np.arcsin(as_),
        np.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))])


def quat_to_rot(q):
    """Eigen Quaternion::toRotationMatrix (body->world), wxyz."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def euler_to_rotation(roll, pitch, yaw):
    """SolverMPC.cpp:66-89: returns Rb.inverse() -- the euler-rate map."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    rb = np.array([[cy * cp, -sy, 0.0],
                   [sy * cp, cy, 0.0],
                   [-sp, 0.0, 1.0]])
    return np.linalg.inv(rb)


def ct_ss_mats(i_world, m, r_feet, r_yaw):
    """SolverMPC.cpp:311-331.  r_feet: (2,3) rows per leg."""
    a = np.zeros((13, 13))
    a[0:3, 6:9] = r_yaw
    a[3:6, 9:12] = np.eye(3)
    a[9:12, 12] = (0.0, 0.0, -1.0)
    b = np.zeros((13, 12))
    i_inv = np.linalg.inv(i_world)
    for leg in range(2):
        r = r_feet[leg]
        skew = np.array([[0.0, -r[2], r[1]],
                         [r[2], 0.0, -r[0]],
                         [-r[1], r[0], 0.0]])
        b[6:9, 3 * leg:3 * leg + 3] = i_inv @ skew
    b[6:9, 6:9] = i_inv
    b[6:9, 9:12] = i_inv
    b[9:12, 0:3] = np.eye(3) / m
    b[9:12, 3:6] = np.eye(3) / m
    return a, b


def c2qp(a_ct, b_ct, dt):
    """SolverMPC.cpp:133-186: Euler discretization + condensing, power loops
    hardcoded to 10 steps (the reference ignores its horizon argument)."""
    acd = np.eye(13) + dt * a_ct
    bcd = dt * b_ct
    a_qp = np.zeros((130, 13))
    powers = [np.eye(13)]
    for i in range(10):
        # reference computes each power by a fresh product loop; the result
        # is identical to the cumulative product chain
        acdm = np.eye(13)
        for _ in range(i + 1):
            acdm = acdm @ acd
        a_qp[13 * i:13 * i + 13] = acdm
        powers.append(acdm)
    b_qp = np.zeros((130, 120))
    for i in range(10):
        for j in range(i + 1):
            b_qp[13 * i:13 * i + 13, 12 * j:12 * j + 12] = (
                powers[i - j] @ bcd)
    return a_qp, b_qp


def build_bounds(gait):
    """SolverMPC.cpp:460-482: U_b/L_b as (horizon, 16) arrays."""
    ub = np.zeros((HORIZON, 16))
    lb = np.zeros((HORIZON, 16))
    for leg in range(2):
        for i in range(HORIZON):
            for j in range(4):
                ub[i, 8 * leg + j] = BIG_NUMBER
                lb[i, 8 * leg + j] = 0.0
            ub[i, 8 * leg + 4] = MX_BOUND
            ub[i, 8 * leg + 5] = 0.0
            ub[i, 8 * leg + 6] = 0.0
            ub[i, 8 * leg + 7] = F_MAX * gait[i][leg]
            lb[i, 8 * leg + 4] = 0.0
            lb[i, 8 * leg + 5] = -BIG_NUMBER
            lb[i, 8 * leg + 6] = -BIG_NUMBER
            lb[i, 8 * leg + 7] = 0.0
    return lb, ub


def build_f_control(r_foot_l, r_foot_r, r_body_world):
    """SolverMPC.cpp:485-550: the 16x12 per-step constraint block.

    Row 14 (leg-2 heel) keeps the reference's missing minus sign on M_vec
    (SolverMPC.cpp:544) -- verbatim quirk.
    """
    lt_vec = np.array([0.0, 0.0, LT])
    lh_vec = np.array([0.0, 0.0, LH])
    m_vec = np.array([0.0, 1.0, 0.0])
    msel = np.array([1.0, 0.0, 0.0])
    rl = r_foot_l.T @ r_body_world.T      # R_foot^T R^T
    rr = r_foot_r.T @ r_body_world.T
    f = np.zeros((16, 12))
    f[0, 0:3] = (-MU, 0.0, 1.0)
    f[1, 0:3] = (MU, 0.0, 1.0)
    f[2, 0:3] = (0.0, -MU, 1.0)
    f[3, 0:3] = (0.0, MU, 1.0)
    f[4, 6:9] = msel @ rl
    f[5, 0:3] = -lt_vec @ rl
    f[5, 6:9] = m_vec @ rl
    f[6, 0:3] = -lh_vec @ rl
    f[6, 6:9] = -m_vec @ rl
    f[7, 0:3] = (0.0, 0.0, 2.0)
    f[8, 3:6] = (-MU, 0.0, 1.0)
    f[9, 3:6] = (MU, 0.0, 1.0)
    f[10, 3:6] = (0.0, -MU, 1.0)
    f[11, 3:6] = (0.0, MU, 1.0)
    f[12, 9:12] = msel @ rr
    f[13, 3:6] = -lt_vec @ rr
    f[13, 9:12] = m_vec @ rr
    f[14, 3:6] = -lh_vec @ rr
    f[14, 9:12] = m_vec @ rr      # sign quirk: reference omits the minus
    f[15, 3:6] = (0.0, 0.0, 2.0)
    return f


def near_zero(a):
    return -1e-4 < a < 1e-4


def swing_elimination(lb_flat, ub_flat, fmat):
    """SolverMPC.cpp:589-637: var_elim/con_elim from lb==ub==0 rows whose
    coefficient is ~2 (the doubled-Fz gait rows), incl. the quirky cs index
    arithmetic.  Returns (keep_v (120,), keep_c (160,)) boolean masks."""
    n_cons, n_vars = fmat.shape
    var_elim = np.zeros(n_vars, dtype=bool)
    con_elim = np.zeros(n_cons, dtype=bool)
    for i in range(n_cons):
        if not (near_zero(lb_flat[i]) and near_zero(ub_flat[i])):
            continue
        for j in range(n_vars):
            if near_zero(fmat[i, j] - 2.0):
                if j % 2 == 0:
                    cs = (j + 4) // 6 * 8 - 1
                else:
                    cs = (j + 1) // 6 * 8 + 7
                var_elim[[j + 6, j + 5, j + 4, j - 2, j - 1, j]] = True
                con_elim[cs - 7:cs + 1] = True
    return ~var_elim, ~con_elim


# ---------------------------------------------------------------------------
# Certified QP solve (stands in for qpOASES)
# ---------------------------------------------------------------------------

def certified_qp_solve(h, g, a, lb, ub):
    """Solve min 1/2 x'Hx + g'x  s.t.  lb <= Ax <= ub  to optimality and
    PROVE it.

    Method: textbook primal active-set (Nocedal & Wright, Numerical
    Optimization, alg. 16.3) starting from the always-feasible x = 0 (every
    row of this QP family admits 0: friction/Fz rows have lb = 0, Mx rows
    [0, 0.01], line-contact rows [-BIG, 0]).  The result is accepted only
    with a full KKT certificate (primal feasibility, stationarity, dual
    signs) -- for a strictly convex QP that certificate implies global
    optimality -- and cross-checked against an independent scipy
    trust-constr solve of the same problem.
    """
    from scipy.optimize import minimize, LinearConstraint

    n = h.shape[0]
    sym = 0.5 * (h + h.T)
    m = a.shape[0]
    finite_lb = lb > -1e9
    finite_ub = ub < 1e9
    x = np.zeros(n)
    r0 = a @ x
    assert (r0 >= lb - 1e-12).all() and (r0 <= ub + 1e-12).all(), \
        'x = 0 must be feasible'

    # working set: side[i] = -1 (row active at lb), +1 (at ub), 0 (inactive)
    side = np.zeros(m, dtype=np.int8)
    lam = np.zeros(0)
    rows = np.zeros(0, dtype=int)
    for _ in range(3000):
        rows = np.where(side != 0)[0]
        k = len(rows)
        a_w = a[rows]
        kkt = np.zeros((n + k, n + k))
        kkt[:n, :n] = sym
        kkt[:n, n:] = a_w.T
        kkt[n:, :n] = a_w
        rhs = np.concatenate([-(sym @ x + g), np.zeros(k)])
        sol = np.linalg.solve(kkt, rhs)
        d, y = sol[:n], sol[n:]
        lam = -y        # grad f(x+d) = a_w' lam at the EQP solution

        if np.abs(d).max() < 1e-11 * (1.0 + np.abs(x).max()):
            # multiplier signs: lower-active rows need lam >= 0,
            # upper-active rows lam <= 0
            score = np.where(side[rows] < 0, lam, -lam)
            if k == 0 or score.min() > -1e-10:
                break                      # KKT satisfied -> optimal
            side[rows[np.argmin(score)]] = 0   # drop worst wrong sign
            continue

        # line search to the nearest blocking constraint
        r = a @ x
        ad = a @ d
        alpha = 1.0
        block = -1
        block_side = 0
        for i in range(m):
            if side[i] != 0:
                continue
            if ad[i] > 1e-13 and finite_ub[i]:
                ai = (ub[i] - r[i]) / ad[i]
                if ai < alpha:
                    alpha, block, block_side = ai, i, 1
            elif ad[i] < -1e-13 and finite_lb[i]:
                ai = (lb[i] - r[i]) / ad[i]
                if ai < alpha:
                    alpha, block, block_side = ai, i, -1
        x = x + max(alpha, 0.0) * d
        if block >= 0:
            side[block] = block_side
    else:
        raise RuntimeError('active-set solve did not converge')

    # --- optimality certificate ---
    r = a @ x
    assert (r >= lb - 1e-7).all() and (r <= ub + 1e-7).all(), 'infeasible'
    grad = sym @ x + g
    stat = grad - a[rows].T @ lam
    scale = max(1.0, np.abs(grad).max())
    assert np.abs(stat).max() < 1e-6 * scale, \
        f'stationarity residual {np.abs(stat).max()}'
    assert np.where(side[rows] < 0, lam >= -1e-6, lam <= 1e-6).all(), \
        'dual sign violation'

    # --- independent cross-check (scipy trust-constr) ---
    obj = lambda z: 0.5 * z @ sym @ z + g @ z
    res = minimize(
        obj, x, jac=lambda z: sym @ z + g, hess=lambda z: sym,
        method='trust-constr',
        constraints=[LinearConstraint(a, lb, ub)],
        options=dict(gtol=1e-10, xtol=1e-12, maxiter=2000))
    scale_f = max(1.0, abs(obj(x)))
    assert obj(x) <= res.fun + 1e-6 * scale_f, \
        f'scipy found a better point: {obj(x)} vs {res.fun}'
    return x


# ---------------------------------------------------------------------------
# Scenario pipeline
# ---------------------------------------------------------------------------

def solve_scenario(sc):
    """Full solve_mpc transcription (SolverMPC.cpp:371-733) for one pinned
    scenario; returns the npz fields."""
    p = np.array(sc['p'])
    v = np.array(sc['v'])
    w = np.array(sc['w'])
    q_raw = np.array(sc['q_raw'])
    r_feet = np.array(sc['r_feet'])
    gait = np.array(sc['gait'], dtype=np.float64)

    quat = rpy_to_quat(sc['rpy'])
    rpy = quat_to_rpy(quat)

    # update->joint_angles: data.q after updateData's offset mutation
    # (LegController.cpp:111-113) plus updateMPCIfNeeded's second
    # application + fmod (ConvexMPCLocomotion.cpp:300-313); the npz uses
    # the uniform-PI convention (see OFFSETS above)
    joint_angles = q_raw + 2.0 * np.tile(OFFSETS, 2)
    joint_angles = np.fmod(joint_angles, 2.0 * PI_SOLVER)

    # reference trajectory over the horizon (pinned recipe: constant-yaw,
    # x extrapolated at v, y/z held -- arbitrary plausible MPC reference)
    traj = np.zeros((HORIZON, 12))
    i = np.arange(HORIZON)
    traj[:, 2] = sc['rpy'][2]
    traj[:, 3] = p[0] + i * DT_MPC * v[0]
    traj[:, 4] = p[1]
    traj[:, 5] = 0.55
    traj[:, 9] = v[0]
    traj[:, 10] = v[1]

    # --- solve_mpc body ---
    q_solver = joint_angles + np.tile(OFFSETS, 2)   # third application
    q_solver = np.fmod(q_solver, 2.0 * PI_SOLVER)   # SolverMPC.cpp:390-393
    r_body = quat_to_rot(quat)                       # rs.R (body->world)
    rb = euler_to_rotation(rpy[0], rpy[1], rpy[2])
    x0 = np.concatenate([rpy, p, w, v, [GRAVITY]])
    i_world = r_body @ I_BODY @ r_body.T
    a_ct, b_ct = ct_ss_mats(i_world, MPC_MASS, r_feet, rb)
    r_foot_l = foot_rotation(q_solver[0:5])
    r_foot_r = foot_rotation(q_solver[5:10])
    a_qp, b_qp = c2qp(a_ct, b_ct, DT_MPC)

    s_diag = np.tile(np.concatenate([WEIGHTS, [0.0]]), HORIZON)
    x_d = np.zeros(13 * HORIZON)
    for k in range(HORIZON):
        x_d[13 * k:13 * k + 12] = traj[k]
    lb2, ub2 = build_bounds(gait)
    f_control = build_f_control(r_foot_l, r_foot_r, r_body)
    fmat = np.kron(np.eye(HORIZON), f_control)
    alpha_rep = np.diag(np.tile(ALPHA, HORIZON))
    bs = b_qp.T * s_diag[None, :]
    qh = 2.0 * (bs @ b_qp + alpha_rep)
    qg = 2.0 * (bs @ (a_qp @ x0 - x_d))

    keep_v, keep_c = swing_elimination(
        lb2.reshape(-1), ub2.reshape(-1), fmat)
    h_red = qh[np.ix_(keep_v, keep_v)]
    g_red = qg[keep_v]
    a_red = fmat[np.ix_(keep_c, keep_v)]
    lb_red = lb2.reshape(-1)[keep_c]
    ub_red = ub2.reshape(-1)[keep_c]

    x_red = certified_qp_solve(h_red, g_red, a_red, lb_red, ub_red)
    q_soln = np.zeros(12 * HORIZON)
    q_soln[keep_v] = x_red

    return dict(
        p=p, v=v, w=w, quat=quat, q_raw=q_raw, joint_angles=joint_angles,
        x0=x0, traj=traj, r_feet=r_feet, gait=gait, qH=qh, qg=qg,
        F=f_control, Lb=lb2, Ub=ub2, keep_v=keep_v, q_soln=q_soln)


def generate_solver():
    arrays = {'weights': WEIGHTS, 'alpha': ALPHA}
    for k, sc in enumerate(SCENARIOS):
        for name, val in solve_scenario(sc).items():
            arrays[f's{k}_{name}'] = np.asarray(val)
    return arrays


def generate_kinematics():
    q_raw = np.array(KIN_Q_RAW)
    ik_target = np.array(IK_TARGET)
    ik_qdata = np.array(IK_QDATA)
    n = q_raw.shape[0]
    p = np.zeros((n, 2, 3))
    j_fm = np.zeros((n, 2, 6, 5))
    j_f = np.zeros((n, 2, 3, 5))
    r_foot = np.zeros((n, 2, 3, 3))
    ik_qdes = np.zeros((n, 2, 5))
    q_eff2 = q_raw + 2.0 * OFFSETS          # uniform-PI double application
    for b in range(n):
        for leg in range(2):
            j_fm[b, leg], j_f[b, leg], p[b, leg] = leg_fk_and_jacobians(
                q_raw[b, leg], leg)
            r_foot[b, leg] = foot_rotation(q_eff2[b, leg])
            ik_qdes[b, leg] = leg_ik(ik_target[b, leg], ik_qdata[b, leg],
                                     leg)
    return dict(q_raw=q_raw, p=p, J_fm=j_fm, J_f=j_f, q_eff2=q_eff2,
                R_foot=r_foot, ik_target=ik_target, ik_qdata=ik_qdata,
                ik_qdes=ik_qdes)


# ---------------------------------------------------------------------------
# Deterministic npz writer (np.savez embeds timestamps; git-diff stability
# needs fixed zip metadata)
# ---------------------------------------------------------------------------

def write_npz_deterministic(path, arrays):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, 'w', zipfile.ZIP_STORED) as zf:
        for name in sorted(arrays):
            data = io.BytesIO()
            np.lib.format.write_array(data, np.asarray(arrays[name]),
                                      allow_pickle=False)
            info = zipfile.ZipInfo(name + '.npy',
                                   date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, data.getvalue())
    with open(path, 'wb') as fh:
        fh.write(buf.getvalue())


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    write_npz_deterministic(os.path.join(here, 'kinematics.npz'),
                            generate_kinematics())
    write_npz_deterministic(os.path.join(here, 'solver.npz'),
                            generate_solver())
    print('regenerated kinematics.npz + solver.npz')


if __name__ == '__main__':
    main()
