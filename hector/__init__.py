"""hector: TPU-native batched MPC engine for the HECTOR humanoid biped.

A from-scratch JAX/Pallas/pjit rebuild of the capabilities of
DRCL-USC/Hector_Simulation (force-and-moment convex MPC + simulation stack),
redesigned for TPU: thousands of scenarios solved per step as one jitted
program, sharded over a device mesh.

Layer map (reference SURVEY.md §1 -> here):

    main.cpp 1 kHz loop + Gazebo       -> runtime.make_rollout (fused)
    FSM / FSMState_*                   -> control (mode arrays)
    ConvexMPCLocomotion                -> mpc
    GaitGenerator                      -> gait
    convexMPC_interface + SolverMPC    -> qp.builder + srbd + constraints
    qpOASES                            -> qp.riccati + qp.pallas_riccati
                                          (production; dense oracle path:
                                          qp.pdip + qp.pallas_chol)
    LegController / kinematics         -> kinematics, control
    SwingLegController + FootSwing...  -> swing
    estimators                         -> estimation (cheater / IIR /
                                          contact-aided IMU-driven KF)
    CheatIO / ROS topics               -> (gone: single jitted program)
    KeyBoard teleop                    -> io.keyboard + cli
    Gazebo GUI / rviz / force-draw     -> io.live (ANSI viewer) + io.viz
    Gazebo plant                       -> plant.srb (tier 1) +
                                          plant.whole_body (tier 2, RNEA)
    checkpoints / metrics / viz        -> io.*
    scenario DP / collectives          -> parallel
"""

from . import config
from . import math
from . import kinematics
from . import gait
from . import srbd
from . import constraints
from . import swing
from . import mpc
from . import control
from . import runtime
from . import parallel
from .config import DEFAULT_CONFIG, HectorConfig

__version__ = "0.1.0"
