"""Differential data parity of the robot catalog vs the REFERENCE.

Imports every reference robot config module under
aerial_gym/config/robot_config/ standalone and asserts our registered
robot configs carry the same numbers: allocation matrices, motor
directions/application level, motor-model constants, init-state sampling
ranges, disturbance and aerodynamic damping coefficients.

Config values are data parity (CLAUDE.md): the reference classes are the
oracle.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

REFC = "/root/reference/aerial_gym/config"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFC),
                                reason="reference checkout not present")

from aerial_gym_simulator_tpu.registry.registries import (  # noqa: E402
    robot_registry,
)
import aerial_gym_simulator_tpu.config  # noqa: F401,E402 (registrations)


@pytest.fixture(scope="module")
def ref_robot_modules():
    """Import the reference robot-config package without triggering
    aerial_gym/__init__ (which needs isaacgym)."""
    if "aerial_gym" not in sys.modules:
        ag = types.ModuleType("aerial_gym")
        ag.__path__ = [os.path.dirname(REFC)]
        sys.modules["aerial_gym"] = ag
    # the reference robot configs read AERIAL_GYM_DIRECTORY for URDF paths
    sys.modules["aerial_gym"].AERIAL_GYM_DIRECTORY = "/root/reference"
    for pkg, p in [
        ("aerial_gym.config", REFC),
        ("aerial_gym.config.sensor_config", REFC + "/sensor_config"),
        ("aerial_gym.config.sensor_config.camera_config",
         REFC + "/sensor_config/camera_config"),
        ("aerial_gym.config.sensor_config.lidar_config",
         REFC + "/sensor_config/lidar_config"),
        ("aerial_gym.config.sensor_config.imu_config",
         REFC + "/sensor_config/imu_config"),
        ("aerial_gym.config.robot_config", REFC + "/robot_config"),
    ]:
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [p]
            sys.modules[pkg] = m
    mods = {}
    for f in sorted(os.listdir(REFC + "/robot_config")):
        if f.endswith(".py") and f != "__init__.py":
            mods[f[:-3]] = importlib.import_module(
                "aerial_gym.config.robot_config." + f[:-3])
    return mods


# our registered name -> (reference module, reference class)
PAIRS = {
    "base_quadrotor": ("base_quad_config", "BaseQuadCfg"),
    "base_quadrotor_with_camera": ("base_quad_config", "BaseQuadWithCameraCfg"),
    "base_quadrotor_with_camera_imu": ("base_quad_config", "BaseQuadWithCameraImuCfg"),
    "base_quadrotor_with_faceid_normal_camera": (
        "base_quad_config", "BaseQuadWithFaceIDNormalCameraCfg"),
    "base_quadrotor_with_imu": ("base_quad_config", "BaseQuadWithImuCfg"),
    "base_quadrotor_with_lidar": ("base_quad_config", "BaseQuadWithLidarCfg"),
    "base_quadrotor_with_stereo_camera": (
        "base_quad_config", "BaseQuadWithStereoCameraCfg"),
    "base_quad_root_link_control": (
        "base_quad_root_link_control_config", "BaseQuadRootLinkControlCfg"),
    "base_octarotor": ("base_octarotor_config", "BaseOctarotorCfg"),
    "base_random": ("base_random_config", "BaseRandCfg"),
    "base_rov": ("base_rov_config", "BaseROVCfg"),
    "lmf1": ("lmf1_config", "LMF1Cfg"),
    "lmf2": ("lmf2_config", "LMF2Cfg"),
    "lmf2_radar": ("lmf2_radar_config", "LMF2RadarCfg"),
    "magpie": ("magpie_config", "MagpieCfg"),
    "morphy": ("morphy_config", "MorphyCfg"),
    "morphy_fixed_base": ("morphy_config", "MorphyFixedBaseCfg"),
    "morphy_stiff": ("morphy_stiff_config", "MorphyStiffCfg"),
    "snakey": ("snakey_config", "SnakeyCfg"),
    "snakey5": ("snakey5_config", "Snakey5Cfg"),
    "snakey6": ("snakey6_config", "Snakey6Cfg"),
    "tinyprop": ("tinyprop_config", "TinyPropCfg"),
    "x500": ("x500_config", "X500Cfg"),
}

MOTOR_FIELDS = [
    "use_rps", "motor_thrust_constant_min", "motor_thrust_constant_max",
    "motor_time_constant_increasing_min", "motor_time_constant_increasing_max",
    "motor_time_constant_decreasing_min", "motor_time_constant_decreasing_max",
    "max_thrust", "min_thrust", "max_thrust_rate", "thrust_to_torque_ratio",
    "use_discrete_approximation",
]


def _level(s):
    # the reference uses "base_link" in some configs as a synonym for
    # "root_link" (control_allocation.py only branches on == "motor_link")
    return "root_link" if s in ("base_link", "root_link") else s


@pytest.mark.parametrize("our_name", sorted(PAIRS))
def test_robot_config_matches_reference(ref_robot_modules, our_name):
    mod_name, cls_name = PAIRS[our_name]
    ref = getattr(ref_robot_modules[mod_name], cls_name)
    ours = robot_registry.make(our_name)

    rca, oca = ref.control_allocator_config, ours.control_allocator_config
    assert oca.num_motors == rca.num_motors
    assert _level(oca.force_application_level) == _level(
        rca.force_application_level)
    assert list(oca.motor_directions) == list(rca.motor_directions)
    np.testing.assert_allclose(
        np.asarray(oca.allocation_matrix, float),
        np.asarray(rca.allocation_matrix, float), rtol=1e-6, atol=1e-6,
        err_msg=f"{our_name}.allocation_matrix")

    rmm, omm = rca.motor_model_config, oca.motor_model_config
    for f in MOTOR_FIELDS:
        rv, ov = getattr(rmm, f), getattr(omm, f)
        if isinstance(rv, bool):
            assert bool(ov) == rv, (our_name, f)
        else:
            assert float(ov) == pytest.approx(float(rv)), (our_name, f)

    np.testing.assert_allclose(
        np.asarray(ours.init_config.min_init_state, float),
        np.asarray(ref.init_config.min_init_state, float), atol=1e-6,
        err_msg=f"{our_name}.min_init_state")
    np.testing.assert_allclose(
        np.asarray(ours.init_config.max_init_state, float),
        np.asarray(ref.init_config.max_init_state, float), atol=1e-6,
        err_msg=f"{our_name}.max_init_state")

    rd, od = ref.disturbance, ours.disturbance
    assert bool(od.enable_disturbance) == bool(rd.enable_disturbance), our_name
    assert float(od.prob_apply_disturbance) == pytest.approx(
        float(rd.prob_apply_disturbance)), our_name
    np.testing.assert_allclose(
        np.asarray(od.max_force_and_torque_disturbance, float),
        np.asarray(rd.max_force_and_torque_disturbance, float), atol=1e-9,
        err_msg=f"{our_name}.max_force_and_torque_disturbance")

    for f in ("linvel_linear_damping_coefficient",
              "linvel_quadratic_damping_coefficient",
              "angular_linear_damping_coefficient",
              "angular_quadratic_damping_coefficient"):
        np.testing.assert_allclose(
            np.asarray(getattr(ours.damping, f), float),
            np.asarray(getattr(ref.damping, f), float), atol=1e-9,
            err_msg=f"{our_name}.{f}")

    # sensor enables compose the robot variants
    rs, os_ = ref.sensor_config, ours.sensor_config
    assert bool(os_.enable_camera) == bool(rs.enable_camera), our_name
    assert bool(os_.enable_lidar) == bool(rs.enable_lidar), our_name
    assert bool(os_.enable_imu) == bool(rs.enable_imu), our_name


def test_reconfigurable_joint_configs_match_reference(ref_robot_modules):
    """DOF init ranges + PD gains for the reconfigurable family (reference
    snakey/morphy *_config.py reconfiguration_config)."""
    checked = 0
    for our_name, (mod_name, cls_name) in PAIRS.items():
        ref = getattr(ref_robot_modules[mod_name], cls_name)
        rc = getattr(ref, "reconfiguration_config", None)
        if rc is None:
            continue
        ours = robot_registry.make(our_name)
        oc = ours.dof_config
        np.testing.assert_allclose(
            np.asarray(oc.init_state_min, float),
            np.asarray(rc.init_state_min, float), atol=1e-6,
            err_msg=f"{our_name}.init_state_min")
        np.testing.assert_allclose(
            np.asarray(oc.init_state_max, float),
            np.asarray(rc.init_state_max, float), atol=1e-6,
            err_msg=f"{our_name}.init_state_max")
        if hasattr(rc, "stiffness"):
            np.testing.assert_allclose(
                np.asarray(oc.stiffness, float),
                np.asarray(rc.stiffness, float), atol=1e-6,
                err_msg=f"{our_name}.stiffness")
            np.testing.assert_allclose(
                np.asarray(oc.damping, float),
                np.asarray(rc.damping, float), atol=1e-6,
                err_msg=f"{our_name}.damping")
        checked += 1
    assert checked >= 4  # snakey/5/6 + morphy family
