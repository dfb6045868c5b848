"""Robot catalog: named robot configurations.

Parity targets (reference config/robot_config/*.py): base_quadrotor (+ camera
/ lidar / imu / stereo variants), octarotor, root-link-control quad, random
configuration, lmf1/lmf2, x500, tinyprop, snakey family, morphy, ROV.
Mass properties come from the procedural URDFs generated from each robot's
allocation geometry.
"""

from __future__ import annotations

import math

import numpy as np

from .base_quad_config import (
    ControlAllocatorConfig,
    DampingConfig,
    DisturbanceConfig,
    InitConfig,
    MotorModelConfig,
    RobotAssetConfig,
    RobotConfig,
    SensorEnableConfig,
)


def base_quadrotor() -> RobotConfig:
    return RobotConfig(name="base_quadrotor")


def base_quadrotor_with_imu() -> RobotConfig:
    cfg = RobotConfig(name="base_quadrotor_with_imu")
    cfg.sensor_config.enable_imu = True
    return cfg


def base_quadrotor_with_camera() -> RobotConfig:
    cfg = RobotConfig(name="base_quadrotor_with_camera")
    cfg.sensor_config.enable_camera = True
    return cfg


def base_quadrotor_with_camera_imu() -> RobotConfig:
    cfg = RobotConfig(name="base_quadrotor_with_camera_imu")
    cfg.sensor_config.enable_camera = True
    cfg.sensor_config.enable_imu = True
    return cfg


def base_quadrotor_with_lidar() -> RobotConfig:
    cfg = RobotConfig(name="base_quadrotor_with_lidar")
    cfg.sensor_config.enable_lidar = True
    return cfg


def base_quadrotor_with_stereo_camera() -> RobotConfig:
    cfg = RobotConfig(name="base_quadrotor_with_stereo_camera")
    cfg.sensor_config.enable_camera = True
    return cfg


def base_quadrotor_root_link_control() -> RobotConfig:
    """Wrench applied at root link (reference base_quad_root_link_control_config)."""
    cfg = RobotConfig(name="base_quad_root_link_control")
    cfg.control_allocator_config.force_application_level = "root_link"
    return cfg


def _ring_allocation(num_motors: int, arm: float, cq: float, directions):
    """Planar ring of z-thrust motors -> 6 x M allocation matrix."""
    alloc = np.zeros((6, num_motors))
    for i in range(num_motors):
        ang = 2.0 * math.pi * i / num_motors + math.pi / num_motors
        x, y = arm * math.cos(ang), arm * math.sin(ang)
        alloc[2, i] = 1.0
        alloc[3, i] = y
        alloc[4, i] = -x
        alloc[5, i] = -cq * directions[i]
    return alloc.tolist()


def base_octarotor() -> RobotConfig:
    """8-motor ring (reference base_octarotor_config.py)."""
    directions = [1, -1, 1, -1, 1, -1, 1, -1]
    ca = ControlAllocatorConfig(
        num_motors=8,
        application_mask=list(range(5, 13)),
        motor_directions=directions,
        allocation_matrix=_ring_allocation(8, 0.38, 0.01, directions),
    )
    ca.motor_model_config.max_thrust = 6.0
    cfg = RobotConfig(name="base_octarotor", control_allocator_config=ca)
    return cfg


def base_random() -> RobotConfig:
    """Randomized-configuration multirotor (reference base_random_config.py):
    an 8-motor machine with a full-rank but non-planar allocation, used to
    exercise arbitrary allocation matrices."""
    rng = np.random.RandomState(11)
    directions = [1, -1, 1, -1, 1, -1, 1, -1]
    alloc = np.zeros((6, 8))
    for i in range(8):
        ang = 2.0 * math.pi * i / 8.0
        arm = 0.2 + 0.1 * rng.rand()
        x, y = arm * math.cos(ang), arm * math.sin(ang)
        alloc[2, i] = 1.0
        alloc[3, i] = y
        alloc[4, i] = -x
        alloc[5, i] = -0.01 * directions[i]
        alloc[0, i] = 0.05 * rng.randn()
        alloc[1, i] = 0.05 * rng.randn()
    ca = ControlAllocatorConfig(
        num_motors=8,
        application_mask=list(range(5, 13)),
        motor_directions=directions,
        allocation_matrix=alloc.tolist(),
    )
    return RobotConfig(name="base_random", control_allocator_config=ca)


def _x_quad(name: str, arm: float, max_thrust: float, mass_scale: float = 1.0,
            cq: float = 0.01) -> RobotConfig:
    d = [1, -1, 1, -1]
    s = arm / math.sqrt(2.0)
    alloc = [
        [0.0] * 4,
        [0.0] * 4,
        [1.0] * 4,
        [-s, -s, s, s],
        [-s, s, s, -s],
        [-cq, cq, -cq, cq],
    ]
    ca = ControlAllocatorConfig(num_motors=4,
                                application_mask=[5, 6, 7, 8],
                                motor_directions=d,
                                allocation_matrix=alloc)
    ca.motor_model_config.max_thrust = max_thrust
    return RobotConfig(name=name, control_allocator_config=ca)


def lmf1() -> RobotConfig:
    return _x_quad("lmf1", arm=0.26, max_thrust=9.0)


def lmf2() -> RobotConfig:
    return _x_quad("lmf2", arm=0.29, max_thrust=10.0)


def x500() -> RobotConfig:
    return _x_quad("x500", arm=0.25, max_thrust=8.5)


def tinyprop() -> RobotConfig:
    cfg = _x_quad("tinyprop", arm=0.06, max_thrust=0.6)
    cfg.control_allocator_config.motor_model_config.motor_thrust_constant_min = 2e-7
    cfg.control_allocator_config.motor_model_config.motor_thrust_constant_max = 4e-7
    return cfg


def register_robots(robot_registry):
    robot_registry.register("base_quadrotor", base_quadrotor)
    robot_registry.register("base_quadrotor_with_imu", base_quadrotor_with_imu)
    robot_registry.register("base_quadrotor_with_camera", base_quadrotor_with_camera)
    robot_registry.register("base_quadrotor_with_camera_imu", base_quadrotor_with_camera_imu)
    robot_registry.register("base_quadrotor_with_lidar", base_quadrotor_with_lidar)
    robot_registry.register("base_quadrotor_with_stereo_camera",
                            base_quadrotor_with_stereo_camera)
    robot_registry.register("base_quad_root_link_control", base_quadrotor_root_link_control)
    robot_registry.register("base_octarotor", base_octarotor)
    robot_registry.register("base_random", base_random)
    robot_registry.register("lmf1", lmf1)
    robot_registry.register("lmf2", lmf2)
    robot_registry.register("x500", x500)
    robot_registry.register("tinyprop", tinyprop)
