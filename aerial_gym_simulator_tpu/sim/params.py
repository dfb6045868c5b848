"""Build SimParams / initial SimState from the config tree.

This is the composition point equivalent to the reference's
EnvManager.__init__/prepare_sim wiring of the global_tensor_dict
(env_manager.py:37-271) — except the output is an immutable pytree.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import procedural, urdf
from ..config.controller_config.lee_controller_config import ControllerConfig
from ..config.env_config.base_env_config import EnvConfig
from ..config.robot_config.base_quad_config import RobotConfig
from ..config.sim_config.base_sim_config import SimConfig
from ..utils import rng as rnglib
from ..utils.logging import CustomLogger
from .structs import (
    ControllerParams,
    EnvParams,
    MotorParams,
    RobotParams,
    SceneParams,
    SimParams,
    SimState,
)

logger = CustomLogger("sim_params")

_f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)


def resolve_robot_model(robot_cfg: RobotConfig) -> urdf.UrdfModel:
    """Load the robot URDF (from disk if configured, else procedural)."""
    asset = robot_cfg.robot_asset
    path = os.path.join(asset.asset_folder, asset.file) if asset.asset_folder else ""
    if path and os.path.exists(path):
        return urdf.load_urdf(path, semantic_id=asset.semantic_id,
                              per_link_semantic=asset.per_link_semantic)
    # procedural generation from the allocation geometry
    alloc = robot_cfg.control_allocator_config.allocation_matrix
    positions = procedural.motor_layout_from_allocation(alloc)
    text = procedural.multirotor_urdf(name=robot_cfg.name, motor_positions=positions)
    return urdf.load_urdf_string(text, name=robot_cfg.name)


def build_motor_params(robot_cfg: RobotConfig) -> MotorParams:
    ca = robot_cfg.control_allocator_config
    mm = ca.motor_model_config
    alloc = np.asarray(ca.allocation_matrix, dtype=np.float32)
    rank = np.linalg.matrix_rank(alloc)
    if rank < 6:
        logger.warning(f"allocation matrix is not full rank (rank={rank})")
    pinv = np.linalg.pinv(alloc)
    return MotorParams(
        allocation_matrix=_f32(alloc),
        allocation_pinv=_f32(pinv),
        motor_directions=_f32(ca.motor_directions),
        min_thrust=_f32(mm.min_thrust),
        max_thrust=_f32(mm.max_thrust),
        max_thrust_rate=_f32(mm.max_thrust_rate),
        tau_inc_min=_f32(mm.motor_time_constant_increasing_min),
        tau_inc_max=_f32(mm.motor_time_constant_increasing_max),
        tau_dec_min=_f32(mm.motor_time_constant_decreasing_min),
        tau_dec_max=_f32(mm.motor_time_constant_decreasing_max),
        thrust_constant_min=_f32(mm.motor_thrust_constant_min),
        thrust_constant_max=_f32(mm.motor_thrust_constant_max),
        thrust_to_torque_ratio=_f32(mm.thrust_to_torque_ratio),
        use_rps=mm.use_rps,
        use_discrete_approximation=mm.use_discrete_approximation,
        integration_scheme=mm.integration_scheme,
        num_motors=ca.num_motors,
    )


def build_robot_params(robot_cfg: RobotConfig) -> RobotParams:
    model = resolve_robot_model(robot_cfg)
    asset = robot_cfg.robot_asset
    mass = asset.mass if asset.mass is not None else model.mass
    inertia = (np.asarray(asset.inertia, dtype=np.float64)
               if asset.inertia is not None else model.inertia)
    inv_inertia = np.linalg.inv(inertia)
    radius = (asset.collision_radius if asset.collision_radius is not None
              else model.bound_radius)
    damping = robot_cfg.damping
    dist = robot_cfg.disturbance
    return RobotParams(
        mass=_f32(mass),
        inertia=_f32(inertia),
        inv_inertia=_f32(inv_inertia),
        linear_damping=_f32(asset.linear_damping),
        angular_damping=_f32(asset.angular_damping),
        max_linear_velocity=_f32(asset.max_linear_velocity),
        max_angular_velocity=_f32(asset.max_angular_velocity),
        collision_radius=_f32(radius),
        drag_lin_linear=_f32(damping.linvel_linear_damping_coefficient),
        drag_lin_quadratic=_f32(damping.linvel_quadratic_damping_coefficient),
        drag_ang_linear=_f32(damping.angular_linear_damping_coefficient),
        drag_ang_quadratic=_f32(damping.angular_quadratic_damping_coefficient),
        min_init_state=_f32(robot_cfg.init_config.min_init_state),
        max_init_state=_f32(robot_cfg.init_config.max_init_state),
        disturbance_prob=_f32(dist.prob_apply_disturbance),
        max_force_disturbance=_f32(dist.max_force_and_torque_disturbance[0:3]),
        max_torque_disturbance=_f32(dist.max_force_and_torque_disturbance[3:6]),
        enable_disturbance=dist.enable_disturbance,
        force_application_level=robot_cfg.control_allocator_config.force_application_level,
        disable_gravity=asset.disable_gravity,
        fix_base_link=asset.fix_base_link,
    )


def build_controller_params(ctrl_cfg: ControllerConfig) -> ControllerParams:
    return ControllerParams(
        K_pos_min=_f32(ctrl_cfg.K_pos_tensor_min),
        K_pos_max=_f32(ctrl_cfg.K_pos_tensor_max),
        K_vel_min=_f32(ctrl_cfg.K_vel_tensor_min),
        K_vel_max=_f32(ctrl_cfg.K_vel_tensor_max),
        K_rot_min=_f32(ctrl_cfg.K_rot_tensor_min),
        K_rot_max=_f32(ctrl_cfg.K_rot_tensor_max),
        K_angvel_min=_f32(ctrl_cfg.K_angvel_tensor_min),
        K_angvel_max=_f32(ctrl_cfg.K_angvel_tensor_max),
        max_yaw_rate=_f32(ctrl_cfg.max_yaw_rate),
        max_inclination_angle=_f32(ctrl_cfg.max_inclination_angle_rad),
        randomize_params=ctrl_cfg.randomize_params,
        name=(getattr(ctrl_cfg, "base_controller", "") or ctrl_cfg.name),
        num_actions=ctrl_cfg.num_actions,
    )


def build_art_params(robot_cfg: RobotConfig):
    """ArtParams from the robot's articulation URDF (None when rigid or no
    URDF is attached — such robots fall back to the decoupled DOF path)."""
    text = getattr(robot_cfg, "articulation_urdf", None)
    if not text:
        return None
    from ..assets.articulation import parse_articulation
    from .structs import ArtParams
    model = parse_articulation(text)
    if model is None:
        return None
    rc = robot_cfg.dof_config
    if rc is not None and rc.num_dofs != model.nb:
        raise ValueError(
            f"articulation URDF has {model.nb} revolute joints but "
            f"dof_config declares {rc.num_dofs} DOFs ({robot_cfg.name})")
    asset = robot_cfg.robot_asset
    if asset.mass is not None and abs(model.total_mass - asset.mass) > 1e-3:
        logger.warning(
            f"{robot_cfg.name}: articulation total mass {model.total_mass:.4f}"
            f" != configured {asset.mass} (articulated path uses the URDF)")
    M = robot_cfg.control_allocator_config.num_motors
    if len(model.motor_body) != M:
        raise ValueError(
            f"articulation URDF has {len(model.motor_body)} motor links, "
            f"config expects {M} ({robot_cfg.name})")
    return ArtParams(
        R_tree=_f32(model.R_tree),
        t_tree=_f32(model.t_tree),
        axis=_f32(model.axis),
        mass=_f32(model.mass),
        com=_f32(model.com),
        inertia=_f32(model.inertia),
        base_mass=_f32(model.base_mass),
        base_com=_f32(model.base_com),
        base_inertia=_f32(model.base_inertia),
        motor_pos=_f32(model.motor_pos),
        motor_dir=_f32(model.motor_dir),
        armature=_f32(getattr(asset, "armature", 0.001)),
        parent=tuple(model.parent),
        motor_body=tuple(model.motor_body),
        nb=model.nb,
    )


def build_dof_params(robot_cfg: RobotConfig, art_model=None):
    """DofParams from the robot's ReconfigurationConfig (None when rigid).

    When the robot ships an articulation URDF the joint limits and
    effort/velocity clamps come from it (ground truth — what PhysX enforces
    in the reference), overriding the config approximations.
    """
    rc = robot_cfg.dof_config
    if rc is None:
        return None
    D = rc.num_dofs
    if D == 0:
        return None
    from .structs import DofParams
    inertia = rc.dof_inertia if rc.dof_inertia else [1e-3] * D
    lower = rc.lower_limit if rc.lower_limit else [-np.pi] * D
    upper = rc.upper_limit if rc.upper_limit else [np.pi] * D
    max_velocity = [rc.max_velocity] * D
    max_effort = [rc.max_effort] * D
    text = getattr(robot_cfg, "articulation_urdf", None)
    if text:
        from ..assets.articulation import parse_articulation
        model = parse_articulation(text)
        if model is not None and model.nb == D:
            lower, upper = model.lower, model.upper
            max_effort, max_velocity = model.effort, model.velocity
    return DofParams(
        stiffness=_f32(rc.stiffness),
        damping=_f32(rc.damping),
        init_pos_min=_f32(rc.init_state_min[0]),
        init_pos_max=_f32(rc.init_state_max[0]),
        init_vel_min=_f32(rc.init_state_min[1]),
        init_vel_max=_f32(rc.init_state_max[1]),
        dof_inertia=_f32(inertia),
        lower_limit=_f32(lower),
        upper_limit=_f32(upper),
        max_velocity=_f32(max_velocity),
        max_effort=_f32(max_effort),
        nonlinear_stiffness=_f32(rc.custom_nonlinear_stiffness),
        linear_damping=_f32(rc.custom_linear_damping),
        dof_mode=rc.dof_mode,
        arm_response=rc.arm_response,
        num_dofs=D,
    )


def build_env_params(env_cfg: EnvConfig, num_envs: Optional[int] = None) -> EnvParams:
    return EnvParams(
        lower_bound_min=_f32(env_cfg.lower_bound_min),
        lower_bound_max=_f32(env_cfg.lower_bound_max),
        upper_bound_min=_f32(env_cfg.upper_bound_min),
        upper_bound_max=_f32(env_cfg.upper_bound_max),
        collision_force_threshold=_f32(env_cfg.collision_force_threshold),
        reset_on_collision=env_cfg.reset_on_collision,
        create_ground_plane=env_cfg.create_ground_plane,
        substep_mean=int(env_cfg.num_physics_steps_per_env_step_mean),
        substep_std=float(env_cfg.num_physics_steps_per_env_step_std),
        num_envs=int(num_envs if num_envs is not None else env_cfg.num_envs),
        num_env_actions=env_cfg.num_env_actions,
    )


def build_sim_params(sim_cfg: SimConfig, env_cfg: EnvConfig,
                     robot_cfg: RobotConfig, ctrl_cfg: ControllerConfig,
                     num_envs: Optional[int] = None,
                     scene: Optional[SceneParams] = None) -> SimParams:
    camera = lidar = imu = None
    sens = robot_cfg.sensor_config
    if getattr(sens, "enable_camera", False):
        from ..config.sensor_config.sensor_configs import BaseDepthCameraConfig
        from ..sensors.raycast_sensor import build_ray_sensor_params
        cam_cfg = sens.camera_config or BaseDepthCameraConfig()
        if isinstance(cam_cfg, type):
            cam_cfg = cam_cfg()
        camera = build_ray_sensor_params(cam_cfg)
    if getattr(sens, "enable_lidar", False):
        from ..config.sensor_config.sensor_configs import BaseLidarConfig
        from ..sensors.raycast_sensor import build_ray_sensor_params
        lidar_cfg = sens.lidar_config or BaseLidarConfig()
        if isinstance(lidar_cfg, type):
            lidar_cfg = lidar_cfg()
        lidar = build_ray_sensor_params(lidar_cfg)
    if getattr(sens, "enable_imu", False):
        from ..config.sensor_config.sensor_configs import BaseImuConfig
        from ..sensors.imu import build_imu_params
        imu_cfg = sens.imu_config or BaseImuConfig()
        if isinstance(imu_cfg, type):
            imu_cfg = imu_cfg()
        imu = build_imu_params(imu_cfg)
    return SimParams(
        dt=_f32(sim_cfg.dt),
        gravity=_f32(sim_cfg.gravity),
        robot=build_robot_params(robot_cfg),
        motor=build_motor_params(robot_cfg),
        controller=build_controller_params(ctrl_cfg),
        env=build_env_params(env_cfg, num_envs),
        dof=build_dof_params(robot_cfg),
        art=build_art_params(robot_cfg),
        scene=scene,
        camera=camera,
        lidar=lidar,
        imu=imu,
    )


def _mount_z(N: int, sp) -> jnp.ndarray:
    S = sp.num_sensors if sp is not None else 1
    return (jnp.zeros((N, 3), jnp.float32) if S == 1
            else jnp.zeros((N, S, 3), jnp.float32))


def _mount_q(N: int, sp) -> jnp.ndarray:
    S = sp.num_sensors if sp is not None else 1
    unit = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    return (jnp.tile(unit, (N, 1)) if S == 1
            else jnp.tile(unit, (N, S, 1)))


def initial_state(params: SimParams, seed: int = 0) -> SimState:
    """Allocate the full per-env state pytree (pre-reset zeros + keys)."""
    N = params.env.num_envs
    M = params.motor.num_motors
    A = params.scene.num_assets if params.scene is not None else 0
    D = params.dof.num_dofs if params.dof is not None else 0
    z = lambda *shape: jnp.zeros(shape, dtype=jnp.float32)
    # NOTE: every field gets its own freshly materialized array — the state
    # pytree is donated on each step, and aliased/broadcast-view buffers
    # would trip XLA's "donate the same buffer twice" check.
    quat0 = lambda: jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), (N, 1))
    cp = params.controller
    mid = lambda lo, hi: jnp.tile(((lo + hi) / 2.0)[None, :], (N, 1))
    return SimState(
        pos=z(N, 3), quat=quat0(), linvel=z(N, 3), angvel=z(N, 3),
        motor_thrust=z(N, M),
        motor_tau_inc=jnp.tile(params.motor.tau_inc_min[None, None], (N, M)),
        motor_tau_dec=jnp.tile(params.motor.tau_dec_min[None, None], (N, M)),
        motor_thrust_constant=jnp.tile(
            ((params.motor.thrust_constant_min
              + params.motor.thrust_constant_max) / 2.0)[None, None], (N, M)),
        K_pos=mid(cp.K_pos_min, cp.K_pos_max),
        K_vel=mid(cp.K_vel_min, cp.K_vel_max),
        K_rot=mid(cp.K_rot_min, cp.K_rot_max),
        K_angvel=mid(cp.K_angvel_min, cp.K_angvel_max),
        bounds_lo=jnp.tile(params.env.lower_bound_min[None, :], (N, 1)),
        bounds_hi=jnp.tile(params.env.upper_bound_min[None, :], (N, 1)),
        collisions=z(N), crashes=z(N), truncations=z(N),
        sim_steps=jnp.zeros((N,), jnp.int32),
        rng=rnglib.make_env_keys(seed, N),
        applied_force_b=z(N, 3), applied_torque_b=z(N, 3),
        obstacle_pos=z(N, A, 3),
        obstacle_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), (N, A, 1)),
        obstacle_linvel=z(N, A, 3),
        obstacle_angvel=z(N, A, 3),
        # num_sensors == 1 keeps the historical (N, 3)/(N, 4) shapes
        # (checkpoint compatibility); S > 1 carries one mount per sensor
        # copy, (N, S, 3)/(N, S, 4) (reference warp_sensor.py:112-118)
        cam_mount_pos=_mount_z(N, params.camera),
        cam_mount_quat=_mount_q(N, params.camera),
        lidar_mount_pos=_mount_z(N, params.lidar),
        lidar_mount_quat=_mount_q(N, params.lidar),
        imu_accel_bias=z(N, 3),
        imu_gyro_bias=z(N, 3),
        imu_mount_quat=quat0(),
        num_obstacles=jnp.full((N,), A, jnp.int32),
        dof_pos=z(N, D), dof_vel=z(N, D),
        dof_pos_target=z(N, D), dof_vel_target=z(N, D),
    )
