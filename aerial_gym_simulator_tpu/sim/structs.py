"""Core pytrees of the TPU-native simulator.

The reference's mutable ``global_tensor_dict`` (env_manager.py:71) — a bus of
in-place-mutated torch views — is replaced by one explicit functional state:

    SimParams: static, config-derived arrays (shared across envs)
    SimState:  per-env dynamic state, leading axis = num_envs

``step: (SimParams, SimState, actions) -> SimState`` is pure and jitted;
sharding the env axis over a device mesh makes the same code run multi-chip
(SURVEY.md section 7 architecture stance).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MotorParams:
    # (6, M) wrench allocation and its pseudo-inverse (M, 6)
    allocation_matrix: jax.Array
    allocation_pinv: jax.Array
    motor_directions: jax.Array          # (M,)
    min_thrust: jax.Array                # scalar
    max_thrust: jax.Array
    max_thrust_rate: jax.Array
    tau_inc_min: jax.Array
    tau_inc_max: jax.Array
    tau_dec_min: jax.Array
    tau_dec_max: jax.Array
    thrust_constant_min: jax.Array       # rps-domain thrust constant bounds
    thrust_constant_max: jax.Array
    thrust_to_torque_ratio: jax.Array
    use_rps: bool = struct.field(pytree_node=False, default=True)
    use_discrete_approximation: bool = struct.field(pytree_node=False, default=True)
    integration_scheme: str = struct.field(pytree_node=False, default="rk4")
    num_motors: int = struct.field(pytree_node=False, default=4)


@struct.dataclass
class ControllerParams:
    K_pos_min: jax.Array                 # (3,)
    K_pos_max: jax.Array
    K_vel_min: jax.Array
    K_vel_max: jax.Array
    K_rot_min: jax.Array
    K_rot_max: jax.Array
    K_angvel_min: jax.Array
    K_angvel_max: jax.Array
    max_yaw_rate: jax.Array              # scalar
    max_inclination_angle: jax.Array
    randomize_params: bool = struct.field(pytree_node=False, default=False)
    name: str = struct.field(pytree_node=False, default="lee_attitude_control")
    num_actions: int = struct.field(pytree_node=False, default=4)


@struct.dataclass
class RobotParams:
    mass: jax.Array                      # scalar
    inertia: jax.Array                   # (3, 3)
    inv_inertia: jax.Array               # (3, 3)
    linear_damping: jax.Array            # engine per-body damping, scalar
    angular_damping: jax.Array
    max_linear_velocity: jax.Array
    max_angular_velocity: jax.Array
    collision_radius: jax.Array          # bounding-sphere contact proxy
    # aerodynamic drag along body axes (3,) each
    drag_lin_linear: jax.Array
    drag_lin_quadratic: jax.Array
    drag_ang_linear: jax.Array
    drag_ang_quadratic: jax.Array
    # reset sampling [ratio_xyz, rpy, 1, v, w] (13,)
    min_init_state: jax.Array
    max_init_state: jax.Array
    # disturbance
    disturbance_prob: jax.Array
    max_force_disturbance: jax.Array     # (3,)
    max_torque_disturbance: jax.Array    # (3,)
    enable_disturbance: bool = struct.field(pytree_node=False, default=False)
    force_application_level: str = struct.field(pytree_node=False, default="motor_link")
    disable_gravity: bool = struct.field(pytree_node=False, default=False)
    # reference AssetOptions.fix_base_link (isaacgym_asset.py / morphy_config.py
    # MorphyFixedBaseCfg): the root body is clamped in place; only joint DOFs
    # (e.g. morphy arms under sys-id) integrate.
    fix_base_link: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class DofParams:
    """Joint (DOF) dynamics for reconfigurable robots.

    The reference drives PhysX articulation DOFs in position/velocity/effort
    mode (base_reconfigurable.py:63-77; robot_manager.py:441-468 sets the
    drive mode); Morphy overrides the effort response with a nonlinear
    spring-damper (morphy.py:28-53). Here each DOF is integrated as a
    decoupled 1-DoF second-order system J*qdd = tau (engine-drive PD or
    custom effort), which reproduces the observable joint state/response
    without a full articulated-body solver.
    """
    stiffness: jax.Array                 # (D,) Kp (engine drive or robot PD)
    damping: jax.Array                   # (D,) Kd
    init_pos_min: jax.Array              # (D,)
    init_pos_max: jax.Array
    init_vel_min: jax.Array
    init_vel_max: jax.Array
    dof_inertia: jax.Array               # (D,) effective joint inertia
    lower_limit: jax.Array               # (D,)
    upper_limit: jax.Array
    max_velocity: jax.Array              # (D,)
    max_effort: jax.Array
    # Morphy custom arm response constants (morphy.py:33-45)
    nonlinear_stiffness: jax.Array       # scalar
    linear_damping: jax.Array            # scalar
    dof_mode: str = struct.field(pytree_node=False, default="position")
    arm_response: str = struct.field(pytree_node=False, default="pd")  # or "morphy"
    num_dofs: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class EnvParams:
    lower_bound_min: jax.Array           # (3,)
    lower_bound_max: jax.Array
    upper_bound_min: jax.Array
    upper_bound_max: jax.Array
    collision_force_threshold: jax.Array
    reset_on_collision: bool = struct.field(pytree_node=False, default=True)
    create_ground_plane: bool = struct.field(pytree_node=False, default=False)
    substep_mean: int = struct.field(pytree_node=False, default=1)
    substep_std: float = struct.field(pytree_node=False, default=0.0)
    num_envs: int = struct.field(pytree_node=False, default=64)
    num_env_actions: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class SceneParams:
    """Static obstacle scene as a primitive soup (envs/scene.py builds it).

    Geometry lives in a (V variants, P max-prims-per-asset) padded table;
    each of the A asset slots in each env holds one variant (picked at build
    like the reference's random per-env asset file selection,
    asset_loader.py:46-57). Per-(env, slot) pose state lives in SimState.
    """
    prim_kind: jax.Array                 # (V, P) int32: 0 box, 1 cyl, 2 sphere, 3 triangle, -1 pad
    prim_size: jax.Array                 # (V, P, 3)
    prim_pos: jax.Array                  # (V, P, 3) local offset in asset frame
    prim_rot: jax.Array                  # (V, P, 3, 3)
    prim_semantic: jax.Array             # (V, P) int32
    variant_radius: jax.Array            # (V,) bounding radius for broad phase
    env_asset_variant: jax.Array         # (N, A) int32 -> variant index
    # reset pose-ratio ranges per asset slot [ratio_xyz, rpy, 1, v, w]
    min_state_ratio: jax.Array           # (A, 13)
    max_state_ratio: jax.Array           # (A, 13)
    keep_in_env: jax.Array               # (A,) 1.0 = always present
    semantic_id: jax.Array               # (A,) int32 asset-level id
    # flattened per-env primitive soup (renderer/collision hot path): the
    # variant choice per (env, slot) is static, so each env's scene compacts
    # to exactly its primitives, padded to the max across envs.
    env_prim_slot: jax.Array             # (N, P) int32 -> asset slot (pose index)
    env_prim_kind: jax.Array             # (N, P) int32, -1 pad
    env_prim_size: jax.Array             # (N, P, 3)
    env_prim_pos: jax.Array              # (N, P, 3)
    env_prim_rot: jax.Array              # (N, P, 3, 3)
    env_prim_semantic: jax.Array         # (N, P) int32
    # per-env curriculum culling priority (N, A) int32: keep_in_env slots
    # rank first, remaining slots in a per-env random order (reference
    # asset_loader.py:181-185 shuffles the non-keep assets per env, so
    # which assets the curriculum culls differs env to env)
    cull_rank: jax.Array
    num_assets: int = struct.field(pytree_node=False, default=0)
    max_prims: int = struct.field(pytree_node=False, default=0)
    num_env_prims: int = struct.field(pytree_node=False, default=0)
    # per-kind counts in the kind-sorted flattened arrays (box|cyl|sphere)
    n_box: int = struct.field(pytree_node=False, default=0)
    n_cyl: int = struct.field(pytree_node=False, default=0)
    n_sph: int = struct.field(pytree_node=False, default=0)
    n_tri: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class RaySensorParams:
    """Shared params for ray-cast exteroceptive sensors (camera & lidar).

    dirs is the per-pixel unit ray table in the sensor's DATA frame
    (pinhole via K^-1 for cameras, warp_cam.py:31-64; spherical az/el grid
    for lidars, warp_lidar.py:40-64). depth_multiplier projects range on the
    principal axis when calculate_depth (warp_camera_kernels.py:258-262).
    """
    dirs: jax.Array                      # (H, W, 3) unit dirs, sensor frame
    depth_multiplier: jax.Array          # (H, W) dot(rd, rd_principal) or 1.0
    data_frame_quat: jax.Array           # (4,) optical->body rotation
    max_range: jax.Array
    min_range: jax.Array
    far_out_value: jax.Array
    near_out_value: jax.Array
    # mount randomization (reference warp_sensor.py:92-171)
    min_translation: jax.Array           # (3,)
    max_translation: jax.Array
    min_rotation: jax.Array              # (3,) euler rad
    max_rotation: jax.Array
    nominal_position: jax.Array          # (3,)
    nominal_rotation: jax.Array          # (3,) euler rad
    # noise: std = a*x^2 + b*x + c, mean offset, dropout
    std_a: jax.Array
    std_b: jax.Array
    std_c: jax.Array
    mean_offset: jax.Array
    pixel_dropout_prob: jax.Array
    height: int = struct.field(pytree_node=False, default=0)
    width: int = struct.field(pytree_node=False, default=0)
    sensor_type: str = struct.field(pytree_node=False, default="camera")
    calculate_depth: bool = struct.field(pytree_node=False, default=True)
    return_pointcloud: bool = struct.field(pytree_node=False, default=False)
    pointcloud_in_world_frame: bool = struct.field(pytree_node=False, default=False)
    segmentation_camera: bool = struct.field(pytree_node=False, default=True)
    normalize_range: bool = struct.field(pytree_node=False, default=True)
    enable_noise: bool = struct.field(pytree_node=False, default=False)
    randomize_placement: bool = struct.field(pytree_node=False, default=True)
    stereo_baseline: float = struct.field(pytree_node=False, default=0.0)
    # >1: S independently-mounted copies of this sensor per robot
    # (reference base_sensor_config.py:5 num_sensors; its kernels launch
    # over (num_envs, num_sensors, H, W), warp_cam.py:74) — mount state
    # becomes (N, S, 3)/(N, S, 4) and captures stack to (N, S, H, W)
    num_sensors: int = struct.field(pytree_node=False, default=1)


@struct.dataclass
class ImuParams:
    """IMU noise model (reference sensors/imu_sensor.py)."""
    accel_noise_std: jax.Array           # (3,)
    gyro_noise_std: jax.Array            # (3,)
    accel_bias_std: jax.Array            # (3,) random-walk increment std
    gyro_bias_std: jax.Array
    max_accel: jax.Array
    max_gyro: jax.Array
    # bias reset: uniform in +-max_bias_init (imu_sensor.py:133-135)
    accel_bias_init: jax.Array           # (3,)
    gyro_bias_init: jax.Array            # (3,)
    # mount-orientation perturbation range, radians (imu_sensor.py:47-56)
    min_mount_euler_rad: jax.Array       # (3,)
    max_mount_euler_rad: jax.Array       # (3,)
    world_frame: bool = struct.field(pytree_node=False, default=False)
    gravity_compensation: bool = struct.field(pytree_node=False, default=False)
    # measurement-term gates (imu_sensor.py:66-67, :112-116)
    enable_noise: bool = struct.field(pytree_node=False, default=True)
    enable_bias: bool = struct.field(pytree_node=False, default=True)
    randomize_placement: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class ArtParams:
    """Floating-base articulation (reconfigurable robots).

    Built from the robot URDF joint tree (assets/articulation.py); consumed
    by the CRBA/RNEA solver in sim/articulated.py, which replaces the PhysX
    articulation the reference relies on (robots/base_reconfigurable.py,
    robot_manager.py:441-468). One moving body per revolute DOF; fixed
    subtrees are merged. Indices follow URDF joint order (PhysX DOF order).
    """
    R_tree: jax.Array                    # (NB,3,3) child->parent coords @ q=0
    t_tree: jax.Array                    # (NB,3) joint origin in parent frame
    axis: jax.Array                      # (NB,3) joint axis, child frame
    mass: jax.Array                      # (NB,)
    com: jax.Array                       # (NB,3) body frame
    inertia: jax.Array                   # (NB,3,3) about com, body frame
    base_mass: jax.Array                 # scalar
    base_com: jax.Array                  # (3,)
    base_inertia: jax.Array              # (3,3) about base com
    motor_pos: jax.Array                 # (M,3) in owning body frame
    motor_dir: jax.Array                 # (M,3) thrust direction (body frame)
    armature: jax.Array                  # scalar added to H joint diagonal
    # static tree structure (trace-time Python loops)
    parent: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    motor_body: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    nb: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class SimParams:
    dt: jax.Array                        # scalar
    gravity: jax.Array                   # (3,)
    robot: RobotParams
    motor: MotorParams
    controller: ControllerParams
    env: EnvParams
    dof: Optional[DofParams] = None
    art: Optional[ArtParams] = None
    scene: Optional[SceneParams] = None
    camera: Optional[RaySensorParams] = None
    lidar: Optional[RaySensorParams] = None
    imu: Optional[ImuParams] = None


@struct.dataclass
class SimState:
    """Per-env dynamic state; every leaf has leading dim num_envs."""
    # rigid body root state (world frame; quat xyzw; angvel world frame,
    # matching Isaac Gym's root-state layout)
    pos: jax.Array                       # (N, 3)
    quat: jax.Array                      # (N, 4)
    linvel: jax.Array                    # (N, 3)
    angvel: jax.Array                    # (N, 3)
    # actuators
    motor_thrust: jax.Array              # (N, M)
    motor_tau_inc: jax.Array             # (N, M) randomized time constants
    motor_tau_dec: jax.Array             # (N, M)
    motor_thrust_constant: jax.Array     # (N, M)
    # controller gains (randomized per env on reset when enabled)
    K_pos: jax.Array                     # (N, 3)
    K_vel: jax.Array
    K_rot: jax.Array
    K_angvel: jax.Array
    # per-env world bounds (resampled at reset)
    bounds_lo: jax.Array                 # (N, 3)
    bounds_hi: jax.Array                 # (N, 3)
    # bookkeeping
    collisions: jax.Array                # (N,) accumulated this env step
    crashes: jax.Array                   # (N,)
    truncations: jax.Array               # (N,)
    sim_steps: jax.Array                 # (N,) int32
    rng: jax.Array                       # (N, 2) uint32 per-env keys
    # most recent applied body wrench (for IMU / debugging)
    applied_force_b: jax.Array           # (N, 3) body frame, excludes gravity
    applied_torque_b: jax.Array          # (N, 3)
    # obstacle states (empty (N, 0, ...) when scene has no assets)
    obstacle_pos: jax.Array              # (N, A, 3)
    obstacle_quat: jax.Array             # (N, A, 4)
    obstacle_linvel: jax.Array           # (N, A, 3)
    obstacle_angvel: jax.Array           # (N, A, 3)
    # sensor mount poses (randomized at reset; zeros when sensor disabled)
    cam_mount_pos: jax.Array             # (N, 3); (N, S, 3) if num_sensors>1
    cam_mount_quat: jax.Array            # (N, 4); (N, S, 4) if num_sensors>1
    lidar_mount_pos: jax.Array           # (N, 3); (N, S, 3) if num_sensors>1
    lidar_mount_quat: jax.Array          # (N, 4); (N, S, 4) if num_sensors>1
    # IMU bias random-walk state + perturbed mount orientation
    imu_accel_bias: jax.Array            # (N, 3)
    imu_gyro_bias: jax.Array             # (N, 3)
    imu_mount_quat: jax.Array            # (N, 4)
    # curriculum-controlled obstacle count (reference num_obstacles_in_env)
    num_obstacles: jax.Array             # (N,) int32
    # joint states for reconfigurable robots; (N, 0) when the robot is rigid.
    # Targets mirror the reference's dof_position/velocity_setpoint_tensor
    # (base_reconfigurable.py:44-53) and are written by tasks from actions.
    dof_pos: jax.Array                   # (N, D)
    dof_vel: jax.Array                   # (N, D)
    dof_pos_target: jax.Array            # (N, D)
    dof_vel_target: jax.Array            # (N, D)

    @property
    def num_envs(self) -> int:
        return self.pos.shape[0]
