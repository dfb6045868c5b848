"""GPU-parallel geometric (Lee SE(3)) controller family — TPU-native.

Pure batched functions replacing the reference's stateful controller classes
(aerial_gym/control/controllers/*.py). The controller runs INSIDE the jitted
physics substep, batched over all envs, exactly like the reference runs it
inside the per-substep robot step (base_multirotor.py:296-307).

Dispatch is by static controller name at trace time, so each build compiles
only the controller it uses.

Controller name -> action semantics (reference parity):
  lee_position_control   [x, y, z, yaw]                   world-frame position
  lee_velocity_control   [vx, vy, vz, yaw_rate]           vehicle-frame velocity
  lee_attitude_control   [thrust, roll, pitch, yaw_rate]
  lee_rates_control      [thrust, wx, wy, wz]
  lee_acceleration_control [ax, ay, az, yaw_rate]
  lee_velocity_steering_angle_control [vx, vy, vz, yaw]
  fully_actuated_control [x, y, z, qx, qy, qz, qw]
  no_control             per-motor thrust references (pass-through)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..sim.structs import ControllerParams, RobotParams
from ..utils.math import (
    compute_vee_map,
    get_euler_xyz_tensor,
    normalize,
    quat_from_euler_xyz,
    quat_inverse,
    quat_mul,
    quat_rotate,
    quat_rotate_inverse,
    quat_to_rotation_matrix,
    rotation_matrix_to_quat,
    ssa,
    vehicle_frame_quat_from_quat,
)

CONTROLLER_NAMES = (
    "lee_position_control",
    "lee_velocity_control",
    "lee_attitude_control",
    "lee_rates_control",
    "lee_acceleration_control",
    "lee_velocity_steering_angle_control",
    "fully_actuated_control",
    "no_control",
)


class RobotObs(NamedTuple):
    """Derived per-substep robot states (reference base_multirotor.update_states)."""
    pos: jax.Array                # (N, 3) world
    quat: jax.Array               # (N, 4) xyzw
    linvel: jax.Array             # (N, 3) world
    angvel: jax.Array             # (N, 3) world
    euler: jax.Array              # (N, 3) ssa-wrapped xyz euler
    vehicle_quat: jax.Array       # (N, 4) yaw-only
    vehicle_linvel: jax.Array     # (N, 3)
    body_linvel: jax.Array        # (N, 3)
    body_angvel: jax.Array        # (N, 3)


class Gains(NamedTuple):
    K_pos: jax.Array
    K_vel: jax.Array
    K_rot: jax.Array
    K_angvel: jax.Array


def compute_robot_obs(pos, quat, linvel, angvel) -> RobotObs:
    return RobotObs(
        pos=pos,
        quat=quat,
        linvel=linvel,
        angvel=angvel,
        euler=ssa(get_euler_xyz_tensor(quat)),
        vehicle_quat=vehicle_frame_quat_from_quat(quat),
        vehicle_linvel=quat_rotate_inverse(vehicle_frame_quat_from_quat(quat), linvel),
        body_linvel=quat_rotate_inverse(quat, linvel),
        body_angvel=quat_rotate_inverse(quat, angvel),
    )


# ---------------------------------------------------------------------------
# shared pieces (reference base_lee_controller.py)
# ---------------------------------------------------------------------------


def compute_acceleration(obs: RobotObs, g: Gains, setpoint_position, setpoint_velocity):
    """K_pos * pos_err + K_vel * vel_err, velocity setpoint in vehicle frame."""
    pos_err = setpoint_position - obs.pos
    setvel_world = quat_rotate(obs.vehicle_quat, setpoint_velocity)
    vel_err = setvel_world - obs.linvel
    return g.K_pos * pos_err + g.K_vel * vel_err


def compute_body_torque(cp: ControllerParams, rp: RobotParams, obs: RobotObs,
                        g: Gains, setpoint_quat, setpoint_angvel):
    """SO(3) rotation-error torque with gyroscopic feed-forward
    (reference base_lee_controller.py:136-154)."""
    setpoint_angvel = setpoint_angvel.at[..., 2].set(
        jnp.clip(setpoint_angvel[..., 2], -cp.max_yaw_rate, cp.max_yaw_rate)
    )
    RT_Rd_quat = quat_mul(quat_inverse(obs.quat), setpoint_quat)
    RT_Rd = quat_to_rotation_matrix(RT_Rd_quat)
    rot_err = 0.5 * compute_vee_map(jnp.swapaxes(RT_Rd, -2, -1) - RT_Rd)
    angvel_err = obs.body_angvel - quat_rotate(RT_Rd_quat, setpoint_angvel)
    Iw = jnp.einsum("ij,nj->ni", rp.inertia, obs.body_angvel)
    feed_forward = jnp.cross(obs.body_angvel, Iw)
    return -g.K_rot * rot_err - g.K_angvel * angvel_err + feed_forward


def desired_quat_from_forces_and_yaw(forces, yaw_setpoint):
    """Small-angle desired orientation (reference
    calculate_desired_orientation_from_forces_and_yaw)."""
    c_phi_s_theta = forces[..., 0]
    s_phi = -forces[..., 1]
    c_phi_c_theta = forces[..., 2]
    pitch = jnp.arctan2(c_phi_s_theta, c_phi_c_theta)
    roll = jnp.arctan2(s_phi, jnp.sqrt(c_phi_c_theta**2 + c_phi_s_theta**2))
    return quat_from_euler_xyz(roll, pitch, yaw_setpoint)


def desired_quat_from_forces_full(forces, yaw_setpoint):
    """Full-SO(3) desired orientation from the thrust direction
    (reference calculate_desired_orientation_for_position_velocity_control)."""
    b3 = normalize(forces)
    temp = jnp.stack(
        [jnp.cos(yaw_setpoint), jnp.sin(yaw_setpoint), jnp.zeros_like(yaw_setpoint)],
        axis=-1,
    )
    b2 = normalize(jnp.cross(b3, temp))
    b1 = jnp.cross(b2, b3)
    R = jnp.stack([b1, b2, b3], axis=-1)  # columns are b1, b2, b3
    return rotation_matrix_to_quat(R)


def euler_rates_to_body_rates(euler, euler_rates):
    """T(euler) @ euler_rates (reference base_lee_controller.py:200-215)."""
    s_pitch = jnp.sin(euler[..., 1])
    c_pitch = jnp.cos(euler[..., 1])
    s_roll = jnp.sin(euler[..., 0])
    c_roll = jnp.cos(euler[..., 0])
    one = jnp.ones_like(s_pitch)
    zero = jnp.zeros_like(s_pitch)
    T = jnp.stack(
        [
            jnp.stack([one, zero, -s_pitch], axis=-1),
            jnp.stack([zero, c_roll, s_roll * c_pitch], axis=-1),
            jnp.stack([zero, -s_roll, c_roll * c_pitch], axis=-1),
        ],
        axis=-2,
    )
    return jnp.einsum("...ij,...j->...i", T, euler_rates)


# ---------------------------------------------------------------------------
# controller variants
# ---------------------------------------------------------------------------


def _g_norm(gravity):
    return jnp.linalg.norm(gravity)


def _thrust_along_body_z(obs: RobotObs, forces):
    """Project world-frame force command on the body z axis."""
    R = quat_to_rotation_matrix(obs.quat)
    return jnp.sum(forces * R[..., :, 2], axis=-1)


def _zero3(x):
    return jnp.zeros(x.shape[:-1] + (3,), dtype=x.dtype)


def lee_position_control(cp, rp, gravity, obs, g, action):
    accel = compute_acceleration(obs, g, action[..., 0:3], _zero3(action))
    forces = (accel - gravity) * rp.mass
    thrust = _thrust_along_body_z(obs, forces)
    quat_des = desired_quat_from_forces_full(forces, action[..., 3])
    torque = compute_body_torque(cp, rp, obs, g, quat_des, _zero3(action))
    return _wrench(thrust, torque)


def lee_velocity_control(cp, rp, gravity, obs, g, action):
    accel = compute_acceleration(obs, g, obs.pos, action[..., 0:3])
    forces = (accel - gravity) * rp.mass
    thrust = _thrust_along_body_z(obs, forces)
    quat_des = desired_quat_from_forces_full(forces, obs.euler[..., 2])
    euler_rates = _zero3(action).at[..., 2].set(action[..., 3])
    body_rates = euler_rates_to_body_rates(obs.euler, euler_rates)
    torque = compute_body_torque(cp, rp, obs, g, quat_des, body_rates)
    return _wrench(thrust, torque)


def lee_velocity_steering_angle_control(cp, rp, gravity, obs, g, action):
    accel = compute_acceleration(obs, g, obs.pos, action[..., 0:3])
    forces = (accel - gravity) * rp.mass
    thrust = _thrust_along_body_z(obs, forces)
    quat_des = desired_quat_from_forces_full(forces, action[..., 3])
    torque = compute_body_torque(cp, rp, obs, g, quat_des, _zero3(action))
    return _wrench(thrust, torque)


def lee_attitude_control(cp, rp, gravity, obs, g, action):
    thrust = (action[..., 0] + 1.0) * rp.mass * _g_norm(gravity)
    euler_rates = _zero3(action).at[..., 2].set(action[..., 3])
    body_rates = euler_rates_to_body_rates(obs.euler, euler_rates)
    quat_des = quat_from_euler_xyz(action[..., 1], action[..., 2], obs.euler[..., 2])
    torque = compute_body_torque(cp, rp, obs, g, quat_des, body_rates)
    return _wrench(thrust, torque)


def lee_rates_control(cp, rp, gravity, obs, g, action):
    # Note: reference rates_control.py:26 computes
    # (cmd[:,0] - gravity) * mass with inconsistent shapes; the intended
    # semantics (hover-normalized collective thrust like the attitude
    # controller) are implemented here.
    thrust = (action[..., 0] + 1.0) * rp.mass * _g_norm(gravity)
    torque = compute_body_torque(cp, rp, obs, g, obs.quat, action[..., 1:4])
    return _wrench(thrust, torque)


def lee_acceleration_control(cp, rp, gravity, obs, g, action):
    accel = action[..., 0:3]
    forces = rp.mass * (accel - gravity)
    thrust = _thrust_along_body_z(obs, forces)
    quat_des = desired_quat_from_forces_and_yaw(forces, obs.euler[..., 2])
    euler_rates = _zero3(action).at[..., 2].set(action[..., 3])
    body_rates = euler_rates_to_body_rates(obs.euler, euler_rates)
    torque = compute_body_torque(cp, rp, obs, g, quat_des, body_rates)
    return _wrench(thrust, torque)


def fully_actuated_control(cp, rp, gravity, obs, g, action):
    """6-DoF pose control: world-frame force rotated into the body frame
    (reference fully_actuated_control.py)."""
    quat_des = normalize(action[..., 3:7])
    accel = compute_acceleration(obs, g, action[..., 0:3], _zero3(action[..., 0:3]))
    forces = rp.mass * (accel - gravity)
    force_body = quat_rotate_inverse(obs.quat, forces)
    torque = compute_body_torque(cp, rp, obs, g, quat_des, _zero3(action[..., 0:3]))
    return jnp.concatenate([force_body, torque], axis=-1)


def _wrench(thrust_z, torque):
    zeros = jnp.zeros_like(thrust_z)
    return jnp.stack(
        [zeros, zeros, thrust_z, torque[..., 0], torque[..., 1], torque[..., 2]],
        axis=-1,
    )


_CONTROLLERS = {
    "lee_position_control": lee_position_control,
    "lee_velocity_control": lee_velocity_control,
    "lee_attitude_control": lee_attitude_control,
    "lee_rates_control": lee_rates_control,
    "lee_acceleration_control": lee_acceleration_control,
    "lee_velocity_steering_angle_control": lee_velocity_steering_angle_control,
    "fully_actuated_control": fully_actuated_control,
}


def controller_update(name: str, cp: ControllerParams, rp: RobotParams,
                      gravity, obs: RobotObs, gains: Gains, action):
    """Dispatch on the static controller name. 'no_control' is handled by
    the robot step (actions are motor thrust refs, not a wrench)."""
    if name == "no_control":
        raise ValueError("no_control has no wrench output; handled in robot step")
    try:
        fn = _CONTROLLERS[name]
    except KeyError:
        raise ValueError(f"unknown controller '{name}'; known: {CONTROLLER_NAMES}")
    return fn(cp, rp, gravity, obs, gains, action)
