"""IMU sensor: specific force + angular rate with bias random walk.

Parity with reference sensors/imu_sensor.py: accel = applied force / mass
(the force-sensor reading excludes gravity when the robot is in free fall —
a real accelerometer measures specific force), white noise scaled by
1/sqrt(dt), bias random walk scaled by sqrt(dt) (imu_sensor.py:74-83),
enable_noise / enable_bias gates (:66-67, :112-116), randomized
mount-orientation quaternion rotating the measurement into the perturbed
sensor frame (:47-56, :100-106), uniform bias re-init at reset
(:133-135), measurement clamping, optional world-frame output and gravity
compensation.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..sim.structs import ImuParams, SimParams, SimState
from ..utils.math import quat_from_euler_xyz, quat_mul, quat_rotate, \
    quat_rotate_inverse

_f32 = lambda x: jnp.asarray(x, jnp.float32)


def build_imu_params(cfg) -> ImuParams:
    # reference configs carry 6-vector bias init ([accel, gyro],
    # imu_config/base_imu_config.py:41-48); our dataclasses may give
    # either the 6-vector or split 3-vectors.
    bias_init = np.asarray(
        getattr(cfg, "max_bias_init_value", [1e-3] * 6), np.float32)
    if bias_init.shape == (6,):
        accel_bias_init, gyro_bias_init = bias_init[:3], bias_init[3:]
    else:
        accel_bias_init = gyro_bias_init = bias_init
    deg2rad = np.pi / 180.0
    return ImuParams(
        accel_noise_std=_f32(cfg.accel_noise_std),
        gyro_noise_std=_f32(cfg.gyro_noise_std),
        accel_bias_std=_f32(cfg.accel_bias_std),
        gyro_bias_std=_f32(cfg.gyro_bias_std),
        max_accel=_f32(cfg.max_measurement_acceleration),
        max_gyro=_f32(cfg.max_measurement_angular_velocity),
        accel_bias_init=_f32(accel_bias_init),
        gyro_bias_init=_f32(gyro_bias_init),
        min_mount_euler_rad=_f32(
            np.asarray(getattr(cfg, "min_euler_rotation_deg",
                               [-2.0, -2.0, -2.0]), np.float32) * deg2rad),
        max_mount_euler_rad=_f32(
            np.asarray(getattr(cfg, "max_euler_rotation_deg",
                               [2.0, 2.0, 2.0]), np.float32) * deg2rad),
        world_frame=cfg.world_frame,
        gravity_compensation=cfg.gravity_compensation,
        enable_noise=bool(getattr(cfg, "enable_noise", True)),
        enable_bias=bool(getattr(cfg, "enable_bias", True)),
        randomize_placement=bool(getattr(cfg, "randomize_placement", False)),
    )


def sample_imu_reset(ip: ImuParams, keys):
    """Per-env reset draws: uniform bias init in +-max_bias_init and a
    fresh mount quaternion (reference imu_sensor.py:133-139). ``keys`` is
    (N, 2) per-env PRNG keys; returns (accel_bias, gyro_bias, mount_quat)."""
    N = keys.shape[0]
    k_a = jax.vmap(jax.random.fold_in)(keys, jnp.zeros((N,), jnp.uint32))
    k_g = jax.vmap(jax.random.fold_in)(keys, jnp.ones((N,), jnp.uint32))
    k_m = jax.vmap(jax.random.fold_in)(keys, jnp.full((N,), 2, jnp.uint32))
    u = lambda k, lo, hi: lo + (hi - lo) * jax.vmap(
        lambda kk: jax.random.uniform(kk, (3,)))(k)
    accel_bias = u(k_a, -ip.accel_bias_init, ip.accel_bias_init)
    gyro_bias = u(k_g, -ip.gyro_bias_init, ip.gyro_bias_init)
    if ip.randomize_placement:
        eul = u(k_m, ip.min_mount_euler_rad, ip.max_mount_euler_rad)
        mount_quat = quat_from_euler_xyz(eul[:, 0], eul[:, 1], eul[:, 2])
    else:
        mount_quat = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), (N, 4))
    return accel_bias, gyro_bias, mount_quat


def imu_measurement(params: SimParams, state: SimState, key):
    """Returns (accel (N,3), gyro (N,3), new_accel_bias, new_gyro_bias)."""
    ip = params.imu
    dt = params.dt
    sqrt_dt = jnp.sqrt(dt)

    # specific force in body frame: applied forces / mass (gravity does not
    # appear in an accelerometer reading)
    accel_b = state.applied_force_b / params.robot.mass
    gyro_b = quat_rotate_inverse(state.quat, state.angvel)

    # rotate into the perturbed sensor frame (imu_sensor.py:100-106)
    mq = state.imu_mount_quat
    accel_s = quat_rotate_inverse(mq, accel_b)
    gyro_s = quat_rotate_inverse(mq, gyro_b)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    N = state.pos.shape[0]
    accel_bias = state.imu_accel_bias + (
        jax.random.normal(k1, (N, 3)) * ip.accel_bias_std * sqrt_dt)
    gyro_bias = state.imu_gyro_bias + (
        jax.random.normal(k2, (N, 3)) * ip.gyro_bias_std * sqrt_dt)

    e_bias = 1.0 if ip.enable_bias else 0.0
    e_noise = 1.0 if ip.enable_noise else 0.0
    accel = accel_s + e_bias * accel_bias + e_noise * (
        jax.random.normal(k3, (N, 3)) * ip.accel_noise_std / sqrt_dt)
    gyro = gyro_s + e_bias * gyro_bias + e_noise * (
        jax.random.normal(k4, (N, 3)) * ip.gyro_noise_std / sqrt_dt)

    if ip.gravity_compensation:
        accel = accel + quat_rotate_inverse(
            quat_mul(state.quat, mq), params.gravity)
    if ip.world_frame:
        accel = quat_rotate(quat_mul(state.quat, mq), accel)
        gyro = state.angvel

    accel = jnp.clip(accel, -ip.max_accel, ip.max_accel)
    gyro = jnp.clip(gyro, -ip.max_gyro, ip.max_gyro)
    return accel, gyro, accel_bias, gyro_bias
