"""IMU sensor: specific force + angular rate with bias random walk.

Parity with reference sensors/imu_sensor.py: accel = applied force / mass
(the force-sensor reading excludes gravity when the robot is in free fall —
a real accelerometer measures specific force), white noise scaled by
1/sqrt(dt), bias random walk scaled by sqrt(dt) (imu_sensor.py:74-83),
measurement clamping, optional world-frame output and gravity compensation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim.structs import ImuParams, SimParams, SimState
from ..utils.math import quat_rotate, quat_rotate_inverse

_f32 = lambda x: jnp.asarray(x, jnp.float32)


def build_imu_params(cfg) -> ImuParams:
    return ImuParams(
        accel_noise_std=_f32(cfg.accel_noise_std),
        gyro_noise_std=_f32(cfg.gyro_noise_std),
        accel_bias_std=_f32(cfg.accel_bias_std),
        gyro_bias_std=_f32(cfg.gyro_bias_std),
        max_accel=_f32(cfg.max_measurement_acceleration),
        max_gyro=_f32(cfg.max_measurement_angular_velocity),
        world_frame=cfg.world_frame,
        gravity_compensation=cfg.gravity_compensation,
    )


def imu_measurement(params: SimParams, state: SimState, key):
    """Returns (accel (N,3), gyro (N,3), new_accel_bias, new_gyro_bias)."""
    ip = params.imu
    dt = params.dt
    sqrt_dt = jnp.sqrt(dt)

    # specific force in body frame: applied forces / mass (gravity does not
    # appear in an accelerometer reading)
    accel_b = state.applied_force_b / params.robot.mass
    gyro_b = quat_rotate_inverse(state.quat, state.angvel)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    N = state.pos.shape[0]
    accel_bias = state.imu_accel_bias + (
        jax.random.normal(k1, (N, 3)) * ip.accel_bias_std * sqrt_dt)
    gyro_bias = state.imu_gyro_bias + (
        jax.random.normal(k2, (N, 3)) * ip.gyro_bias_std * sqrt_dt)

    accel = accel_b + accel_bias + (
        jax.random.normal(k3, (N, 3)) * ip.accel_noise_std / sqrt_dt)
    gyro = gyro_b + gyro_bias + (
        jax.random.normal(k4, (N, 3)) * ip.gyro_noise_std / sqrt_dt)

    if ip.gravity_compensation:
        accel = accel + quat_rotate_inverse(state.quat, params.gravity)
    if ip.world_frame:
        accel = quat_rotate(state.quat, accel)
        gyro = state.angvel

    accel = jnp.clip(accel, -ip.max_accel, ip.max_accel)
    gyro = jnp.clip(gyro, -ip.max_gyro, ip.max_gyro)
    return accel, gyro, accel_bias, gyro_bias
