"""IMU data collection (reference examples/imu_data_collection.py):
log the simulated IMU stream (accel/gyro with noise + bias random walk) of
a hovering quad to CSV for noise/Allan-variance analysis."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import csv

import jax
import jax.numpy as jnp

from aerial_gym_simulator_tpu.sensors.imu import imu_measurement
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--out", default="/tmp/imu_log.csv")
    args = p.parse_args()

    env = SimBuilder().build_env("base_sim", "empty_env",
                                 "base_quadrotor_with_imu",
                                 "lee_position_control", num_envs=1, seed=0)
    env.reset()
    hold = jnp.zeros((1, 4), jnp.float32)
    key = jax.random.PRNGKey(0)

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["t", "ax", "ay", "az", "gx", "gy", "gz"])
        dt = float(env.params.dt)
        for i in range(args.steps):
            env.step(hold)
            key, k = jax.random.split(key)
            accel, gyro, new_ab, new_gb = imu_measurement(
                env.params, env.state, k)
            env.state = env.state.replace(imu_accel_bias=new_ab,
                                          imu_gyro_bias=new_gb)
            w.writerow([i * dt] + [float(v) for v in accel[0]]
                       + [float(v) for v in gyro[0]])
    print(f"wrote {args.steps} IMU samples to {args.out}")
