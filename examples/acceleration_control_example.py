"""Acceleration-setpoint control demo (reference
examples/acceleration_control_example.py): command body-frame acceleration
+ yaw rate through the Lee acceleration controller."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

if __name__ == "__main__":
    num_envs = 64
    env = SimBuilder().build_env(
        sim_name="base_sim", env_name="empty_env",
        robot_name="base_quadrotor",
        controller_name="lee_acceleration_control",
        num_envs=num_envs, seed=0)
    env.reset()

    for i in range(600):
        # sinusoidal lateral acceleration command, zero yaw rate
        ax = 0.5 * np.sin(i * 0.01 * 2 * np.pi * 0.2)
        actions = jnp.tile(jnp.array([ax, 0.0, 0.0, 0.0], jnp.float32),
                           (num_envs, 1))
        env.step(actions)
        if i % 150 == 149:
            v = env.state.linvel
            print(f"step {i}: ax_cmd {ax:+.2f}  mean vx "
                  f"{float(v[:, 0].mean()):+.3f} m/s  mean vz "
                  f"{float(v[:, 2].mean()):+.3f} m/s")
