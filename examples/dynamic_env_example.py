"""Dynamic obstacles via env_actions (reference examples/dynamic_env_example.py):
obstacles get twist commands [:, :, 0:3]=linvel, [:, :, 3:6]=angvel each step."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

if __name__ == "__main__":
    num_envs = 16
    env = SimBuilder().build_env(
        sim_name="base_sim",
        env_name="dynamic_env",
        robot_name="base_quadrotor",
        controller_name="lee_velocity_control",
        num_envs=num_envs,
        seed=1,
    )
    env.reset()
    A = env.params.scene.num_assets
    print(f"{A} dynamic obstacle slots per env")

    hover = jnp.zeros((num_envs, 4), jnp.float32)
    # constant slow drift for every obstacle
    env_actions = jnp.tile(
        jnp.array([0.1, 0.05, 0.0, 0.0, 0.0, 0.2], jnp.float32),
        (num_envs, A, 1))
    for i in range(500):
        env.step(hover, env_actions=env_actions)
        if i % 100 == 0:
            v = env.state.obstacle_linvel
            print(f"step {i}: obstacle mean |v| = "
                  f"{float(jnp.linalg.norm(v, axis=-1).mean()):.3f} m/s")
