"""Minimal standalone-sim loop (reference examples/position_control_example.py).

Builds an env directly through SimBuilder (no Task) and flies the quad to a
sequence of position setpoints with the geometric Lee position controller.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

if __name__ == "__main__":
    num_envs = 64
    env = SimBuilder().build_env(
        sim_name="base_sim",
        env_name="empty_env",
        robot_name="base_quadrotor",
        controller_name="lee_position_control",
        num_envs=num_envs,
        seed=0,
    )
    env.reset()

    # actions = [x, y, z, yaw] world-frame position setpoint
    actions = jnp.zeros((num_envs, 4), jnp.float32)
    for i in range(1000):
        if i % 200 == 0:
            # new random setpoint for every env
            target = np.random.uniform(-1.0, 1.0, size=(num_envs, 3))
            yaw = np.random.uniform(-np.pi, np.pi, size=(num_envs, 1))
            actions = jnp.asarray(np.concatenate([target, yaw], axis=1),
                                  jnp.float32)
            print(f"step {i}: new setpoints, first env -> "
                  f"{np.asarray(actions[0])}")
        env.step(actions)
        if i % 200 == 199:
            err = jnp.linalg.norm(env.state.pos - actions[:, :3], axis=-1)
            print(f"step {i}: mean position error {float(err.mean()):.3f} m")
