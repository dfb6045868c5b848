"""BlueROV underwater vehicle demo (reference examples ROV demo).

Fully-actuated pose control: command position + orientation setpoints.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

if __name__ == "__main__":
    num_envs = 8
    env = SimBuilder().build_env(
        sim_name="base_sim", env_name="empty_env", robot_name="base_rov",
        controller_name="rov_fully_actuated_control",
        num_envs=num_envs, seed=0)
    env.reset()

    # action = [x, y, z, qx, qy, qz, qw] full pose setpoint
    setpoint = jnp.tile(
        jnp.array([0.5, -0.3, 0.2, 0.0, 0.0, 0.0, 1.0], jnp.float32),
        (num_envs, 1))
    for i in range(600):
        env.step(setpoint)
        if i % 100 == 99:
            err = jnp.linalg.norm(env.state.pos - setpoint[:, :3], axis=-1)
            print(f"step {i}: mean pose error {float(err.mean()):.3f} m")
