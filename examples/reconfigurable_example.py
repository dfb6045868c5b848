"""Reconfigurable (snakey) robot demo: motor commands + joint velocity
targets through the reconfigurable position-setpoint task."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import jax.numpy as jnp
import numpy as np

import aerial_gym_simulator_tpu as ag

if __name__ == "__main__":
    task = ag.task_registry.make_task("position_setpoint_task_reconfigurable",
                                      num_envs=8, seed=0)
    task.reset()
    nm, nj = task.task_config.num_motors, task.task_config.num_joints
    # mid-range motor commands, slowly oscillating joint targets
    for i in range(300):
        joint_ratio = 0.5 + 0.4 * np.sin(i / 30.0)
        a = jnp.concatenate([
            jnp.full((8, nm), 0.45, jnp.float32),
            jnp.full((8, nj), joint_ratio, jnp.float32)], axis=1)
        obs, reward, term, trunc, infos = task.step(a)
        if i % 60 == 0:
            print(f"step {i}: joint pos mean {float(task.state.dof_pos.mean()):+.3f} "
                  f"reward {float(reward.mean()):7.2f}")
