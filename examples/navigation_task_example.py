"""Navigation task demo (reference examples/navigation_task_example.py):
drive the depth-camera navigation task with simple forward-flight actions."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import jax.numpy as jnp
import numpy as np

import aerial_gym_simulator_tpu as ag

if __name__ == "__main__":
    task = ag.task_registry.make_task("navigation_task", num_envs=16, seed=7)
    task.reset()
    # fly forward at moderate speed, no yaw: raw action [fwd, incl, yawrate]
    actions = jnp.tile(jnp.array([0.5, 0.0, 0.0, 0.0], jnp.float32), (16, 1))
    for i in range(300):
        obs, reward, terminated, truncated, infos = task.step(actions)
        if i % 50 == 0:
            print(f"step {i}: reward {float(reward.mean()):7.3f} "
                  f"crashes {int(terminated.sum())} "
                  f"successes {int(np.asarray(infos['successes']).sum())} "
                  f"level {float(infos['curriculum_level']):.0f}")
