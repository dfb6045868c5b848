"""Task-API loop (reference examples/rl_env_example.py): build a registered
task via the task registry and drive it with random actions."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import jax
import jax.numpy as jnp

import aerial_gym_simulator_tpu as ag

if __name__ == "__main__":
    task = ag.task_registry.make_task("position_setpoint_task",
                                      num_envs=256, seed=42)
    obs, *_ = task.reset()
    key = jax.random.PRNGKey(0)
    for i in range(500):
        key, akey = jax.random.split(key)
        actions = jax.random.uniform(akey, (task.num_envs, 4),
                                     minval=-1.0, maxval=1.0)
        obs, reward, terminated, truncated, infos = task.step(actions)
        if i % 100 == 0:
            print(f"step {i}: reward {float(reward.mean()):.3f} "
                  f"crashes {int(terminated.sum())}")
