"""Morphy flexible-arm quad demo (reference examples/morphy example).

Hover a morphy and watch the passive spring-damper arms settle.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import jax.numpy as jnp

import aerial_gym_simulator_tpu as ag

if __name__ == "__main__":
    task = ag.task_registry.make_task("position_setpoint_task_morphy",
                                      num_envs=8, seed=0)
    task.reset()
    hover = jnp.full((8, 4), 0.36, jnp.float32)   # ratio -> ~hover thrust
    for i in range(300):
        obs, reward, term, trunc, infos = task.step(hover)
        if i % 50 == 0:
            q = task.state.dof_pos
            qd = task.state.dof_vel
            print(f"step {i}: arm angle mean {float(q.mean()):+.4f} rad "
                  f"|vel| {float(jnp.abs(qd).max()):.4f} "
                  f"reward {float(reward.mean()):.2f}")
