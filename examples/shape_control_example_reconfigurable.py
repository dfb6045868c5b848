"""Shape control of a reconfigurable robot with joint velocity setpoints
(reference examples/shape_control_example_reconfigurable.py).

Drives the EnvManager directly (no Task): the snakey robot under
``no_control`` receives zero motor commands in a zero-gravity sim while the
arm joints track velocity targets that change every 200 steps. Mirrors the
reference's example-scope registration of ``base_sim_no_gravity_2ms``
(shape_control_example_reconfigurable.py:19-20).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.config.sim_config.base_sim_config import (
    BaseSimNoGravityConfig,
)
from aerial_gym_simulator_tpu.registry.registries import sim_config_registry
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder
from aerial_gym_simulator_tpu.utils.helpers import get_args
from aerial_gym_simulator_tpu.utils.logging import CustomLogger

logger = CustomLogger(__name__)


def _make_no_gravity_2ms():
    cfg = BaseSimNoGravityConfig()
    cfg.dt = 0.002
    return cfg


if __name__ == "__main__":
    args = get_args(extras=(("--steps", dict(type=int, default=1000)),))
    logger.warning(
        "This example demonstrates shape control of a reconfigurable robot "
        "with joint angle setpoints. Motor control for this robot is not "
        "implemented."
    )
    sim_config_registry.register("base_sim_no_gravity_2ms",
                                 _make_no_gravity_2ms)
    num_envs = getattr(args, "num_envs", None) or 16
    env_manager = SimBuilder().build_env(
        sim_name="base_sim_no_gravity_2ms",
        env_name="empty_env_2ms",
        robot_name="snakey",
        controller_name="no_control",
        args=None,
        num_envs=num_envs,
        headless=getattr(args, "headless", True),
        use_warp=getattr(args, "use_warp", False),
    )
    num_joints = env_manager.state.dof_pos.shape[-1]
    actions = jnp.zeros((env_manager.num_envs,
                         env_manager.num_robot_actions), jnp.float32)
    env_manager.reset()

    rng = np.random.default_rng(0)
    steps = int(getattr(args, "steps", None) or 1000)
    for i in range(steps):
        if i % 200 == 0:
            logger.info(f"Step {i}, changing target shape.")
            env_manager.reset()
            dof_dir = 2.0 * (rng.random((env_manager.num_envs, num_joints))
                             .astype(np.float32) - 0.5)
            env_manager.robot_manager.robot.set_dof_velocity_targets(
                (np.pi / 5.0) * dof_dir)
        env_manager.step(actions=actions)
        if i % 200 == 199:
            q = env_manager.state.dof_pos
            print(f"step {i}: joint pos mean {float(q.mean()):+.3f} "
                  f"min {float(q.min()):+.3f} max {float(q.max()):+.3f}")
