"""Custom task template (reference task/custom_task/custom_task.py).

Copy this file, fill in the marked sections, and register your task:

    from aerial_gym_simulator_tpu.registry.registries import task_registry
    task_registry.register_task("my_task", CustomTask, CustomTaskConfig)

The TPU-native pattern: express your whole RL step (sim step -> reward ->
termination -> masked auto-reset -> observation packing) as ONE pure
function over the SimState pytree, then jit it with the state donated. The
built-in tasks (position_setpoint_task.py, navigation_task.py) are complete
worked examples of this pattern.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..control.controllers import compute_robot_obs
from ..sim import dynamics
from ..sim.sim_builder import SimBuilder
from ..utils.logging import CustomLogger

logger = CustomLogger("custom_task")


@dataclass
class CustomTaskConfig:
    seed: int = 1
    sim_name: str = "base_sim"
    env_name: str = "empty_env"
    robot_name: str = "base_quadrotor"
    controller_name: str = "lee_velocity_control"
    args: dict = field(default_factory=dict)
    num_envs: int = 64
    use_warp: bool = False
    headless: bool = True
    device: str = "tpu"
    observation_space_dim: int = 13
    privileged_observation_space_dim: int = 0
    action_space_dim: int = 4
    episode_len_steps: int = 500


class CustomTask:
    def __init__(self, task_config: CustomTaskConfig, seed=None, num_envs=None,
                 headless=None, device=None, use_warp=None):
        if seed is not None:
            task_config.seed = seed
        if num_envs is not None:
            task_config.num_envs = num_envs
        self.task_config = task_config

        self.sim_env = SimBuilder().build_env(
            sim_name=task_config.sim_name,
            env_name=task_config.env_name,
            robot_name=task_config.robot_name,
            controller_name=task_config.controller_name,
            num_envs=task_config.num_envs,
            seed=task_config.seed,
        )
        self.num_envs = self.sim_env.num_envs
        self.params = self.sim_env.params
        self.observation_space_dim = task_config.observation_space_dim
        self.action_space_dim = task_config.action_space_dim
        self.infos: Dict = {}
        self.task_obs = {
            "observations": jnp.zeros(
                (self.num_envs, task_config.observation_space_dim), jnp.float32),
            "priviliged_obs": jnp.zeros(
                (self.num_envs, task_config.privileged_observation_space_dim),
                jnp.float32),
            "collisions": jnp.zeros((self.num_envs, 1), jnp.float32),
            "rewards": jnp.zeros((self.num_envs, 1), jnp.float32),
        }
        self.rewards = jnp.zeros((self.num_envs,), jnp.float32)
        self.terminations = jnp.zeros((self.num_envs,), jnp.float32)
        self.truncations = jnp.zeros((self.num_envs,), jnp.float32)
        self._jit_step = jax.jit(self._task_step, donate_argnums=0)

    # ------------------------------------------------------------------
    # YOUR TASK LOGIC: edit reward / termination / observations below.
    # Everything stays inside one jitted function.
    # ------------------------------------------------------------------
    def _task_step(self, state, actions):
        state = dynamics.env_step(self.params, state, actions, None)
        obs = compute_robot_obs(state.pos, state.quat, state.linvel,
                                state.angvel)

        # >>> reward: implement your own <<<
        reward = -jnp.linalg.norm(obs.pos, axis=-1)

        truncations = (state.sim_steps
                       > self.task_config.episode_len_steps).astype(jnp.float32)
        state = state.replace(truncations=truncations)
        state = dynamics.post_reward_step(self.params, state)

        obs2 = compute_robot_obs(state.pos, state.quat, state.linvel,
                                 state.angvel)
        # >>> observations: pack what your policy needs <<<
        task_obs = jnp.concatenate(
            [-obs2.pos, obs2.quat, obs2.body_linvel, obs2.body_angvel], axis=-1)
        return state, task_obs, reward, state.crashes, truncations

    # -- gym API ---------------------------------------------------------
    @property
    def state(self):
        return self.sim_env.state

    def close(self):
        self.sim_env.delete_env()

    def reset(self):
        self.sim_env.reset()
        return self.get_return_tuple()

    def reset_idx(self, env_ids):
        self.sim_env.reset_idx(env_ids)

    def render(self):
        return None

    def step(self, actions):
        actions = jnp.asarray(actions, jnp.float32)
        state, task_obs, reward, term, trunc = self._jit_step(
            self.sim_env.state, actions)
        self.sim_env.state = state
        self.task_obs["observations"] = task_obs
        self.rewards, self.terminations, self.truncations = reward, term, trunc
        return self.get_return_tuple()

    def get_return_tuple(self):
        return (self.task_obs, self.rewards, self.terminations,
                self.truncations, self.infos)


# Register your task by uncommenting (reference task/__init__.py:133-135):
# from aerial_gym_simulator_tpu.registry.registries import task_registry
# task_registry.register_task("custom_task", CustomTask, CustomTaskConfig)
