"""Position setpoint task — hover to origin, state-only observations.

Parity with reference task/position_setpoint_task/position_setpoint_task.py:
13-d obs [pos_error, quat, body_linvel, body_angvel], exponential position
rewards + uprightness + anti-spin shaping, crash at dist > 8 m, episode
truncation at episode_len_steps. The whole RL step (sim + reward + reset +
obs) is ONE jitted function with the state donated — zero steady-state
allocation, one TPU program per step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..sim import dynamics
from ..sim.sim_builder import SimBuilder
from ..sim.structs import SimParams, SimState
from ..control.controllers import compute_robot_obs
from ..utils.math import exp_func, quat_apply_inverse, quat_axis, safe_norm
from ..utils.logging import CustomLogger

logger = CustomLogger("position_setpoint_task")


@dataclass
class PositionSetpointTaskConfig:
    seed: int = 1
    sim_name: str = "base_sim"
    env_name: str = "empty_env"
    robot_name: str = "base_quadrotor"
    controller_name: str = "lee_attitude_control"
    args: dict = field(default_factory=dict)
    num_envs: int = 4096
    use_warp: bool = False
    headless: bool = True
    device: str = "tpu"
    observation_space_dim: int = 13
    privileged_observation_space_dim: int = 0
    action_space_dim: int = 4
    episode_len_steps: int = 500
    return_state_before_reset: bool = False
    crash_dist_threshold: float = 8.0
    # carried for config-surface parity (reference
    # position_setpoint_task_config.py:22-32); the jit reward kernel
    # hardcodes its shaping constants in both frameworks
    reward_parameters: dict = field(default_factory=lambda: {
        "pos_error_gain1": [2.0, 2.0, 2.0],
        "pos_error_exp1": [1 / 3.5, 1 / 3.5, 1 / 3.5],
        "pos_error_gain2": [2.0, 2.0, 2.0],
        "pos_error_exp2": [2.0, 2.0, 2.0],
        "dist_reward_coefficient": 7.5,
        "max_dist": 15.0,
        "action_diff_penalty_gain": [1.0, 1.0, 1.0],
        "absolute_action_reward_gain": [2.0, 2.0, 2.0],
        "crash_penalty": -100,
    })


def compute_reward(pos_error, robot_quats, robot_angvels, crashes,
                   crash_dist: float):
    """Reference position_setpoint_task.py:244-282 reward shaping."""
    dist = safe_norm(pos_error, axis=-1)
    pos_reward = exp_func(dist, 3.0, 8.0) + exp_func(dist, 2.0, 4.0)
    dist_reward = (20.0 - dist) / 40.0
    ups = quat_axis(robot_quats, 2)
    tiltage = jnp.abs(1.0 - ups[..., 2])
    up_reward = 0.2 / (0.1 + tiltage * tiltage)
    spinnage = safe_norm(robot_angvels, axis=-1)
    ang_vel_reward = 3.0 / (1.0 + spinnage * spinnage)
    total = pos_reward + dist_reward + pos_reward * (up_reward + ang_vel_reward)
    crashes = jnp.where(dist > crash_dist, jnp.ones_like(crashes), crashes)
    total = jnp.where(crashes > 0.0, -20.0 * jnp.ones_like(total), total)
    return total, crashes


def task_step(params: SimParams, state: SimState, actions: jax.Array,
              target_position: jax.Array, episode_len: int, crash_dist: float,
              n_substeps=None, obs_before_reset: bool = False):
    """Fused: sim step -> reward -> termination -> masked reset -> obs."""
    state = dynamics.env_step(params, state, actions, n_substeps)

    obs = compute_robot_obs(state.pos, state.quat, state.linvel, state.angvel)
    pos_err_vf = quat_apply_inverse(obs.vehicle_quat, target_position - obs.pos)
    reward, crashes = compute_reward(pos_err_vf, obs.quat, obs.body_angvel,
                                     state.crashes, crash_dist)
    truncations = (state.sim_steps > episode_len).astype(jnp.float32)
    state = state.replace(crashes=crashes, truncations=truncations)

    # auto-reset AFTER reward; by default the returned obs reflect the
    # post-reset state (reference return_state_before_reset=False path);
    # obs_before_reset packs them from the pre-reset state instead
    # (reference position_setpoint_task.py:169-181 True path)
    state = dynamics.post_reward_step(params, state)

    def pack(o):
        return jnp.concatenate(
            [target_position - o.pos, o.quat, o.body_linvel, o.body_angvel],
            axis=-1)

    if obs_before_reset:
        task_obs = pack(obs)
    else:
        task_obs = pack(compute_robot_obs(state.pos, state.quat,
                                          state.linvel, state.angvel))
    return state, task_obs, reward, crashes, truncations


@partial(jax.jit, static_argnums=(0, 4, 5, 8), donate_argnums=2)
def _jit_task_step(params_key, params, state, actions, episode_len, crash_dist,
                   target_position, n_substeps, obs_before_reset=False):
    del params_key
    return task_step(params, state, actions, target_position, episode_len,
                     crash_dist, n_substeps, obs_before_reset)


class PositionSetpointTask:
    def __init__(self, task_config: PositionSetpointTaskConfig, seed=None,
                 num_envs=None, headless=None, device=None, use_warp=None):
        if seed is not None:
            task_config.seed = seed
        if num_envs is not None:
            task_config.num_envs = num_envs
        if headless is not None:
            task_config.headless = headless
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
        self._params_key = id(self.params)

        self.target_position = jnp.zeros((self.num_envs, 3), jnp.float32)
        self.actions = jnp.zeros((self.num_envs, task_config.action_space_dim),
                                 jnp.float32)
        self.prev_actions = jnp.zeros_like(self.actions)
        self.rewards = jnp.zeros((self.num_envs,), jnp.float32)
        self.terminations = jnp.zeros((self.num_envs,), jnp.float32)
        self.truncations = jnp.zeros((self.num_envs,), jnp.float32)
        self.infos: Dict = {}
        self.counter = 0

        self.observation_space_dim = task_config.observation_space_dim
        self.action_space_dim = task_config.action_space_dim

        self.task_obs = {
            "observations": jnp.zeros(
                (self.num_envs, task_config.observation_space_dim), jnp.float32),
            "priviliged_obs": jnp.zeros(
                (self.num_envs, task_config.privileged_observation_space_dim),
                jnp.float32),
            "collisions": jnp.zeros((self.num_envs, 1), jnp.float32),
            "rewards": jnp.zeros((self.num_envs, 1), jnp.float32),
        }

    # -- functional access for fused RL training --------------------------
    @property
    def state(self) -> SimState:
        return self.sim_env.state

    @state.setter
    def state(self, value: SimState):
        self.sim_env.state = value

    def functional_step(self, params, state, actions, n_substeps=None):
        """Pure step usable inside an outer jit/scan (PPO rollouts)."""
        return task_step(params, state, actions, self.target_position,
                         self.task_config.episode_len_steps,
                         self.task_config.crash_dist_threshold, n_substeps)

    def make_step_fn(self):
        """PPO protocol: (step_fn, init_carry, init_obs).

        step_fn(carry, action) -> (carry, obs, reward, term, trunc)."""
        params = self.params
        target = self.target_position
        episode_len = self.task_config.episode_len_steps
        crash_dist = self.task_config.crash_dist_threshold

        def step_fn(state, action):
            return task_step(params, state, action, target, episode_len,
                             crash_dist, None)

        self.reset()
        return step_fn, self.state, self.task_obs["observations"]

    def set_carry(self, carry):
        self.sim_env.state = carry

    # -- gym API ------------------------------------------------------------
    def close(self):
        self.sim_env.delete_env()

    def reset(self):
        self.target_position = jnp.zeros((self.num_envs, 3), jnp.float32)
        self.infos = {}
        self.sim_env.reset()
        obs = compute_robot_obs(self.state.pos, self.state.quat,
                                self.state.linvel, self.state.angvel)
        task_obs = jnp.concatenate(
            [self.target_position - obs.pos, obs.quat, obs.body_linvel,
             obs.body_angvel], axis=-1)
        self.task_obs["observations"] = task_obs
        return self.get_return_tuple()

    def reset_idx(self, env_ids):
        self.sim_env.reset_idx(env_ids)

    def render(self):
        return None

    def step(self, actions):
        self.counter += 1
        self.prev_actions = self.actions
        self.actions = jnp.asarray(actions, jnp.float32)
        n = jnp.int32(self.sim_env._sample_substeps())
        state, task_obs, reward, term, trunc = _jit_task_step(
            self._params_key, self.params, self.state, self.actions,
            self.task_config.episode_len_steps,
            self.task_config.crash_dist_threshold,
            self.target_position, n,
            bool(self.task_config.return_state_before_reset))
        self.sim_env.state = state
        self.sim_env.step_counter += 1
        self.task_obs["observations"] = task_obs
        self.rewards = reward
        self.terminations = term
        self.truncations = trunc
        self.infos = {}
        return self.get_return_tuple()

    def get_return_tuple(self):
        return (self.task_obs, self.rewards, self.terminations,
                self.truncations, self.infos)
