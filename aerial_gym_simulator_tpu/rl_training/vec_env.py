"""Gym-style vectorized env wrappers over the task API.

Equivalent of the reference's ExtractObsWrapper + AERIALRLGPUEnv
(rl_training/rl_games/runner.py:26-79): flattens the task's obs dict to a
plain array and merges terminations/truncations into a single `dones`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class ExtractObsWrapper:
    """obs dict -> `observations` array; dones = terminated | truncated."""

    def __init__(self, task):
        self.task = task
        self.num_envs = task.num_envs
        self.num_obs = task.observation_space_dim
        self.num_actions = task.action_space_dim

    def reset(self):
        obs, *_ = self.task.reset()
        return obs["observations"]

    def step(self, actions):
        obs, rew, term, trunc, infos = self.task.step(actions)
        dones = jnp.maximum(term, trunc)
        return obs["observations"], rew, dones, infos

    def close(self):
        self.task.close()


class AerialGymVecEnv:
    """sample-factory style vec env: returns (obs_dict, rew, term, trunc,
    infos) with numpy conversion for host-side frameworks (reference
    sample_factory/aerialgym_examples/train_aerialgym.py:33-88)."""

    def __init__(self, task, obs_key: str = "observations"):
        self.task = task
        self.obs_key = obs_key
        self.num_agents = task.num_envs

    def reset(self, *args, **kwargs):
        obs, *_ = self.task.reset()
        return {"obs": np.asarray(obs[self.obs_key])}, {}

    def step(self, actions):
        obs, rew, term, trunc, infos = self.task.step(jnp.asarray(actions))
        return ({"obs": np.asarray(obs[self.obs_key])}, np.asarray(rew),
                np.asarray(term), np.asarray(trunc), infos)

    def close(self):
        self.task.close()
