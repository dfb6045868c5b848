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
    sample_factory/aerialgym_examples/train_aerialgym.py:33-88).

    Protocol surface pinned by tests/data/sf_protocol_transcript.json
    (replayed by tests/test_sample_factory_adapter.py): sample-factory
    builds its actor-critic from PER-AGENT observation_space/action_space
    (the reference wraps the IG spaces through convert_space), expects
    bool terminated/truncated arrays it can bitwise-or, may hand actions
    over as torch tensors, and never calls reset() between episodes in
    batched mode (the fused task steps auto-reset internally).

    Seeding: construction-time seeding is authoritative. The task's
    per-env PRNG keys live inside the jitted SimState and are derived from
    the seed passed to ``make_task`` — the ``seed=`` kwarg sample-factory
    hands to ``reset()`` (see the pinned transcript) cannot re-key a
    running fused program, so ``reset`` forwards it to ``task.seed()``
    (host-side np RNG for any host randomization) and otherwise ignores
    it, matching the reference where IsaacGym also seeds at sim build
    only (train_aerialgym.py seeds before env construction)."""

    def __init__(self, task, obs_key: str = "observations"):
        self.task = task
        self.obs_key = obs_key
        self.num_agents = task.num_envs
        self.render_mode = None
        try:
            import gymnasium as gym

            obs_dim = int(task.observation_space_dim)
            act_dim = int(task.action_space_dim)
            self.observation_space = gym.spaces.Dict({
                "obs": gym.spaces.Box(-np.inf, np.inf, (obs_dim,),
                                      np.float32)})
            self.action_space = gym.spaces.Box(-1.0, 1.0, (act_dim,),
                                               np.float32)
        except ImportError:  # pragma: no cover - gymnasium ships with sf
            self.observation_space = None
            self.action_space = None

    def reset(self, *args, seed=None, **kwargs):
        if seed is not None and hasattr(self.task, "seed"):
            self.task.seed(seed)   # host-side RNG only; see class docstring
        obs, *_ = self.task.reset()
        return {"obs": np.asarray(obs[self.obs_key])}, {}

    def step(self, actions):
        if hasattr(actions, "detach"):     # torch tensor (sf batched mode)
            actions = actions.detach().cpu().numpy()
        obs, rew, term, trunc, infos = self.task.step(jnp.asarray(actions))
        return ({"obs": np.asarray(obs[self.obs_key])},
                np.asarray(rew, np.float32),
                np.asarray(term).astype(bool),
                np.asarray(trunc).astype(bool), infos)

    def render(self):
        pass

    def close(self):
        self.task.close()
