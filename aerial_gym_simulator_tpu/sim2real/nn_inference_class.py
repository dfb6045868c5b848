"""Checkpoint inference class (reference sim2real/nn_inference_class.py:27-110).

Same call surface as the reference's ``Sim2RealInferenceClass``:
``get_action(obs, get_np=..., get_robot_zero=...)`` + ``reset(env_ids)``.
Backed by the numpy-only policy (no GPU/accelerator needed at deployment).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..utils.logging import CustomLogger
from .numpy_policy import export_policy_npz, load_policy_npz

logger = CustomLogger("sim2real_inference")


class Sim2RealInferenceClass:
    def __init__(self, num_envs: int, num_actions: int, num_obs: int,
                 checkpoint_path: str):
        self.num_envs = num_envs
        self.num_actions = num_actions
        self.num_obs = num_obs
        if not checkpoint_path.endswith(".npz"):
            # training checkpoint: convert on the fly
            npz = checkpoint_path + ".npz"
            export_policy_npz(checkpoint_path, npz)
            checkpoint_path = npz
        # recurrent archives get the GRU runner, MLP ones the plain runner;
        # num_actions disambiguates mu-only heads with even action counts
        self.policy = load_policy_npz(checkpoint_path, num_envs=num_envs,
                                      action_dim=num_actions)
        if self.policy.action_dim != num_actions:
            logger.warning(
                f"checkpoint action dim {self.policy.action_dim} != requested "
                f"{num_actions}")
        logger.info(f"loaded policy from {checkpoint_path}")

    def reset(self, env_ids: Optional[Sequence[int]] = None):
        # recurrent policies zero their per-env GRU hidden here, exactly
        # like the reference's inference class (nn_inference_class.py reset
        # semantics); feed-forward policies have nothing to reset
        if hasattr(self.policy, "reset"):
            self.policy.reset(env_ids)

    def get_action(self, obs, get_np: bool = True, get_robot_zero: bool = False):
        obs = np.asarray(obs, np.float32)
        if obs.ndim == 1:
            obs = obs[None]
        actions = self.policy(obs)
        if get_robot_zero:
            actions = actions[0]
        if get_np:
            return actions
        # framework-tensor return (reference returns a torch tensor here);
        # this framework's device type is a jax array
        import jax.numpy as jnp
        return jnp.asarray(actions)
