"""Policy/value networks (flax).

Equivalent capability to the reference's RL-framework models: 3-layer MLP
actor-critic (rl_training/rl_games/ppo_aerial_quad.yaml: [256, 128, 64] elu;
cleanrl: tanh MLPs). Kept in float32 for the small MLPs — they are latency-
bound, not MXU-bound, at these sizes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ActorCritic(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (256, 128, 64)
    activation: str = "elu"

    @nn.compact
    def __call__(self, obs):
        act = getattr(nn, self.activation)
        x = obs
        for h in self.hidden:
            x = act(nn.Dense(h, kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                             bias_init=nn.initializers.zeros)(x))
        mean = nn.Dense(self.action_dim,
                        kernel_init=nn.initializers.orthogonal(0.01),
                        bias_init=nn.initializers.zeros)(x)
        log_std = self.param("log_std", nn.initializers.zeros, (self.action_dim,))

        v = obs
        for h in self.hidden:
            v = act(nn.Dense(h, kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                             bias_init=nn.initializers.zeros)(v))
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         bias_init=nn.initializers.zeros)(v)
        return mean, log_std, value.squeeze(-1)


class ActorCriticGRU(nn.Module):
    """Recurrent actor-critic: encoder MLP -> GRU core -> separate heads.

    Same topology family as the reference's sample-factory navigation
    policies (encoder -> core.core GRU -> action/value heads; see
    sim2real/torch_import.py for the shipped-checkpoint layout) — but
    trained natively here by the fused PPO learner (the reference can only
    train recurrent policies through the external sample-factory stack).
    The hidden state is explicit (functional): ``__call__(obs, h) ->
    (mean, log_std, value, h_new)`` so rollouts scan it and PPO replays it.
    """

    action_dim: int
    hidden: Sequence[int] = (256,)
    rnn_hidden: int = 256
    activation: str = "elu"

    @nn.compact
    def __call__(self, obs, h):
        act = getattr(nn, self.activation)
        x = obs
        for w in self.hidden:
            x = act(nn.Dense(w, kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                             bias_init=nn.initializers.zeros)(x))
        h_new, x = nn.GRUCell(features=self.rnn_hidden)(h, x)
        mean = nn.Dense(self.action_dim,
                        kernel_init=nn.initializers.orthogonal(0.01),
                        bias_init=nn.initializers.zeros)(x)
        log_std = self.param("log_std", nn.initializers.zeros, (self.action_dim,))
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         bias_init=nn.initializers.zeros)(x)
        return mean, log_std, value.squeeze(-1), h_new


def sample_action(mean, log_std, key):
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    action = mean + std * noise
    logp = gaussian_logp(mean, log_std, action)
    return action, logp


def gaussian_logp(mean, log_std, action):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(-0.5 * z * z - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
