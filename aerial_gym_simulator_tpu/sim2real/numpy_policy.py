"""Numpy-only policy inference for onboard deployment.

The training checkpoint (rl/ppo.py PPOTrainer.save_checkpoint) is converted
once with :func:`export_policy_npz` into a flat .npz of weight matrices;
:class:`NumpyPolicy` then runs the actor MLP with nothing but numpy — the
robot-side equivalent of the reference's torch-based inference classes
(sim2real/nn_inference_class.py) without the framework dependency.
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np


def export_policy_npz(checkpoint_path: str, npz_path: str):
    """Convert a PPOTrainer checkpoint into a flat numpy archive.

    Requires jax/flax (run on the training machine, not the robot).
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..rl.networks import ActorCritic

    with open(checkpoint_path, "rb") as f:
        blob = pickle.load(f)
    cfg = blob["cfg"]
    hidden = tuple(cfg.get("hidden", (256, 128, 64)))
    activation = cfg.get("activation", "elu")

    # rebuild a params skeleton to deserialize into
    norm = blob["norm"]
    obs_dim = int(blob.get("obs_dim", np.asarray(norm["mean"]).shape[0]))
    act_dim = int(blob["action_dim"])
    net = ActorCritic(action_dim=act_dim, hidden=hidden, activation=activation)
    skeleton = net.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    params = serialization.from_bytes(skeleton, blob["params"])

    flat = {"activation": np.array(activation), "obs_dim": np.array(obs_dim),
            "norm_mean": np.asarray(norm["mean"]),
            "norm_var": np.asarray(norm["var"]),
            "normalize_obs": np.array(bool(cfg.get("normalize_obs", True)))}
    dense = params["params"]
    n_layers = len(hidden) + 1
    for i in range(n_layers):  # actor stack: Dense_0 .. Dense_{n}
        layer = dense[f"Dense_{i}"]
        flat[f"W{i}"] = np.asarray(layer["kernel"])
        flat[f"b{i}"] = np.asarray(layer["bias"])
    flat["log_std"] = np.asarray(dense["log_std"])
    np.savez(npz_path, **flat)
    return npz_path


def _elu(x):
    # expm1 only on the negative side (avoids overflow warnings from the
    # unselected branch of np.where)
    return np.where(x > 0, x, np.expm1(np.minimum(x, 0.0)))


def _tanh(x):
    return np.tanh(x)


_ACT = {"elu": _elu, "tanh": _tanh, "relu": lambda x: np.maximum(x, 0.0)}


class NumpyPolicy:
    """Deterministic actor inference from an exported .npz; numpy only."""

    def __init__(self, npz_path: str):
        data = np.load(npz_path, allow_pickle=True)
        self.act = _ACT[str(data["activation"])]
        self.normalize_obs = bool(data["normalize_obs"])
        self.norm_mean = data["norm_mean"].astype(np.float32)
        self.norm_var = data["norm_var"].astype(np.float32)
        # normalizer epsilon is format-dependent: our RunningMeanStd uses
        # 1e-8, rl-games' uses 1e-5 — imported archives carry their own
        self.norm_eps = float(data["norm_eps"]) if "norm_eps" in data else 1e-8
        self.layers = []
        i = 0
        while f"W{i}" in data:
            self.layers.append((data[f"W{i}"].astype(np.float32),
                                data[f"b{i}"].astype(np.float32)))
            i += 1
        self.log_std = data["log_std"].astype(np.float32)

    @property
    def action_dim(self) -> int:
        return self.layers[-1][0].shape[1]

    def __call__(self, obs: np.ndarray) -> np.ndarray:
        x = np.asarray(obs, np.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        if self.normalize_obs:
            x = np.clip((x - self.norm_mean)
                        / np.sqrt(self.norm_var + self.norm_eps), -5.0, 5.0)
        *hidden_layers, (W_out, b_out) = self.layers
        for W, b in hidden_layers:
            x = self.act(x @ W + b)
        x = x @ W_out + b_out
        return x[0] if squeeze else x
