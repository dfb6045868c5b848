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

    Feed-forward (MLP) checkpoints export to the :class:`NumpyPolicy`
    layout; recurrent ones (cfg.rnn == "gru") export to the recurrent
    layout consumed by
    :class:`~aerial_gym_simulator_tpu.sim2real.torch_import.NumpyRecurrentPolicy`
    (the same archive format imported sample-factory GRU policies use).
    Requires jax/flax (run on the training machine, not the robot).
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..rl.networks import ActorCritic, ActorCriticGRU

    with open(checkpoint_path, "rb") as f:
        blob = pickle.load(f)
    cfg = blob["cfg"]
    hidden = tuple(cfg.get("hidden", (256, 128, 64)))
    activation = cfg.get("activation", "elu")
    rnn = cfg.get("rnn")
    if rnn not in (None, "gru"):
        raise ValueError(f"cannot export rnn={rnn!r} checkpoints "
                         f"(supported: None, 'gru')")

    # rebuild a params skeleton to deserialize into
    norm = blob["norm"]
    obs_dim = int(blob.get("obs_dim", np.asarray(norm["mean"]).shape[0]))
    act_dim = int(blob["action_dim"])
    flat = {"activation": np.array(activation), "obs_dim": np.array(obs_dim),
            "norm_mean": np.asarray(norm["mean"]),
            "norm_var": np.asarray(norm["var"]),
            "norm_eps": np.array(1e-8, np.float32),  # RunningMeanStd epsilon
            "normalize_obs": np.array(bool(cfg.get("normalize_obs", True)))}

    if rnn == "gru":
        rnn_hidden = int(cfg.get("rnn_hidden", 256))
        net = ActorCriticGRU(action_dim=act_dim, hidden=hidden,
                             rnn_hidden=rnn_hidden, activation=activation)
        skeleton = net.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)),
                            jnp.zeros((1, rnn_hidden)))
        params = serialization.from_bytes(skeleton, blob["params"])
        dense = params["params"]
        # encoder MLP: Dense_0 .. Dense_{k-1} feed the GRU
        for i in range(len(hidden)):
            flat[f"enc_W{i}"] = np.asarray(dense[f"Dense_{i}"]["kernel"])
            flat[f"enc_b{i}"] = np.asarray(dense[f"Dense_{i}"]["bias"])
        flat["n_enc"] = np.array(len(hidden))
        # flax GRUCell gates (r, z, n; dense_h for r/z has no bias) map
        # exactly onto torch.nn.GRU's packed (3H, .) weight layout — both
        # cells compute h' = (1-z)*tanh(Wx+b + r*(Uh+c)) + z*h
        g = dense["GRUCell_0"]
        t = lambda a: np.asarray(a).T
        flat["gru_Wih"] = np.concatenate(
            [t(g["ir"]["kernel"]), t(g["iz"]["kernel"]), t(g["in"]["kernel"])])
        flat["gru_Whh"] = np.concatenate(
            [t(g["hr"]["kernel"]), t(g["hz"]["kernel"]), t(g["hn"]["kernel"])])
        flat["gru_bih"] = np.concatenate(
            [np.asarray(g["ir"]["bias"]), np.asarray(g["iz"]["bias"]),
             np.asarray(g["in"]["bias"])])
        zeros_h = np.zeros((rnn_hidden,), np.float32)
        flat["gru_bhh"] = np.concatenate(
            [zeros_h, zeros_h, np.asarray(g["hn"]["bias"])])
        flat["recurrent"] = np.array(True)
        # distribution head emitting [mu, log_std] (the sample-factory
        # adaptive-stddev convention NumpyRecurrentPolicy expects); our
        # log_std is a state-independent parameter -> zero weight rows
        mean_head = dense[f"Dense_{len(hidden)}"]
        mu_W = np.asarray(mean_head["kernel"])          # (H, A)
        flat["head_W"] = np.concatenate(
            [mu_W, np.zeros_like(mu_W)], axis=1)        # (H, 2A)
        flat["head_b"] = np.concatenate(
            [np.asarray(mean_head["bias"]), np.asarray(dense["log_std"])])
        # self-describing archive: the runner never has to guess the mu
        # width from the head shape
        flat["action_dim"] = np.array(act_dim)
    else:
        net = ActorCritic(action_dim=act_dim, hidden=hidden,
                          activation=activation)
        skeleton = net.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
        params = serialization.from_bytes(skeleton, blob["params"])
        dense = params["params"]
        n_layers = len(hidden) + 1
        for i in range(n_layers):  # actor stack: Dense_0 .. Dense_{n}
            layer = dense[f"Dense_{i}"]
            flat[f"W{i}"] = np.asarray(layer["kernel"])
            flat[f"b{i}"] = np.asarray(layer["bias"])
        flat["log_std"] = np.asarray(dense["log_std"])
    np.savez(npz_path, **flat)
    return npz_path


def load_policy_npz(npz_path: str, num_envs: int = 1,
                    action_dim: Optional[int] = None):
    """Open an exported/imported .npz policy with the right runner class:
    :class:`NumpyRecurrentPolicy` if the archive is recurrent,
    :class:`NumpyPolicy` otherwise. Both are callable obs -> action.

    action_dim disambiguates imported sample-factory checkpoints whose
    head emits mu only (adaptive_stddev=False) — an even head width is
    otherwise assumed to be the [mu, log_std] convention.
    """
    with np.load(npz_path, allow_pickle=True) as z:
        recurrent = "recurrent" in z.files and bool(z["recurrent"])
        gru_style = "n_enc" in z.files
    if recurrent or gru_style:
        from .torch_import import NumpyRecurrentPolicy
        return NumpyRecurrentPolicy(npz_path, num_envs=num_envs,
                                    action_dim=action_dim)
    return NumpyPolicy(npz_path)


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
