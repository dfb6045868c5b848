"""TorchScript deployment export for onboard inference.

The reference ships a deployment converter that re-packs a trained policy
into a minimal scripted torch module for the robot's onboard computer
(rl_training/sample_factory/end_to_end_training/deployment/convert_model.py:10-62:
``ModelDeploy`` with a ``rescale_actions(min_u, max_u)`` helper,
``torch.jit.script`` + ``torch.jit.save``). This module is the equivalent
exit ramp from this framework: it consumes the flat .npz deployment archive
(sim2real/numpy_policy.py — the format both natively-trained and imported
checkpoints export to) and emits a self-contained TorchScript file that
needs only LibTorch/torch at run time, no JAX and no framework code.

Feed-forward archives become :class:`PolicyDeploy`; recurrent (GRU)
archives become :class:`RecurrentPolicyDeploy` with an explicit hidden
state in the forward signature (stateless module, scriptable).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:  # torch is only needed on the machine doing the conversion
    import torch
    from torch import nn
except Exception:  # pragma: no cover - exercised via import guard tests
    torch = None
    nn = None


def _require_torch():
    if torch is None:
        raise ImportError("torch is required for TorchScript export")


def _activation_module(name: str):
    table = {"elu": nn.ELU, "tanh": nn.Tanh, "relu": nn.ReLU}
    if name not in table:
        raise ValueError(f"unsupported activation {name!r}")
    return table[name]()


if torch is not None:

    class PolicyDeploy(nn.Module):
        """Minimal deployable actor (reference ModelDeploy,
        convert_model.py:10-40): observation normalization + MLP, plus the
        reference's ``rescale_actions`` mapping of a [-1, 1] policy output
        onto actuator limits (convert_model.py:29-33)."""

        def __init__(self, layers: Sequence, activation: str,
                     norm_mean, norm_var, norm_eps: float,
                     normalize_obs: bool, min_u, max_u):
            super().__init__()
            stack = []
            for i, (W, b) in enumerate(layers):
                lin = nn.Linear(W.shape[0], W.shape[1])
                with torch.no_grad():
                    lin.weight.copy_(torch.as_tensor(W.T))
                    lin.bias.copy_(torch.as_tensor(b))
                stack.append(lin)
                if i < len(layers) - 1:
                    stack.append(_activation_module(activation))
            self.control_stack = nn.ModuleList(stack)
            self.normalize_obs = normalize_obs
            self.norm_eps = float(norm_eps)
            self.register_buffer("norm_mean", torch.as_tensor(norm_mean))
            self.register_buffer("norm_var", torch.as_tensor(norm_var))
            self.register_buffer("min_u", torch.as_tensor(min_u))
            self.register_buffer("max_u", torch.as_tensor(max_u))

        @torch.jit.export
        def normalize(self, x: torch.Tensor) -> torch.Tensor:
            if self.normalize_obs:
                x = torch.clamp(
                    (x - self.norm_mean)
                    / torch.sqrt(self.norm_var + self.norm_eps), -5.0, 5.0)
            return x

        @torch.jit.export
        def rescale_actions(self, scaled_command_actions: torch.Tensor
                            ) -> torch.Tensor:
            # reference convert_model.py:29-33 (action 0 -> mid-range)
            return (scaled_command_actions * (self.max_u - self.min_u) / 2.0
                    + (self.max_u + self.min_u) / 2.0)

        def forward(self, x: torch.Tensor) -> torch.Tensor:
            x = self.normalize(x)
            for l_or_a in self.control_stack:
                x = l_or_a(x)
            return x

    class RecurrentPolicyDeploy(nn.Module):
        """Deployable GRU actor: encoder MLP -> GRUCell -> mu head. The
        hidden state is an explicit argument (zero it at episode starts),
        mirroring NumpyRecurrentPolicy's per-env reset semantics."""

        def __init__(self, enc_layers: Sequence, activation: str,
                     gru_Wih, gru_Whh, gru_bih, gru_bhh,
                     head_W, head_b, action_dim: int,
                     norm_mean, norm_var, norm_eps: float,
                     normalize_obs: bool, min_u, max_u):
            super().__init__()
            stack = []
            for W, b in enc_layers:
                lin = nn.Linear(W.shape[0], W.shape[1])
                with torch.no_grad():
                    lin.weight.copy_(torch.as_tensor(W.T))
                    lin.bias.copy_(torch.as_tensor(b))
                stack.append(lin)
                stack.append(_activation_module(activation))
            self.encoder = nn.ModuleList(stack)
            hidden_size = gru_Whh.shape[1]
            self.hidden_size = int(hidden_size)
            self.gru = nn.GRUCell(gru_Wih.shape[1], hidden_size)
            with torch.no_grad():
                self.gru.weight_ih.copy_(torch.as_tensor(gru_Wih))
                self.gru.weight_hh.copy_(torch.as_tensor(gru_Whh))
                self.gru.bias_ih.copy_(torch.as_tensor(gru_bih))
                self.gru.bias_hh.copy_(torch.as_tensor(gru_bhh))
            self.head = nn.Linear(head_W.shape[0], head_W.shape[1])
            with torch.no_grad():
                self.head.weight.copy_(torch.as_tensor(head_W.T))
                self.head.bias.copy_(torch.as_tensor(head_b))
            self.action_dim = int(action_dim)
            self.normalize_obs = normalize_obs
            self.norm_eps = float(norm_eps)
            self.register_buffer("norm_mean", torch.as_tensor(norm_mean))
            self.register_buffer("norm_var", torch.as_tensor(norm_var))
            self.register_buffer("min_u", torch.as_tensor(min_u))
            self.register_buffer("max_u", torch.as_tensor(max_u))

        @torch.jit.export
        def initial_state(self, batch: int) -> torch.Tensor:
            return torch.zeros(batch, self.hidden_size)

        @torch.jit.export
        def rescale_actions(self, scaled_command_actions: torch.Tensor
                            ) -> torch.Tensor:
            return (scaled_command_actions * (self.max_u - self.min_u) / 2.0
                    + (self.max_u + self.min_u) / 2.0)

        def forward(self, x: torch.Tensor, h: torch.Tensor):
            if self.normalize_obs:
                x = torch.clamp(
                    (x - self.norm_mean)
                    / torch.sqrt(self.norm_var + self.norm_eps), -5.0, 5.0)
            for l_or_a in self.encoder:
                x = l_or_a(x)
            h = self.gru(x, h)
            out = self.head(h)
            return out[:, :self.action_dim], h


def build_deploy_module(npz_path: str,
                        action_limit_min: Optional[Sequence[float]] = None,
                        action_limit_max: Optional[Sequence[float]] = None,
                        action_dim: Optional[int] = None):
    """Build the (unscripted) torch deployment module from a .npz archive.

    Accepts every archive layout the numpy runners accept: natively
    exported MLP/GRU (export_policy_npz), imported rl-games
    (import_rl_games_policy) and imported sample-factory archives —
    including feed-forward ones (recurrent=False with an enc_W*/head
    layout, run with an identity core by NumpyRecurrentPolicy) and
    mu-only heads (adaptive_stddev=False; pass action_dim to disambiguate,
    same contract as load_policy_npz).
    """
    _require_torch()
    data = np.load(npz_path, allow_pickle=True)
    # imported sample-factory archives carry no activation key; their
    # encoder nonlinearity is elu (torch_import.py archive convention)
    activation = (str(data["activation"]) if "activation" in data.files
                  else "elu")
    normalize_obs = bool(data["normalize_obs"])
    norm_mean = data["norm_mean"].astype(np.float32)
    norm_var = data["norm_var"].astype(np.float32)
    # normalizer epsilon is format-dependent (same rule as the numpy
    # runners): our exports carry norm_eps explicitly; imported
    # sample-factory archives (no key) use rl-games/sf's 1e-5
    norm_eps = (float(data["norm_eps"]) if "norm_eps" in data.files
                else 1e-5)
    gru_style = "n_enc" in data.files
    recurrent = gru_style and "gru_Wih" in data.files and (
        "recurrent" not in data.files or bool(data["recurrent"]))

    if gru_style:
        n_enc = int(data["n_enc"])
        enc = [(data[f"enc_W{i}"].astype(np.float32),
                data[f"enc_b{i}"].astype(np.float32)) for i in range(n_enc)]
        head_W = data["head_W"].astype(np.float32)
        head_b = data["head_b"].astype(np.float32)
        if "action_dim" in data.files:
            act_dim = int(data["action_dim"])
        elif action_dim is not None:
            act_dim = int(action_dim)
        else:  # [mu, log_std] convention: mu is the first half
            act_dim = head_W.shape[1] // 2
    else:
        layers = []
        i = 0
        while f"W{i}" in data:
            layers.append((data[f"W{i}"].astype(np.float32),
                           data[f"b{i}"].astype(np.float32)))
            i += 1
        act_dim = layers[-1][0].shape[1]

    if (action_limit_min is None) != (action_limit_max is None):
        raise ValueError("pass BOTH action_limit_min and action_limit_max "
                         "(or neither for the default [-1, 1] pass-through)")
    if action_limit_min is None:
        min_u = -np.ones(act_dim, np.float32)
        max_u = np.ones(act_dim, np.float32)
    else:
        min_u = np.asarray(action_limit_min, np.float32)
        max_u = np.asarray(action_limit_max, np.float32)

    if recurrent:
        return RecurrentPolicyDeploy(
            enc, activation,
            data["gru_Wih"].astype(np.float32),
            data["gru_Whh"].astype(np.float32),
            data["gru_bih"].astype(np.float32),
            data["gru_bhh"].astype(np.float32),
            head_W, head_b, act_dim,
            norm_mean, norm_var, norm_eps, normalize_obs, min_u, max_u)
    if gru_style:
        # feed-forward sample-factory archive (no GRU core): encoder MLP
        # straight into the mu head — the identity-core case
        # NumpyRecurrentPolicy handles at run time (torch_import.py)
        layers = enc + [(head_W[:, :act_dim], head_b[:act_dim])]
    return PolicyDeploy(layers, activation, norm_mean, norm_var, norm_eps,
                        normalize_obs, min_u, max_u)


def convert_model_to_script_model(
        npz_path: str, out_path: str,
        action_limit_min: Optional[Sequence[float]] = None,
        action_limit_max: Optional[Sequence[float]] = None,
        action_dim: Optional[int] = None) -> str:
    """npz deployment archive -> scripted .pt file (reference
    convert_model.py:42-62's ``torch.jit.script`` + ``torch.jit.save``).

    The saved module runs with nothing but (Lib)Torch:
    ``m = torch.jit.load(p); a = m(obs)`` (feed-forward) or
    ``a, h = m(obs, h)`` (recurrent), with ``m.rescale_actions(a)`` mapping
    [-1, 1] policy outputs onto the given actuator limits.
    """
    _require_torch()
    module = build_deploy_module(npz_path, action_limit_min,
                                 action_limit_max, action_dim)
    module.eval()
    scripted = torch.jit.script(module)
    torch.jit.save(scripted, out_path)
    return out_path
