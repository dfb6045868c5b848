"""Import trained reference-framework checkpoints (torch) for deployment.

Migration path for users switching from the reference framework: the
reference ships rl-games policy checkpoints
(reference examples/rl_games_example/networks/*.pth — actor MLP 256-128-64
+ mu head + sigma, loaded by rl_games_inference.py) and sample-factory
navigation checkpoints (reference examples/dce_rl_navigation/
selected_network/checkpoint_p0/*.pth and sim2real/weights/* — obs
normalizer + MLP encoder + GRU core + action head, loaded by
sim2real/nn_inference_class.py:27-110). These functions convert either
format ONCE (torch needed only at conversion time) into flat ``.npz``
archives that run with numpy alone on the robot:

- :func:`import_rl_games_policy` → the same archive layout
  :class:`~aerial_gym_simulator_tpu.sim2real.numpy_policy.NumpyPolicy`
  already consumes, so converted policies drive every surface that takes
  an ``.npz`` checkpoint (RL_Nav_Interface, ros_node, examples).
- :func:`import_sample_factory_policy` → a recurrent archive consumed by
  :class:`NumpyRecurrentPolicy` (numpy GRU core, matching torch.nn.GRU
  semantics).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils.logging import CustomLogger

logger = CustomLogger("torch_import")


from ..models.torch_vae_import import _t2n  # shared torch->numpy helper


def _load_state_dict(pth_path: str) -> dict:
    import torch

    blob = torch.load(pth_path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:
        return blob["model"]
    return blob


def import_rl_games_policy(pth_path: str, npz_path: str,
                           activation: str = "elu") -> str:
    """rl-games A2C checkpoint → NumpyPolicy-compatible .npz.

    Expects the reference's layout: ``a2c_network.actor_mlp.{0,2,4}.weight``
    (torch Linear, out x in), ``a2c_network.mu.{weight,bias}`` actor head,
    ``a2c_network.sigma`` log-std, optional
    ``running_mean_std.running_mean/var`` input normalizer.
    """
    sd = _load_state_dict(pth_path)
    layers = sorted(
        {int(k.split(".")[2]) for k in sd
         if k.startswith("a2c_network.actor_mlp.") and k.endswith(".weight")})
    if not layers:
        raise ValueError(f"{pth_path}: no a2c_network.actor_mlp layers found")

    flat = {"activation": np.array(activation)}
    for i, idx in enumerate(layers):
        flat[f"W{i}"] = _t2n(sd[f"a2c_network.actor_mlp.{idx}.weight"]).T
        flat[f"b{i}"] = _t2n(sd[f"a2c_network.actor_mlp.{idx}.bias"])
    n = len(layers)
    flat[f"W{n}"] = _t2n(sd["a2c_network.mu.weight"]).T
    flat[f"b{n}"] = _t2n(sd["a2c_network.mu.bias"])
    flat["log_std"] = (_t2n(sd["a2c_network.sigma"])
                       if "a2c_network.sigma" in sd
                       else np.zeros(flat[f"b{n}"].shape, np.float32))

    obs_dim = flat["W0"].shape[0]
    flat["obs_dim"] = np.array(obs_dim)
    if "running_mean_std.running_mean" in sd:
        flat["norm_mean"] = _t2n(sd["running_mean_std.running_mean"])
        flat["norm_var"] = _t2n(sd["running_mean_std.running_var"])
        flat["normalize_obs"] = np.array(True)
        flat["norm_eps"] = np.array(1e-5, np.float32)  # rl-games epsilon
    else:
        flat["norm_mean"] = np.zeros(obs_dim, np.float32)
        flat["norm_var"] = np.ones(obs_dim, np.float32)
        flat["normalize_obs"] = np.array(False)

    np.savez(npz_path, **flat)
    logger.info(f"imported rl-games policy {pth_path} -> {npz_path} "
                f"({n + 1} layers, obs {obs_dim}, act {flat[f'b{n}'].shape[0]})")
    return npz_path


_SF_PREFIXES = (
    "obs_normalizer.running_mean_std.running_mean_std.obs.",
    "obs_normalizer.running_mean_std.obs.",
)


def import_sample_factory_policy(pth_path: str, npz_path: str) -> str:
    """sample-factory actor-critic checkpoint → recurrent-policy .npz.

    Expects the reference's shipped layout: ``encoder.encoders.obs.
    mlp_head.{0,2,4}`` (ELU MLP), ``core.core.*_l0`` (single-layer GRU) and
    ``action_parameterization.distribution_linear`` emitting
    ``[mu, log_std]`` concatenated (sample-factory continuous actions with
    adaptive stddev). Feed-forward checkpoints (no ``core.core``) import
    with an identity core.
    """
    sd = _load_state_dict(pth_path)
    flat = {}

    # obs normalizer (either nesting depth seen in shipped checkpoints)
    flat["normalize_obs"] = np.array(False)
    for p in _SF_PREFIXES:
        if p + "running_mean" in sd:
            flat["norm_mean"] = _t2n(sd[p + "running_mean"])
            flat["norm_var"] = _t2n(sd[p + "running_var"])
            flat["normalize_obs"] = np.array(True)
            break

    enc_layers = sorted(
        {int(k.split("mlp_head.")[1].split(".")[0]) for k in sd
         if "encoder.encoders.obs.mlp_head." in k and k.endswith(".weight")})
    if not enc_layers:
        raise ValueError(f"{pth_path}: no encoder.encoders.obs.mlp_head "
                         f"layers found")
    for i, idx in enumerate(enc_layers):
        key = f"encoder.encoders.obs.mlp_head.{idx}"
        flat[f"enc_W{i}"] = _t2n(sd[key + ".weight"]).T
        flat[f"enc_b{i}"] = _t2n(sd[key + ".bias"])
    flat["n_enc"] = np.array(len(enc_layers))

    if "core.core.weight_ih_l0" in sd:
        flat["gru_Wih"] = _t2n(sd["core.core.weight_ih_l0"])   # (3H, in)
        flat["gru_Whh"] = _t2n(sd["core.core.weight_hh_l0"])   # (3H, H)
        flat["gru_bih"] = _t2n(sd["core.core.bias_ih_l0"])
        flat["gru_bhh"] = _t2n(sd["core.core.bias_hh_l0"])
        flat["recurrent"] = np.array(True)
    else:
        flat["recurrent"] = np.array(False)

    flat["head_W"] = _t2n(
        sd["action_parameterization.distribution_linear.weight"]).T
    flat["head_b"] = _t2n(
        sd["action_parameterization.distribution_linear.bias"])

    if "norm_mean" not in flat:
        obs_dim = flat["enc_W0"].shape[0]
        flat["norm_mean"] = np.zeros(obs_dim, np.float32)
        flat["norm_var"] = np.ones(obs_dim, np.float32)
    flat["obs_dim"] = np.array(flat["enc_W0"].shape[0])

    np.savez(npz_path, **flat)
    logger.info(
        f"imported sample-factory policy {pth_path} -> {npz_path} "
        f"(obs {int(flat['obs_dim'])}, recurrent "
        f"{bool(flat['recurrent'])}, head {flat['head_b'].shape[0]})")
    return npz_path


def _sigmoid(x):
    # sign-split stable form: exp only ever sees non-positive arguments, so
    # large-|x| inputs saturate without the overflow RuntimeWarning the
    # naive 1/(1+exp(-x)) emits (same safe-math rule as utils.math
    # safe_sqrt/safe_norm, applied to the deployment path)
    e = np.exp(-np.abs(x))
    return np.where(x >= 0, 1.0 / (1.0 + e), e / (1.0 + e))


class NumpyRecurrentPolicy:
    """Numpy inference for imported sample-factory policies.

    Carries one GRU hidden state per env; ``reset(env_ids)`` zeroes states
    exactly like the reference's inference class zeroes its RNN states
    (reference sim2real/nn_inference_class.py reset semantics).
    Deterministic action = the mu half of the distribution output.
    """

    def __init__(self, npz_path: str, num_envs: int = 1,
                 action_dim: Optional[int] = None):
        with np.load(npz_path, allow_pickle=True) as z:
            self.z = {k: z[k] for k in z.files}
        self.num_envs = num_envs
        # imported sample-factory archives predate these keys: their
        # normalizer epsilon is 1e-5 (sample-factory's) and encoder is ELU;
        # archives exported from our own GRU checkpoints carry both
        from .numpy_policy import _ACT
        self.act = _ACT[str(self.z.get("activation", "elu"))]
        self.norm_eps = float(self.z.get("norm_eps", 1e-5))
        self.recurrent = bool(self.z["recurrent"])
        self.hidden_dim = (self.z["gru_Whh"].shape[1] if self.recurrent
                           else 0)
        self.hidden = np.zeros((num_envs, self.hidden_dim), np.float32)
        # mu width, by trust order: (1) a self-describing archive key
        # (archives exported from our own GRU checkpoints carry it — and
        # it wins over a conflicting caller value, which would silently
        # feed log_std columns to the motors); (2) the caller's
        # action_dim (needed for imported sample-factory checkpoints with
        # adaptive_stddev=False and an even action count); (3) the
        # adaptive-stddev heuristic: even head width = [mu, log_std].
        head_out = self.z["head_b"].shape[0]
        if "action_dim" in self.z:
            self.action_dim = int(self.z["action_dim"])
            if action_dim is not None and action_dim != self.action_dim:
                logger.warning(
                    f"requested action_dim {action_dim} != archive's "
                    f"{self.action_dim}; using the archive's")
        elif action_dim is not None:
            self.action_dim = action_dim
        else:
            self.action_dim = head_out // 2 if head_out % 2 == 0 else head_out
            logger.info(
                f"inferred action_dim={self.action_dim} from head width "
                f"{head_out} (pass action_dim= to override for "
                f"non-adaptive-stddev checkpoints)")

    def reset(self, env_ids=None):
        if not self.recurrent:
            return
        if env_ids is None:
            self.hidden[:] = 0.0
        else:
            self.hidden[np.asarray(env_ids)] = 0.0

    def _gru_step(self, x: np.ndarray) -> np.ndarray:
        """torch.nn.GRU cell semantics (gates ordered r, z, n)."""
        z = self.z
        h = self.hidden
        gi = x @ z["gru_Wih"].T + z["gru_bih"]
        gh = h @ z["gru_Whh"].T + z["gru_bhh"]
        H = self.hidden_dim
        r = _sigmoid(gi[:, :H] + gh[:, :H])
        u = _sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
        n = np.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        self.hidden = (1.0 - u) * n + u * h
        return self.hidden

    def __call__(self, obs: np.ndarray) -> np.ndarray:
        z = self.z
        x = np.asarray(obs, np.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        if self.recurrent and x.shape[0] != self.num_envs:
            # numpy broadcasting would silently smear one observation's GRU
            # update over every env's hidden row — refuse instead
            raise ValueError(
                f"obs batch {x.shape[0]} != num_envs {self.num_envs}: a "
                f"recurrent policy carries one hidden state per env "
                f"(construct with num_envs={x.shape[0]}, or batch all envs' "
                f"observations per call)")
        if bool(z["normalize_obs"]):
            x = (x - z["norm_mean"]) / np.sqrt(z["norm_var"] + self.norm_eps)
            x = np.clip(x, -5.0, 5.0)
        for i in range(int(z["n_enc"])):
            x = self.act(x @ z[f"enc_W{i}"] + z[f"enc_b{i}"])
        if self.recurrent:
            x = self._gru_step(x)
        out = x @ z["head_W"] + z["head_b"]
        mu = out[:, :self.action_dim]
        return mu[0] if squeeze else mu
