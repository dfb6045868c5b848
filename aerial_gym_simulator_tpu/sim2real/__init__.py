"""Deployment utilities (reference aerial_gym/sim2real/).

Checkpoint -> onboard inference chain:

  1. train with the fused PPO learner (rl/ppo.py), save a checkpoint
  2. ``export_policy_npz`` converts it to a plain .npz (no JAX/flax needed
     on the robot)
  3. ``NumpyPolicy`` / ``Sim2RealInferenceClass`` run the policy with
     numpy only; ``RL_Nav_Interface`` matches the reference's interface
     (sample_factory_inference.py:98-110)
  4. ``ros_node`` streams odometry -> observation -> action when rospy is
     available (reference sample_factory_ros_node.py)
  5. alternatively ``convert_model_to_script_model`` re-packs the .npz into
     a scripted TorchScript .pt for LibTorch-only onboard stacks (reference
     end_to_end_training/deployment/convert_model.py)

Migration from the reference framework: ``import_rl_games_policy`` /
``import_sample_factory_policy`` convert the reference's shipped torch
checkpoints (rl-games actor MLPs, sample-factory GRU navigation policies)
into the same numpy-only deployment formats (torch needed once, at
conversion time). ``NumpyRecurrentPolicy`` runs the recurrent ones.
"""

from .numpy_policy import NumpyPolicy, export_policy_npz, load_policy_npz
from .nn_inference_class import Sim2RealInferenceClass
from .sample_factory_inference import RL_Nav_Interface
from .torch_import import (NumpyRecurrentPolicy, import_rl_games_policy,
                           import_sample_factory_policy)


def __getattr__(name):
    # lazy: torch_export imports torch at module scope; keep the numpy-only
    # onboard import path (`from ...sim2real import NumpyPolicy`) free of
    # torch initialization
    if name == "convert_model_to_script_model":
        from .torch_export import convert_model_to_script_model
        return convert_model_to_script_model
    raise AttributeError(name)


__all__ = [
    "NumpyPolicy",
    "export_policy_npz",
    "load_policy_npz",
    "Sim2RealInferenceClass",
    "RL_Nav_Interface",
    "NumpyRecurrentPolicy",
    "import_rl_games_policy",
    "import_sample_factory_policy",
    "convert_model_to_script_model",
]
