"""rl-games checkpoint inference wrapper (reference
examples/rl_games_example/rl_games_inference.py).

The reference's ``MLP`` rebuilds the rl-games actor trunk in torch and
strictly loads a cleaned state dict. Here the checkpoint is converted once
to the framework's numpy deployment format (sim2real/torch_import.py) and
run with pure numpy — the same artifact that flies on embedded hardware,
so the example exercises the actual deployment path.
"""

import os
import tempfile

import numpy as np

from aerial_gym_simulator_tpu.sim2real import (NumpyPolicy,
                                               import_rl_games_policy)


class MLP:
    """Same constructor signature as the reference MLP(input_dim,
    output_dim, path); callable on numpy or jax arrays, returns actions."""

    def __init__(self, input_dim: int, output_dim: int, path: str):
        npz = os.path.join(tempfile.gettempdir(),
                           os.path.basename(path) + ".npz")
        import_rl_games_policy(path, npz)
        self.policy = NumpyPolicy(npz)
        got_in = self.policy.layers[0][0].shape[0]
        got_out = self.policy.action_dim
        if got_in != input_dim or got_out != output_dim:
            raise ValueError(
                f"{path}: network is {got_in}->{got_out}, task expects "
                f"{input_dim}->{output_dim}")

    def forward(self, x):
        return self.policy(np.asarray(x, np.float32))

    __call__ = forward

    def eval(self):  # torch-API parity no-op
        return self

    def to(self, device):  # torch-API parity no-op
        return self
