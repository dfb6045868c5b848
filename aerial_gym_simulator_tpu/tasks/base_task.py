"""BaseTask — RL-facing gym-style API (reference task/base_task.py).

Tasks own reward functions, observation packing, episode bookkeeping and the
curriculum; unlike the reference they compose the ENTIRE step (sim substeps +
reward + termination + masked auto-reset + obs) into one jitted, donated
function, so an RL iteration is a single TPU program launch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np


class BaseTask:
    def __init__(self, task_config):
        self.task_config = task_config
        seed = getattr(task_config, "seed", 0)
        if seed == -1:
            seed = np.random.randint(0, 2**31 - 1)
        self.seed(seed)

    def seed(self, seed: int):
        self._seed = int(seed)
        np.random.seed(self._seed)
        return self._seed

    # gym-style API ---------------------------------------------------------
    def reset(self):
        raise NotImplementedError

    def reset_idx(self, env_ids):
        raise NotImplementedError

    def step(self, actions):
        raise NotImplementedError

    def render(self):
        return None

    def close(self):
        pass
