"""Training-metrics writer: TensorBoard + JSONL from a jitted metrics pytree.

Reference analog (SURVEY §5.5): the reference feeds TensorBoard
``SummaryWriter`` / wandb from its RL scripts
(reference rl_training/cleanrl/ppo_continuous_action.py:327-343,
rl_games runner.py:335-345 ``--track`` with sync_tensorboard).
Here one writer serves every training surface: scalars come out of the
jitted train step as a small metrics pytree, are pulled to host once per
logging interval, and are fanned out to

- TensorBoard event files (via ``torch.utils.tensorboard`` when torch is
  available — it is in the baked image; skipped gracefully otherwise),
- a ``metrics.jsonl`` file (one JSON object per line; trivially parseable
  for plots/regression checks without TensorBoard),
- optional wandb if the caller has it configured (``track="wandb"``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping, Optional

from .logging import CustomLogger

logger = CustomLogger("metrics")


class MetricsWriter:
    """Fan-out scalar writer. Safe to construct anywhere: all backends are
    optional and failures degrade to JSONL-only (which always works)."""

    def __init__(self, logdir: Optional[str], run_name: str = "run",
                 track: Optional[str] = None):
        self.logdir = logdir
        self._tb = None
        self._jsonl = None
        self._wandb = None
        if logdir is not None:
            os.makedirs(logdir, exist_ok=True)
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a",
                               buffering=1)
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=logdir)
            except Exception as e:
                logger.warning(f"tensorboard writer unavailable ({e}); "
                               f"metrics.jsonl only")
        # wandb streams independently of logdir (--track without --logdir
        # is a valid configuration)
        if track == "wandb":
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project="aerial_gym_tpu", name=run_name,
                           dir=logdir)
            except Exception as e:
                logger.warning(f"wandb unavailable ({e})")
        self._t0 = time.time()

    @property
    def enabled(self) -> bool:
        return (self._jsonl is not None or self._tb is not None
                or self._wandb is not None)

    def write(self, step: int, metrics: Mapping[str, float]):
        if not self.enabled:
            return
        scalars = {k: float(v) for k, v in metrics.items()}
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"step": int(step), **scalars})
                              + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, int(step))
        if self._wandb is not None:
            self._wandb.log(scalars, step=int(step))

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
