"""Multi-host initialization + sharded-training helpers.

Reference analog: the rl-games/CleanRL horovod/NCCL flags
(rl_training/rl_games/runner.py:260-265) — replaced by jax.distributed +
one global mesh. Call :func:`initialize_multihost` once at process start on
every host of the slice; afterwards ``jax.devices()`` spans the whole slice
and the env-axis mesh from parallel/mesh.py scales unchanged (gradient
all-reduce rides ICI via the sharding annotations, no NCCL analog needed).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..utils.logging import CustomLogger
from . import mesh as meshlib

logger = CustomLogger("distributed")


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """jax.distributed.initialize with TPU-pod auto-detection.

    On Cloud TPU pods all arguments are discovered from the environment;
    pass them explicitly for other clusters. Safe to call on single-host
    setups (no-op when JAX already sees only local devices and no
    coordinator is configured).
    """
    if coordinator_address is None and "COORDINATOR_ADDRESS" in os.environ:
        coordinator_address = os.environ["COORDINATOR_ADDRESS"]
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        logger.info(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global "
            f"devices")
    except Exception as e:
        logger.warning(f"jax.distributed.initialize skipped: {e}")


def shard_trainer(trainer, n_devices: Optional[int] = None):
    """Place a PPOTrainer's rollout state on the env-sharded mesh and its
    learner state replicated — the one-call scale-out for rl/ppo.py.

    Works on any device count (including the virtual CPU mesh); per-env
    PRNG keys make the sharded resets reproducible regardless of topology.
    """
    m = meshlib.make_mesh(n_devices)
    trainer.env_carry = meshlib.shard_env_pytree(trainer.env_carry, m)
    trainer.obs = meshlib.shard_env_pytree(trainer.obs, m)
    trainer.train_state = meshlib.replicate_pytree(trainer.train_state, m)
    trainer.norm = meshlib.replicate_pytree(trainer.norm, m)
    logger.info(f"trainer sharded over {len(m.devices.flatten())} devices "
                f"(env axis)")
    return m
