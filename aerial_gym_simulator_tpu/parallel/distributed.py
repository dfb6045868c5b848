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
                         process_id: Optional[int] = None,
                         require: bool = False):
    """jax.distributed.initialize with TPU-pod auto-detection.

    MUST run before the first backend use (importing this package does not
    initialize the backend; creating any device array does). On Cloud TPU
    pods all arguments are discovered from the environment; pass them
    explicitly for other clusters.

    require=False tolerates exactly one failure mode — no coordinator
    configured at all (plain single-host run). Any failure while a
    coordinator IS configured (or require=True) re-raises: silently
    degrading a pod launch to N identical single-host runs is worse than
    crashing.
    """
    if coordinator_address is None and "COORDINATOR_ADDRESS" in os.environ:
        coordinator_address = os.environ["COORDINATOR_ADDRESS"]
    configured = require or coordinator_address is not None or any(
        k in os.environ for k in ("JAX_COORDINATOR_ADDRESS",
                                  "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        logger.info(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global "
            f"devices")
    except Exception as e:
        if configured:
            raise
        logger.warning(f"jax.distributed.initialize skipped "
                       f"(no coordinator configured): {e}")


def shard_trainer(trainer, n_devices: Optional[int] = None):
    """Place a PPOTrainer's rollout state on the env-sharded mesh and its
    learner state replicated — the one-call scale-out for rl/ppo.py.

    Works on any device count (including the virtual CPU mesh); per-env
    PRNG keys make the sharded resets reproducible regardless of topology.
    """
    m = meshlib.make_mesh(n_devices)
    n_envs = trainer.cfg.num_envs
    trainer.env_carry = meshlib.shard_env_pytree(trainer.env_carry, m, n_envs)
    trainer.obs = meshlib.shard_env_pytree(trainer.obs, m, n_envs)
    trainer.train_state = meshlib.replicate_pytree(trainer.train_state, m)
    trainer.norm = meshlib.replicate_pytree(trainer.norm, m)
    # commit the PRNG key to the mesh too — otherwise a restore
    # (rl/ppo.py restore_training_state) commits it to a single device and
    # the jitted train step sees mixed device sets
    trainer.key = meshlib.replicate_pytree(trainer.key, m)
    logger.info(f"trainer sharded over {len(m.devices.flatten())} devices "
                f"(env axis)")
    return m


def shard_bptt_trainer(trainer, n_devices: Optional[int] = None):
    """Same one-call scale-out for the first-order trainer (rl/bptt.py):
    env carry + obs sharded over the env axis, policy params + optimizer
    state replicated. XLA inserts the gradient all-reduce across the mesh
    exactly as for PPO — backprop-through-simulator scales unchanged."""
    m = meshlib.make_mesh(n_devices)
    n_envs = trainer.cfg.num_envs
    trainer.carry = meshlib.shard_env_pytree(trainer.carry, m, n_envs)
    trainer.obs = meshlib.shard_env_pytree(trainer.obs, m, n_envs)
    trainer.params = meshlib.replicate_pytree(trainer.params, m)
    trainer.opt_state = meshlib.replicate_pytree(trainer.opt_state, m)
    logger.info(f"bptt trainer sharded over {len(m.devices.flatten())} "
                f"devices (env axis)")
    return m
