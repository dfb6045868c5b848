"""Device-mesh + sharding utilities (TPU scale-out layer).

The reference has no multi-device simulation (SURVEY.md section 2.3); its
only parallelism is the env batch on one GPU plus optional horovod gradient
all-reduce. Here scale-out is first-class and idiomatic:

  * one global 1-D mesh axis 'env' over all chips (ICI-adjacent),
  * SimState / observations / rollouts sharded on the leading env axis,
  * network params + optimizer state replicated,
  * jit + sharding annotations let XLA insert the psum for gradients
    (the all-reduce rides ICI; no NCCL/horovod analog needed).

Multi-host: call jax.distributed.initialize() before building the mesh;
jax.devices() then spans hosts and the same annotations scale unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


ENV_AXIS = "env"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis env sharding for state/obs/rollout pytrees."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_pytree(tree, mesh: Mesh):
    """Place every leaf with its leading axis sharded over the env axis."""
    sh = env_sharding(mesh)
    return jax.device_put(tree, sh)


def replicate_pytree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
