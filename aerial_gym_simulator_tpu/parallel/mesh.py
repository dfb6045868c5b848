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


def put_sharded(value, sharding: NamedSharding):
    """device_put that also works when `sharding` spans other PROCESSES.

    Single-process meshes take the fast jax.device_put path. On a
    multi-process mesh a committed process-local array cannot be
    device_put onto non-addressable devices; every process holds the same
    full value (same seeds everywhere), so each builds its addressable
    shards from the host copy (jax.make_array_from_callback — the
    standard multi-host array construction)."""
    if sharding.is_fully_addressable:
        return jax.device_put(value, sharding)
    if isinstance(value, jax.Array) and value.sharding == sharding:
        # already laid out globally as requested (e.g. shard_env_pytree
        # applied to an already-sharded tree) — np.asarray would raise on
        # a non-addressable global array, and there is nothing to move
        return value
    host = np.asarray(value)
    return jax.make_array_from_callback(host.shape, sharding,
                                        lambda idx: host[idx])


def shard_env_pytree(tree, mesh: Mesh, num_envs: Optional[int] = None):
    """Shard env-batched leaves over the env axis; replicate the rest.

    A leaf is env-batched when its leading dim equals `num_envs` (inferred
    as the most common leading dim when not given). Scalar aggregates,
    PRNG keys and other non-batched state (e.g. NavState.curriculum_level)
    are replicated — splitting them across devices would be wrong.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    if num_envs is None:
        from collections import Counter
        dims = Counter(l.shape[0] for l in leaves
                       if hasattr(l, "shape") and len(l.shape) >= 1)
        if not dims:
            return replicate_pytree(tree, mesh)
        num_envs = dims.most_common(1)[0][0]
    sh = env_sharding(mesh)
    rep = replicated(mesh)

    def place(leaf):
        batched = (hasattr(leaf, "shape") and len(leaf.shape) >= 1
                   and leaf.shape[0] == num_envs)
        return put_sharded(leaf, sh if batched else rep)

    return jax.tree_util.tree_map(place, tree)


def replicate_pytree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda l: put_sharded(l, rep), tree)
