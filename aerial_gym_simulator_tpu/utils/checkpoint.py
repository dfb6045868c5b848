"""Full-simulator checkpoint/resume (SURVEY 5.4 build equivalent).

The reference never checkpoints simulator state (only RL-framework
checkpoints exist). Because this framework's env state is an explicit
pytree, exact checkpoint/resume is trivial and offered here: save/restore
any state pytree (SimState, NavState, PPO carries) to a single file. The
restore reproduces trajectories exactly — RNG keys are part of the state.
"""

from __future__ import annotations

import pickle
from typing import Any

import jax
import numpy as np

from .logging import CustomLogger

logger = CustomLogger("checkpoint")


def save_state(path: str, state: Any):
    """Serialize any pytree of arrays (host round trip, exact)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    host_leaves = [np.asarray(l) for l in jax.device_get(leaves)]
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef, "leaves": host_leaves}, f)
    logger.info(f"state checkpoint saved to {path}")


def load_state(path: str, like: Any = None) -> Any:
    """Restore a pytree; if `like` is given its structure is used (and
    validated) so the result can be donated into existing jitted steps."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    state = jax.tree_util.tree_unflatten(blob["treedef"],
                                         blob["leaves"])
    if like is not None:
        ref_leaves, ref_def = jax.tree_util.tree_flatten(like)
        got_leaves, got_def = jax.tree_util.tree_flatten(state)
        if str(ref_def) != str(got_def):
            raise ValueError("checkpoint structure does not match template")
        for r, g in zip(ref_leaves, got_leaves):
            if np.shape(r) != np.shape(g):
                raise ValueError(
                    f"checkpoint leaf shape {np.shape(g)} != {np.shape(r)}")
    return jax.tree_util.tree_map(lambda x: jax.numpy.asarray(x), state)
