"""Per-env deterministic PRNG machinery.

The reference randomizes at ~10 distinct points using global torch RNG
(SURVEY.md section 5.3). Here every environment owns its own counter-based
key stream so that resets/disturbances are reproducible regardless of how
envs are sharded across chips or hosts: env i draws from
``fold_in(fold_in(base_key, i), counter)``, which is invariant to batch
layout and device topology.

All helpers are batched and jit-friendly: keys are a (num_envs, 2) uint32
array, draws are plain batched jax.random calls keyed per env via vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_env_keys(seed: int, num_envs: int) -> jax.Array:
    """Create independent per-env keys: (num_envs, 2) uint32."""
    base = jax.random.PRNGKey(seed)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        base, jnp.arange(num_envs, dtype=jnp.uint32)
    )
    return keys


def split_env_keys(keys: jax.Array):
    """Advance every env's key stream; returns (new_keys, subkeys)."""
    pairs = jax.vmap(jax.random.split)(keys)  # (N, 2, 2)
    return pairs[:, 0], pairs[:, 1]


def env_uniform(subkeys: jax.Array, lo, hi, shape_per_env=()):
    """Per-env uniform draw in [lo, hi); lo/hi broadcast over (N, *shape)."""
    def draw(k):
        return jax.random.uniform(k, shape_per_env, dtype=jnp.float32)
    u = jax.vmap(draw)(subkeys)
    return lo + (hi - lo) * u


def env_normal(subkeys: jax.Array, shape_per_env=()):
    def draw(k):
        return jax.random.normal(k, shape_per_env, dtype=jnp.float32)
    return jax.vmap(draw)(subkeys)


def env_bernoulli(subkeys: jax.Array, p):
    def draw(k):
        return jax.random.uniform(k, (), dtype=jnp.float32)
    u = jax.vmap(draw)(subkeys)
    return (u < p).astype(jnp.float32)
