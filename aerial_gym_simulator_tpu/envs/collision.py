"""Robot–obstacle contact proxy via signed-distance queries.

Replaces the PhysX contact pipeline for the only thing the reference consumes
from it: the net contact-force magnitude vs threshold test that drives
crash/reset (reference env_manager.py:358-362). The robot is its bounding
sphere; obstacles are primitive soups. Penetration depth -> stiff penalty
force magnitude.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim.structs import SimParams, SimState
from ..utils.math import quat_rotate_inverse

STIFFNESS = 1000.0  # N/m


def _sd_box(p, half):
    """Signed distance of point p (...,3) to an origin box with half-extents."""
    q = jnp.abs(p) - half
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def _sd_cylinder(p, r, h):
    """Z-aligned capped cylinder at origin; h = full length."""
    d_xy = jnp.linalg.norm(p[..., :2], axis=-1) - r
    d_z = jnp.abs(p[..., 2]) - 0.5 * h
    outside = jnp.linalg.norm(
        jnp.stack([jnp.maximum(d_xy, 0.0), jnp.maximum(d_z, 0.0)], axis=-1), axis=-1)
    inside = jnp.minimum(jnp.maximum(d_xy, d_z), 0.0)
    return outside + inside


def _sd_sphere(p, r):
    return jnp.linalg.norm(p, axis=-1) - r


def primitive_sdf(kind, size, p):
    """Dispatch on primitive kind array: 0 box, 1 cylinder, 2 sphere, -1 pad."""
    d_box = _sd_box(p, 0.5 * size)
    d_cyl = _sd_cylinder(p, size[..., 0], size[..., 1])
    d_sph = _sd_sphere(p, size[..., 0])
    d = jnp.where(kind == 0, d_box, jnp.where(kind == 1, d_cyl, d_sph))
    return jnp.where(kind < 0, 1e6, d)


def scene_sdf_point(params: SimParams, state: SimState, p_world: jax.Array):
    """Min signed distance from world points (N, 3) to each env's obstacles."""
    sc = params.scene
    # transform into each asset frame: (N, A, 3)
    rel = p_world[:, None, :] - state.obstacle_pos
    p_asset = quat_rotate_inverse(state.obstacle_quat, rel)
    # gather per-slot primitive tables: (N, A, P, ...)
    var = sc.env_asset_variant                       # (N, A)
    kind = sc.prim_kind[var]                         # (N, A, P)
    size = sc.prim_size[var]                         # (N, A, P, 3)
    ppos = sc.prim_pos[var]
    prot = sc.prim_rot[var]                          # (N, A, P, 3, 3)
    # point in primitive frame
    rel_p = p_asset[:, :, None, :] - ppos
    local = jnp.einsum("napji,napj->napi", prot, rel_p)  # R^T @ rel
    d = primitive_sdf(kind, size, local)             # (N, A, P)
    return jnp.min(d, axis=(1, 2))


def obstacle_contact_forces(params: SimParams, state: SimState) -> jax.Array:
    """Penalty contact-force magnitude per env (robot bounding sphere)."""
    d = scene_sdf_point(params, state, state.pos)
    penetration = jnp.maximum(0.0, params.robot.collision_radius - d)
    return STIFFNESS * penetration
