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
from ..utils.math import quat_rotate_inverse, safe_norm, safe_sqrt

STIFFNESS = 1000.0  # N/m


def _sd_box(p, half):
    """Signed distance of point p (...,3) to an origin box with half-extents.

    safe_norm, not jnp.linalg.norm: inside the box max(q, 0) is exactly the
    zero vector, so a bare norm's backward pass is NaN precisely when the
    robot penetrates (crashes) — the case BPTT/sys-id through obstacle envs
    cares about (CLAUDE.md differentiability invariant).
    """
    q = jnp.abs(p) - half
    outside = safe_norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def _sd_cylinder(p, r, h):
    """Z-aligned capped cylinder at origin; h = full length."""
    d_xy = safe_norm(p[..., :2], axis=-1) - r
    d_z = jnp.abs(p[..., 2]) - 0.5 * h
    outside = safe_norm(
        jnp.stack([jnp.maximum(d_xy, 0.0), jnp.maximum(d_z, 0.0)], axis=-1), axis=-1)
    inside = jnp.minimum(jnp.maximum(d_xy, d_z), 0.0)
    return outside + inside


def _sd_sphere(p, r):
    return safe_norm(p, axis=-1) - r


def _sd_triangle(p, size):
    """UNSIGNED distance to a triangle in its own frame (z = 0 plane,
    vertices (0,0), (a,0), (b,c) = assets/mesh.py encoding). Mesh obstacles
    are surfaces, so contact fires on surface proximity — the same
    observable the reference gets from PhysX mesh contacts (binary
    force-threshold crash test, env_manager.py:358-362)."""
    a, b, c = size[..., 0], size[..., 1], size[..., 2]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    # closest point in the triangle's plane: clamp barycentric coords of the
    # projection, then resolve against each edge segment
    zeros = jnp.zeros_like(a)

    def seg_dist2(px, py, ax_, ay, bx, by):
        dx_, dy_ = bx - ax_, by - ay
        tt = jnp.clip(((px - ax_) * dx_ + (py - ay) * dy_)
                      / jnp.maximum(dx_ * dx_ + dy_ * dy_, 1e-12), 0.0, 1.0)
        cx, cy = ax_ + tt * dx_, ay + tt * dy_
        return (px - cx) ** 2 + (py - cy) ** 2

    # inside test (2D barycentric)
    v = y / jnp.maximum(c, 1e-12)
    u = (x - v * b) / jnp.maximum(a, 1e-12)
    inside = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    d_edge2 = jnp.minimum(
        jnp.minimum(seg_dist2(x, y, zeros, zeros, a, zeros),
                    seg_dist2(x, y, a, zeros, b, c)),
        seg_dist2(x, y, b, c, zeros, zeros))
    d2_plane = jnp.where(inside, 0.0, d_edge2)
    return safe_sqrt(d2_plane + z * z)


def primitive_sdf(kind, size, p):
    """Dispatch on kind array: 0 box, 1 cyl, 2 sphere, 3 triangle, -1 pad."""
    d_box = _sd_box(p, 0.5 * size)
    d_cyl = _sd_cylinder(p, size[..., 0], size[..., 1])
    d_sph = _sd_sphere(p, size[..., 0])
    d_tri = _sd_triangle(p, size)
    d = jnp.where(kind == 0, d_box,
                  jnp.where(kind == 1, d_cyl,
                            jnp.where(kind == 3, d_tri, d_sph)))
    return jnp.where(kind < 0, 1e6, d)


def scene_sdf_point(params: SimParams, state: SimState, p_world: jax.Array):
    """Min signed distance from world points (N, 3) to each env's obstacles.

    Uses the flattened per-env primitive soup (N, P): gather the owning
    asset's pose per primitive, transform the query point into the primitive
    frame, evaluate the SDF, min-reduce.
    """
    sc = params.scene
    slot = sc.env_prim_slot                                      # (N, P)
    # one-hot batched matmul instead of take_along_axis: TPU row gathers
    # of small rows are slow (~ms at training scale, profiled in the
    # render path) while the einsum is trivial MXU work; this runs every
    # physics substep
    A = state.obstacle_pos.shape[1]
    onehot = (slot[..., None] == jnp.arange(A)[None, None, :]).astype(
        state.obstacle_pos.dtype)                                # (N, P, A)
    a_pos = jnp.einsum("npa,nad->npd", onehot, state.obstacle_pos)
    a_quat = jnp.einsum("npa,nad->npd", onehot, state.obstacle_quat)
    rel = p_world[:, None, :] - a_pos                            # (N, P, 3)
    p_asset = quat_rotate_inverse(a_quat, rel)
    rel_p = p_asset - sc.env_prim_pos
    local = jnp.einsum("npji,npj->npi", sc.env_prim_rot, rel_p)  # R^T @ rel
    d = primitive_sdf(sc.env_prim_kind, sc.env_prim_size, local) # (N, P)
    return jnp.min(d, axis=1)


def obstacle_contact_forces(params: SimParams, state: SimState) -> jax.Array:
    """Penalty contact-force magnitude per env (robot bounding sphere)."""
    d = scene_sdf_point(params, state, state.pos)
    penetration = jnp.maximum(0.0, params.robot.collision_radius - d)
    return STIFFNESS * penetration
