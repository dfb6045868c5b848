"""Analytic primitive ray casting — the TPU-native render core.

Replaces the reference's Warp CUDA kernels + BVH (`wp.mesh_query_ray` over a
unified per-env triangle mesh, sensors/warp/warp_kernels/*.py,
warp_env_manager.py:140-166). The TPU formulation is primitive-centric:
scenes are compact primitive soups (box/cylinder/sphere, ~50-100 per env),
and every ray intersects every primitive with a min-reduction — dense,
branch-free, embarrassingly parallel compute that XLA tiles onto the VPU,
instead of a divergence-heavy BVH traversal. Obstacle motion requires no
BVH refit: poses are inputs.

No-hit sentinels match the reference: NO_HIT_RAY_VAL = 1000.0, segmentation
-2 (warp_camera_kernels.py:3-4).

A Pallas kernel version (raycast_pallas.py) fuses the primitive loop in
VMEM; this module is the portable reference implementation and the
correctness oracle for it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.math import quat_rotate_inverse, safe_sqrt

NO_HIT_RAY_VAL = 1000.0
NO_HIT_SEGMENTATION_VAL = -2

_BIG = 1e10

# ---------------------------------------------------------------------------
# RGB shading constants (shared by the XLA-side oracle shade_rgb in
# sensors/raycast_sensor.py and the in-kernel Pallas shader in
# raycast_pallas.py — they must stay in lockstep). numpy constants only:
# importing the package must not touch the XLA backend.
# ---------------------------------------------------------------------------

import numpy as _np

# Albedo palette indexed by |segmentation id| % len (matches the offline
# viewer's colorization so onboard RGB and the spectator view agree).
SEG_ALBEDO = _np.array([
    [0.91, 0.30, 0.24], [0.18, 0.80, 0.44], [0.20, 0.60, 0.86],
    [0.95, 0.77, 0.06], [0.61, 0.35, 0.71], [0.10, 0.74, 0.61],
    [0.90, 0.49, 0.13], [0.52, 0.58, 0.65], [0.93, 0.94, 0.95],
    [0.75, 0.22, 0.17],
], _np.float32)

# overhead-ish sun, normalized at import time (numpy)
SUN_DIR = _np.array([0.35, -0.25, 0.90], _np.float32)
SUN_DIR /= _np.linalg.norm(SUN_DIR)
SKY_RGB = _np.array([0.70, 0.80, 0.92], _np.float32)
RGB_AMBIENT = 0.35


def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) < 1e-12, jnp.where(b < 0, -1e-12, 1e-12), b)


def ray_box(ro, rd, half):
    """Slab test. ro/rd (..., 3) in box frame, half (..., 3). Returns t>=0
    (entry, or exit if origin inside) or +inf."""
    inv = _safe_div(1.0, rd)
    t1 = (-half - ro) * inv
    t2 = (half - ro) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    t = jnp.where(tmin > 0.0, tmin, tmax)
    return jnp.where(hit & (t > 0.0), t, _BIG)


def ray_sphere(ro, rd, r):
    b = jnp.sum(ro * rd, axis=-1)
    c = jnp.sum(ro * ro, axis=-1) - r * r
    disc = b * b - c
    # safe_sqrt: sqrt(maximum(x, 0)) has a NaN gradient for every MISSING
    # ray (inf * 0 at the clamp) — which poisons the differentiable-render
    # backward (ops/raycast_diff.py) for all culled/missed primitives
    sq = safe_sqrt(disc)
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 0.0, t0, t1)
    return jnp.where((disc >= 0.0) & (t > 0.0), t, _BIG)


def ray_cylinder(ro, rd, r, h):
    """Capped z-aligned cylinder, full length h."""
    a = rd[..., 0] ** 2 + rd[..., 1] ** 2
    b = ro[..., 0] * rd[..., 0] + ro[..., 1] * rd[..., 1]
    c = ro[..., 0] ** 2 + ro[..., 1] ** 2 - r * r
    disc = b * b - a * c
    sq = safe_sqrt(disc)  # see ray_sphere: NaN-free backward for misses
    inv_a = _safe_div(1.0, a)
    ts0 = (-b - sq) * inv_a
    ts1 = (-b + sq) * inv_a
    half = 0.5 * h

    def side_valid(t):
        z = ro[..., 2] + t * rd[..., 2]
        return (disc >= 0.0) & (t > 0.0) & (jnp.abs(z) <= half) & (a > 1e-12)

    t_side0 = jnp.where(side_valid(ts0), ts0, _BIG)
    t_side1 = jnp.where(side_valid(ts1), ts1, _BIG)

    def cap(zc):
        t = _safe_div(zc - ro[..., 2], rd[..., 2])
        x = ro[..., 0] + t * rd[..., 0]
        y = ro[..., 1] + t * rd[..., 1]
        ok = (t > 0.0) & (x * x + y * y <= r * r) & (jnp.abs(rd[..., 2]) > 1e-12)
        return jnp.where(ok, t, _BIG)

    return jnp.minimum(jnp.minimum(t_side0, t_side1),
                       jnp.minimum(cap(half), cap(-half)))


def ray_triangle(ro, rd, size):
    """Triangle in its own frame: z = 0 plane, vertices (0,0), (a,0), (b,c)
    with (a, b, c) = size (assets/mesh.py triangles_to_frames encoding).
    Two-sided; returns t > 0 or +inf."""
    a, b, c = size[..., 0], size[..., 1], size[..., 2]
    t = _safe_div(-ro[..., 2], rd[..., 2])
    x = ro[..., 0] + t * rd[..., 0]
    y = ro[..., 1] + t * rd[..., 1]
    v = _safe_div(y, c)
    u = _safe_div(x - v * b, a)
    eps = 1e-6
    ok = ((t > 0.0) & (jnp.abs(rd[..., 2]) > 1e-9) & (u >= -eps)
          & (v >= -eps) & (u + v <= 1.0 + eps) & (a > 0.0))
    return jnp.where(ok, t, _BIG)


def ray_primitive(kind, size, ro, rd):
    """Dispatch: 0 box, 1 cylinder, 2 sphere, 3 triangle, -1 padding."""
    t_box = ray_box(ro, rd, 0.5 * size)
    t_cyl = ray_cylinder(ro, rd, size[..., 0], size[..., 1])
    t_sph = ray_sphere(ro, rd, size[..., 0])
    t_tri = ray_triangle(ro, rd, size)
    t = jnp.where(kind == 0, t_box,
                  jnp.where(kind == 1, t_cyl,
                            jnp.where(kind == 3, t_tri, t_sph)))
    return jnp.where(kind < 0, _BIG, t)


def raycast_env(
    prim_kind,      # (P,) int32
    prim_size,      # (P, 3)
    prim_pos,       # (P, 3) local offset in asset frame
    prim_rot,       # (P, 3, 3) local rotation in asset frame
    prim_sem,       # (P,) int32
    prim_slot,      # (P,) int32 asset-slot index
    asset_pos,      # (A, 3) world
    asset_quat,     # (A, 4)
    ro,             # (3,) world ray origin (shared per sensor)
    rd,             # (R, 3) world ray dirs
    max_range,
):
    """Cast R rays against one env's primitive soup.

    Returns (t (R,), semantic (R,)). Scans over primitives, carrying the
    running min — intermediates stay O(R), never O(R*P).
    """
    def body(carry, prim):
        t_best, sem_best = carry
        kind, size, ppos, prot, sem, slot = prim
        a_pos = asset_pos[slot]
        a_quat = asset_quat[slot]
        # world -> asset frame
        ro_a = quat_rotate_inverse(a_quat, ro - a_pos)
        rd_a = quat_rotate_inverse(a_quat[None, :], rd)
        # asset -> primitive frame (R^T (x - p))
        ro_p = prot.T @ (ro_a - ppos)
        rd_p = rd_a @ prot  # == (prot.T @ rd_a.T).T
        t = ray_primitive(kind, size, ro_p[None, :], rd_p)
        closer = t < t_best
        t_best = jnp.where(closer, t, t_best)
        sem_best = jnp.where(closer, sem, sem_best)
        return (t_best, sem_best), None

    R = rd.shape[0]
    t0 = jnp.full((R,), _BIG, jnp.float32)
    s0 = jnp.full((R,), NO_HIT_SEGMENTATION_VAL, jnp.int32)
    (t, sem), _ = jax.lax.scan(
        body, (t0, s0),
        (prim_kind, prim_size, prim_pos, prim_rot, prim_sem, prim_slot))
    miss = t >= jnp.minimum(max_range, _BIG * 0.5)
    t = jnp.where(miss, NO_HIT_RAY_VAL, t)
    sem = jnp.where(miss, NO_HIT_SEGMENTATION_VAL, sem)
    return t, sem


def raycast_batched(scene, obstacle_pos, obstacle_quat, ro, rd, max_range):
    """vmap raycast_env over envs.

    scene: SceneParams (flattened per-env arrays). ro (N, 3), rd (N, R, 3).
    Returns t (N, R), semantic (N, R).
    """
    return jax.vmap(
        lambda pk, psz, pp, pr, psem, psl, apos, aq, o, d: raycast_env(
            pk, psz, pp, pr, psem, psl, apos, aq, o, d, max_range)
    )(scene.env_prim_kind, scene.env_prim_size, scene.env_prim_pos,
      scene.env_prim_rot, scene.env_prim_semantic, scene.env_prim_slot,
      obstacle_pos, obstacle_quat, ro, rd)


# ---------------------------------------------------------------------------
# normal + face-id variant (reference NormalFaceID cameras/lidars,
# warp_camera_kernels.py:68-121: per-pixel surface normal + triangle face id
# for dataset generation; the primitive index is this renderer's face id)
# ---------------------------------------------------------------------------


def primitive_normal(kind, size, hit_p):
    """Surface normal at a point on the primitive, in the primitive frame."""
    half = 0.5 * size
    # box: dominant axis of |p|/half
    q = jnp.abs(hit_p) / jnp.maximum(half, 1e-9)
    axis = jnp.argmax(q, axis=-1)
    n_box = jnp.sign(hit_p) * jax.nn.one_hot(axis, 3, dtype=hit_p.dtype)
    # sphere: radial
    n_sph = hit_p / jnp.maximum(jnp.linalg.norm(hit_p, axis=-1, keepdims=True), 1e-9)
    # cylinder: side vs cap
    r, h = size[..., 0:1], size[..., 1:2]
    on_cap = jnp.abs(jnp.abs(hit_p[..., 2:3]) - 0.5 * h) < 1e-4
    side = jnp.concatenate([hit_p[..., 0:1], hit_p[..., 1:2],
                            jnp.zeros_like(hit_p[..., 2:3])], axis=-1)
    side = side / jnp.maximum(jnp.linalg.norm(side, axis=-1, keepdims=True), 1e-9)
    cap = jnp.concatenate([jnp.zeros_like(r), jnp.zeros_like(r),
                           jnp.sign(hit_p[..., 2:3])], axis=-1)
    n_cyl = jnp.where(on_cap, cap, side)
    # triangle: plane normal is +z in the triangle frame
    n_tri = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], hit_p.dtype), hit_p.shape)
    k = kind[..., None]
    return jnp.where(k == 0, n_box,
                     jnp.where(k == 1, n_cyl,
                               jnp.where(k == 3, n_tri, n_sph)))


def raycast_env_normals(prim_kind, prim_size, prim_pos, prim_rot, prim_sem,
                        prim_slot, asset_pos, asset_quat, ro, rd, max_range):
    """Like raycast_env, additionally returning the world-frame surface
    normal and the hit primitive index ("face id"). Returns
    (t (R,), sem (R,), normal (R, 3), face_id (R,))."""
    from ..utils.math import quat_rotate

    def body(carry, prim):
        t_best, sem_best, idx_best = carry
        idx, kind, size, ppos, prot, sem, slot = prim
        a_pos = asset_pos[slot]
        a_quat = asset_quat[slot]
        ro_a = quat_rotate_inverse(a_quat, ro - a_pos)
        rd_a = quat_rotate_inverse(a_quat[None, :], rd)
        ro_p = prot.T @ (ro_a - ppos)
        rd_p = rd_a @ prot
        t = ray_primitive(kind, size, ro_p[None, :], rd_p)
        closer = t < t_best
        t_best = jnp.where(closer, t, t_best)
        sem_best = jnp.where(closer, sem, sem_best)
        idx_best = jnp.where(closer, idx, idx_best)
        return (t_best, sem_best, idx_best), None

    R = rd.shape[0]
    P = prim_kind.shape[0]
    t0 = jnp.full((R,), _BIG, jnp.float32)
    s0 = jnp.full((R,), NO_HIT_SEGMENTATION_VAL, jnp.int32)
    i0 = jnp.full((R,), -1, jnp.int32)
    (t, sem, face), _ = jax.lax.scan(
        body, (t0, s0, i0),
        (jnp.arange(P, dtype=jnp.int32), prim_kind, prim_size, prim_pos,
         prim_rot, prim_sem, prim_slot))

    # normal of the winning primitive: gather prim data per ray, recompute
    # the hit point in the primitive frame
    fi = jnp.maximum(face, 0)
    kind = prim_kind[fi]
    size = prim_size[fi]
    ppos = prim_pos[fi]
    prot = prim_rot[fi]                  # (R, 3, 3)
    slot = prim_slot[fi]
    a_pos = asset_pos[slot]
    a_quat = asset_quat[slot]
    ro_a = quat_rotate_inverse(a_quat, ro[None, :] - a_pos)
    rd_a = quat_rotate_inverse(a_quat, rd)
    ro_p = jnp.einsum("rji,rj->ri", prot, ro_a - ppos)
    rd_p = jnp.einsum("rji,rj->ri", prot, rd_a)
    hit_p = ro_p + t[..., None] * rd_p
    n_p = primitive_normal(kind, size, hit_p)
    n_a = jnp.einsum("rij,rj->ri", prot, n_p)
    n_w = quat_rotate(a_quat, n_a)
    # orient against the ray and zero misses
    n_w = jnp.where(jnp.sum(n_w * rd, axis=-1, keepdims=True) > 0, -n_w, n_w)

    miss = t >= jnp.minimum(max_range, _BIG * 0.5)
    t = jnp.where(miss, NO_HIT_RAY_VAL, t)
    sem = jnp.where(miss, NO_HIT_SEGMENTATION_VAL, sem)
    face = jnp.where(miss, -1, face)
    n_w = jnp.where(miss[..., None], 0.0, n_w)
    return t, sem, n_w, face


def raycast_batched_normals(scene, obstacle_pos, obstacle_quat, ro, rd,
                            max_range):
    """vmap of the normal/face-id caster over envs."""
    return jax.vmap(
        lambda pk, psz, pp, pr, psem, psl, apos, aq, o, d: raycast_env_normals(
            pk, psz, pp, pr, psem, psl, apos, aq, o, d, max_range)
    )(scene.env_prim_kind, scene.env_prim_size, scene.env_prim_pos,
      scene.env_prim_rot, scene.env_prim_semantic, scene.env_prim_slot,
      obstacle_pos, obstacle_quat, ro, rd)
