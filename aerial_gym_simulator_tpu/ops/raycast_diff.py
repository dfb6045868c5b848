"""Differentiable ray-cast depth: Pallas forward, analytic-oracle backward.

The Pallas TPU kernel (ops/raycast_pallas.py) is not differentiable, but
the plain-JAX oracle (ops/raycast.py) computes the SAME ranges and is —
the two are kept in lockstep by tests/test_raycast_pallas.py. This module
fuses them with `jax.custom_vjp`: the forward pass runs at kernel speed on
TPU while reverse-mode AD evaluates the oracle's analytic VJP.

Gradients flow to the POSES — obstacle positions/orientations and the
sensor origin/orientation; scene geometry tables and the ray table get
zero tangents. Range is smooth in pose except on silhouette edges
(measure zero), the standard caveat of depth-based differentiable
rendering.

Enables inverse rendering (recover obstacle poses from a target depth
image, tests/test_raycast_diff.py) and perception-aware gradient methods —
capabilities the reference's Warp+BVH renderer does not expose (its
`wp.mesh_query_ray` has no adjoint wired to the simulator state).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import quat_rotate
from . import raycast
from . import raycast_pallas as rp


def _oracle_depth(scene, obstacle_pos, obstacle_quat, origin, quat, dirs,
                  max_range):
    rd_world = quat_rotate(quat[:, None, :], dirs[None, :, :])
    t, _ = raycast.raycast_batched(scene, obstacle_pos, obstacle_quat,
                                   origin, rd_world, max_range)
    return t


def _forward(scene, obstacle_pos, obstacle_quat, origin, quat, dirs,
             max_range, mode):
    if mode == "auto":
        mode = "pallas" if jax.default_backend() == "tpu" else "oracle"
    if mode in ("pallas", "interpret"):
        prims = rp.pack_prims_world(scene, obstacle_pos, obstacle_quat)
        ones = jnp.ones((dirs.shape[0],), jnp.float32)
        t, _ = rp.raycast_pallas(rp.pack_pose(origin, quat), prims, dirs,
                                 ones, scene.n_box, scene.n_cyl, scene.n_sph,
                                 float(max_range), want_seg=False,
                                 interpret=(mode == "interpret"),
                                 n_tri=scene.n_tri)
        return t
    return _oracle_depth(scene, obstacle_pos, obstacle_quat, origin, quat,
                         dirs, max_range)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def raycast_depth_diff(scene, obstacle_pos, obstacle_quat, origin, quat,
                       dirs, max_range, mode="auto"):
    """Range image (N, R) with gradients w.r.t. the pose arguments.

    scene: SceneParams; obstacle_pos/quat (N, A, 3/4); origin (N, 3);
    quat (N, 4) sensor world pose; dirs (R, 3) sensor-frame ray table.
    mode: "auto" (pallas on TPU, oracle elsewhere), "pallas", "interpret"
    (pallas in interpreter — CPU testing), "oracle".
    """
    return _forward(scene, obstacle_pos, obstacle_quat, origin, quat, dirs,
                    max_range, mode)


def _zero_tangent(x):
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    # integer leaves (slots, kinds, semantics) take float0 tangents
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _fwd(scene, obstacle_pos, obstacle_quat, origin, quat, dirs, max_range,
         mode):
    out = _forward(scene, obstacle_pos, obstacle_quat, origin, quat, dirs,
                   max_range, mode)
    return out, (scene, obstacle_pos, obstacle_quat, origin, quat, dirs)


def _bwd(max_range, mode, res, g):
    scene, obstacle_pos, obstacle_quat, origin, quat, dirs = res
    _, vjp = jax.vjp(
        lambda op, oq, o, q: _oracle_depth(scene, op, oq, o, q, dirs,
                                           max_range),
        obstacle_pos, obstacle_quat, origin, quat)
    d_op, d_oq, d_o, d_q = vjp(g)
    d_scene = jax.tree_util.tree_map(_zero_tangent, scene)
    return d_scene, d_op, d_oq, d_o, d_q, jnp.zeros_like(dirs)


raycast_depth_diff.defvjp(_fwd, _bwd)
