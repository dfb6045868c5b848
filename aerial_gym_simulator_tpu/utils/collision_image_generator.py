"""Inflated-obstacle depth rendering for collision-label datasets.

Parity with reference utils/collision_image_generator.py:63-232, which
builds sphere-swept meshes of every obstacle (Minkowski sum with the robot's
bounding sphere) and re-raycasts them through Warp to produce "inflated
obstacle" depth labels. In the primitive-centric TPU renderer the sweep is
analytic: every primitive is grown by the inflation radius (boxes/cylinders
by the radius on each extent, spheres by the radius) and rendered with the
standard caster — no mesh construction step at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import raycast
from ..sensors.raycast_sensor import sensor_world_pose
from ..sim.structs import SimParams, SimState
from ..utils.math import quat_rotate


def inflate_scene(scene, radius: float):
    """Grow every primitive by `radius` (sphere-swept approximation; corners
    are slightly over-inflated for boxes, conservative for collision labels)."""
    size = scene.env_prim_size
    kind = scene.env_prim_kind[..., None]
    grow_box = size + 2.0 * radius
    grow_cyl = size.at[..., 0].add(radius).at[..., 1].add(2.0 * radius)
    grow_sph = size.at[..., 0].add(radius)
    new_size = jnp.where(kind == 0, grow_box,
                         jnp.where(kind == 1, grow_cyl, grow_sph))
    return scene.replace(env_prim_size=new_size)


def render_inflated_depth(params: SimParams, state: SimState,
                          inflation_radius: float = None,
                          use_camera: bool = True):
    """Depth image of the inflated scene — the per-pixel collision-distance
    label used for 'will the robot fit' training data.

    Returns (depth (N, H, W), seg (N, H, W)).
    """
    sp = params.camera if use_camera else params.lidar
    if sp is None:
        raise ValueError("no sensor configured on this robot")
    if inflation_radius is None:
        inflation_radius = float(params.robot.collision_radius)
    sc = inflate_scene(params.scene, inflation_radius)

    N = state.pos.shape[0]
    H, W = sp.height, sp.width
    R = H * W
    mount_pos = state.cam_mount_pos if use_camera else state.lidar_mount_pos
    mount_quat = state.cam_mount_quat if use_camera else state.lidar_mount_quat
    pos_w, quat_w = sensor_world_pose(sp, state, mount_pos, mount_quat)
    dirs_flat = sp.dirs.reshape(R, 3)
    rd_world = quat_rotate(quat_w[:, None, :], dirs_flat[None, :, :])
    t, sem = raycast.raycast_batched(sc, state.obstacle_pos,
                                     state.obstacle_quat, pos_w, rd_world,
                                     sp.max_range)
    mult = sp.depth_multiplier.reshape(R)
    depth = (t * mult[None, :]).reshape(N, H, W)
    return depth, sem.reshape(N, H, W)
