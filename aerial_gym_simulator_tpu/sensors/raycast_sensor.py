"""Ray-cast sensor pipeline: pose composition, render, noise, normalization.

Functional equivalent of the reference's WarpSensor facade + WarpCam /
WarpLidar / WarpStereoCam (sensors/warp/): the CUDA-graph capture disappears
— the render is just another op inside the jitted step. Covers:

  * pinhole camera ray table from K^-1 (warp_cam.py:31-64),
  * spherical lidar ray table (warp_lidar.py:40-64),
  * sensor mounting randomization (warp_sensor.py:92-171),
  * world-pose composition per step (warp_sensor.py:177-187),
  * depth-vs-range projection, pointcloud modes, segmentation ids,
  * quadratic range-dependent gaussian noise + pixel dropout
    (warp_sensor.py:229-247), range clamping to out-of-range sentinels
    (:202-220), max-range normalization (:222-226),
  * stereo: right-eye render with baseline offset, min-disparity fusion
    (warp_stereo_camera_kernels.py).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import raycast
from ..sim.structs import RaySensorParams, SimParams, SimState
from ..utils import rng as rnglib
from ..utils.math import quat_from_euler_xyz, quat_mul, quat_rotate, tf_apply

_f32 = lambda x: jnp.asarray(x, jnp.float32)


# ---------------------------------------------------------------------------
# ray tables
# ---------------------------------------------------------------------------


def camera_ray_dirs(height: int, width: int, hfov_deg: float):
    """Per-pixel unit dirs in the OPTICAL frame (z forward) via K^-1, and
    the depth multiplier dot(rd, principal)."""
    hfov = math.radians(hfov_deg)
    fx = (width / 2.0) / math.tan(hfov / 2.0)
    # VFOV from aspect ratio (reference base_depth_camera_config comment)
    fy = fx
    cx, cy = width / 2.0, height / 2.0
    xs = np.arange(width, dtype=np.float32)
    ys = np.arange(height, dtype=np.float32)
    u = (xs[None, :] - cx) / fx                      # (1, W)
    v = (ys[:, None] - cy) / fy                      # (H, 1)
    dirs = np.stack([
        np.broadcast_to(u, (height, width)),
        np.broadcast_to(v, (height, width)),
        np.ones((height, width), np.float32),
    ], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    principal = np.array([0.0, 0.0, 1.0], np.float32)
    mult = dirs @ principal
    return _f32(dirs), _f32(mult)


def lidar_ray_dirs(height: int, width: int, h_min: float, h_max: float,
                   v_min: float, v_max: float):
    """Spherical az/el table in the sensor frame (x forward), matching the
    reference's scan ordering: +HFOV -> -HFOV, +VFOV -> -VFOV."""
    h_min, h_max = math.radians(h_min), math.radians(h_max)
    v_min, v_max = math.radians(v_min), math.radians(v_max)
    j = np.arange(width, dtype=np.float32)
    i = np.arange(height, dtype=np.float32)
    az = h_max - (h_max - h_min) * (j / max(width - 1, 1))          # (W,)
    el = v_max - (v_max - v_min) * (i / max(height - 1, 1))         # (H,)
    azg = np.broadcast_to(az[None, :], (height, width))
    elg = np.broadcast_to(el[:, None], (height, width))
    dirs = np.stack([
        np.cos(azg) * np.cos(elg),
        np.sin(azg) * np.cos(elg),
        np.sin(elg),
    ], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    mult = np.ones((height, width), np.float32)
    return _f32(dirs), _f32(mult)


def build_ray_sensor_params(cfg) -> RaySensorParams:
    """Compile a camera/lidar config into device params."""
    if cfg.sensor_type == "camera":
        dirs, mult = camera_ray_dirs(cfg.height, cfg.width, cfg.horizontal_fov_deg)
        if not cfg.calculate_depth:
            mult = jnp.ones_like(mult)
    else:
        dirs, mult = lidar_ray_dirs(cfg.height, cfg.width,
                                    cfg.horizontal_fov_deg_min,
                                    cfg.horizontal_fov_deg_max,
                                    cfg.vertical_fov_deg_min,
                                    cfg.vertical_fov_deg_max)
    rot = np.radians(cfg.euler_frame_rot_deg)
    data_quat = quat_from_euler_xyz(_f32(rot[0]), _f32(rot[1]), _f32(rot[2]))
    noise = cfg.sensor_noise
    return RaySensorParams(
        dirs=dirs,
        depth_multiplier=mult,
        data_frame_quat=data_quat,
        max_range=_f32(cfg.max_range),
        min_range=_f32(cfg.min_range),
        far_out_value=_f32(cfg.far_out_of_range_value),
        near_out_value=_f32(cfg.near_out_of_range_value),
        min_translation=_f32(cfg.min_translation),
        max_translation=_f32(cfg.max_translation),
        min_rotation=_f32(np.radians(cfg.min_euler_rotation_deg)),
        max_rotation=_f32(np.radians(cfg.max_euler_rotation_deg)),
        nominal_position=_f32(cfg.nominal_position),
        nominal_rotation=_f32(np.radians(cfg.nominal_orientation_euler_deg)),
        std_a=_f32(noise.std_a), std_b=_f32(noise.std_b), std_c=_f32(noise.std_c),
        mean_offset=_f32(noise.mean_offset),
        pixel_dropout_prob=_f32(noise.pixel_dropout_prob),
        height=cfg.height, width=cfg.width,
        sensor_type=cfg.sensor_type,
        calculate_depth=cfg.calculate_depth,
        return_pointcloud=cfg.return_pointcloud,
        pointcloud_in_world_frame=cfg.pointcloud_in_world_frame,
        segmentation_camera=cfg.segmentation_camera,
        normalize_range=cfg.normalize_range,
        enable_noise=noise.enable_sensor_noise,
        randomize_placement=cfg.randomize_placement,
        stereo_baseline=float(getattr(cfg, "stereo_baseline", 0.0)),
        num_sensors=int(getattr(cfg, "num_sensors", 1)),
    )


# ---------------------------------------------------------------------------
# mount randomization (called from reset)
# ---------------------------------------------------------------------------


def sample_mount_pose(sp: RaySensorParams, subkeys):
    """Per-env local mount pose (reference warp_sensor.py:92-127).

    num_sensors > 1: one independently randomized mount per sensor copy
    (reference warp_sensor.py:112-127 randomizes per (env, sensor));
    returns (N, S, 3)/(N, S, 4). S == 1 keeps the historical (N, 3)/(N, 4).
    """
    N = subkeys.shape[0]
    S = sp.num_sensors

    def one(sensor_idx):
        if sp.randomize_placement:
            base = 2 * sensor_idx
            k_t = jax.vmap(jax.random.fold_in)(
                subkeys, jnp.full((N,), base, jnp.uint32))
            k_r = jax.vmap(jax.random.fold_in)(
                subkeys, jnp.full((N,), base + 1, jnp.uint32))
            pos = rnglib.env_uniform(k_t, sp.min_translation,
                                     sp.max_translation, (3,))
            eul = rnglib.env_uniform(k_r, sp.min_rotation,
                                     sp.max_rotation, (3,))
        else:
            pos = jnp.broadcast_to(sp.nominal_position, (N, 3))
            eul = jnp.broadcast_to(sp.nominal_rotation, (N, 3))
        quat = quat_from_euler_xyz(eul[..., 0], eul[..., 1], eul[..., 2])
        # fresh materialization: these land in the donated state pytree,
        # and broadcast views would trip the double-donation check
        return jnp.asarray(pos) + 0.0, jnp.asarray(quat) + 0.0

    if S == 1:
        return one(0)
    poses, quats = zip(*(one(s) for s in range(S)))
    return jnp.stack(poses, axis=1), jnp.stack(quats, axis=1)


# ---------------------------------------------------------------------------
# render + postprocess
# ---------------------------------------------------------------------------


def sensor_world_pose(sp: RaySensorParams, state: SimState, mount_pos, mount_quat):
    """Compose robot pose with the randomized mount and data-frame rotation
    (reference warp_sensor.py:177-187)."""
    pos = tf_apply(state.quat, state.pos, mount_pos)
    quat = quat_mul(state.quat, quat_mul(mount_quat, sp.data_frame_quat))
    return pos, quat


def column_split_dirs(dirs_flat, H: int, W: int):
    """Reorder row-major camera rays into column-half blocks (left-half
    rays then right-half rays): each Pallas ray tile then spans half the
    horizontal FOV, so the per-tile view-cone broad phase culls ~2x
    tighter. Pure reshapes/transposes — no gathers. Inverse:
    column_unsplit_image."""
    return jnp.transpose(dirs_flat.reshape(H, 2, W // 2, 3),
                         (1, 0, 2, 3)).reshape(H * W, 3)


def column_split_flat(x, H: int, W: int):
    """column_split_dirs ordering for a flat per-ray (R,) table (e.g. the
    depth-multiplier fed to the in-kernel RGB shader)."""
    return jnp.transpose(x.reshape(H, 2, W // 2), (1, 0, 2)).reshape(H * W)


def column_unsplit_image(img, N: int, H: int, W: int):
    """Undo column_split_dirs ordering on a rendered (N, R[, C...]) image."""
    lead = img.shape[2:]
    return jnp.transpose(
        img.reshape(N, 2, H, W // 2, *lead),
        (0, 2, 1, 3) + tuple(4 + k for k in range(len(lead)))
    ).reshape(N, H * W, *lead)


def render(params: SimParams, state: SimState, sp: RaySensorParams,
           mount_pos, mount_quat, noise_key=None, want_seg=None):
    """Full sensor capture -> (pixels, segmentation).

    pixels: (N, H, W) depth/range image, or (N, H, W, 3) pointcloud.
    segmentation: (N, H, W) int32 (NO_HIT -> -2) or None.
    want_seg: tri-state override — None follows sp.segmentation_camera;
    False lets depth-only consumers (the fused navigation step reads depth
    only) skip the in-kernel segmentation work entirely.

    num_sensors > 1 (mount_pos (N, S, 3)): captures every sensor copy and
    stacks on axis 1 — (N, S, H, W[, 3]) like the reference's kernels
    (warp_cam.py:74 launches over (num_envs, num_sensors, W, H)). One
    fused program: XLA CSEs the shared world-space primitive packing
    across the S kernel calls.
    """
    if mount_pos.ndim == 3:
        S = mount_pos.shape[1]
        keys = (jax.random.split(noise_key, S)
                if noise_key is not None else [None] * S)
        px, sg = zip(*(render(params, state, sp, mount_pos[:, s],
                              mount_quat[:, s], noise_key=keys[s],
                              want_seg=want_seg)
                       for s in range(S)))
        return (jnp.stack(px, axis=1),
                jnp.stack(sg, axis=1) if sg[0] is not None else None)
    N = state.pos.shape[0]
    H, W = sp.height, sp.width
    R = H * W
    pos_w, quat_w = sensor_world_pose(sp, state, mount_pos, mount_quat)

    dirs_flat = sp.dirs.reshape(R, 3)
    sc = params.scene
    use_pallas = (jax.default_backend() == "tpu" and sc is not None
                  and sc.num_env_prims > 0)

    if sc is None or sc.num_env_prims == 0:
        t = jnp.full((N, R), raycast.NO_HIT_RAY_VAL, jnp.float32)
        sem = jnp.full((N, R), raycast.NO_HIT_SEGMENTATION_VAL, jnp.int32)
        rd_world = None
    elif use_pallas:
        from ..ops import raycast_pallas as rp
        # feed rays to the kernel in column-half order: tighter per-tile
        # view cones (column_split_dirs; inverse applied to the images)
        split = (W % 2 == 0) and (R >= 2 * rp.TILE_RAYS)
        dirs_use = column_split_dirs(dirs_flat, H, W) if split else dirs_flat
        ones = jnp.ones((R,), jnp.float32)
        prims = rp.pack_prims_world(sc, state.obstacle_pos, state.obstacle_quat)
        # depth-only sensors skip the seg scratch/selects/DMA in-kernel
        if want_seg is None:
            want_seg = bool(sp.segmentation_camera)
        t, sem = rp.raycast_pallas(rp.pack_pose(pos_w, quat_w), prims,
                                   dirs_use, ones, sc.n_box, sc.n_cyl,
                                   sc.n_sph, float(sp.max_range),
                                   want_seg=want_seg, n_tri=sc.n_tri)
        if sp.stereo_baseline > 0.0:
            offset = quat_rotate(quat_w, jnp.broadcast_to(
                jnp.array([-sp.stereo_baseline, 0.0, 0.0], jnp.float32), (N, 3)))
            # right-eye seg is never consumed (left eye provides it)
            t_r, _ = rp.raycast_pallas(rp.pack_pose(pos_w + offset, quat_w),
                                       prims, dirs_use, ones, sc.n_box,
                                       sc.n_cyl, sc.n_sph, float(sp.max_range),
                                       want_seg=False, n_tri=sc.n_tri)
            t = jnp.maximum(t, t_r)
        if split:
            t = column_unsplit_image(t, N, H, W)
            if sem is not None:
                sem = column_unsplit_image(sem, N, H, W)
        rd_world = None
    else:
        rd_world = quat_rotate(quat_w[:, None, :], dirs_flat[None, :, :])
        t, sem = raycast.raycast_batched(sc, state.obstacle_pos,
                                         state.obstacle_quat, pos_w, rd_world,
                                         sp.max_range)
        if sp.stereo_baseline > 0.0:
            # right eye offset along sensor-frame -x; keep the farther hit
            # (disparity-consistent far field, reference stereo kernels)
            offset = quat_rotate(quat_w, jnp.broadcast_to(
                jnp.array([-sp.stereo_baseline, 0.0, 0.0], jnp.float32), (N, 3)))
            t_r, _ = raycast.raycast_batched(sc, state.obstacle_pos,
                                             state.obstacle_quat, pos_w + offset,
                                             rd_world, sp.max_range)
            t = jnp.maximum(t, t_r)

    mult = sp.depth_multiplier.reshape(R)
    depth = (t * mult[None, :]).reshape(N, H, W)
    sem_img = sem.reshape(N, H, W) if sem is not None else None

    if sp.return_pointcloud:
        if sp.pointcloud_in_world_frame:
            if rd_world is None:
                rd_world = quat_rotate(quat_w[:, None, :], dirs_flat[None, :, :])
            pts = pos_w[:, None, :] + t[..., None] * rd_world
        else:
            pts = t[..., None] * dirs_flat[None, :, :]
        pixels = pts.reshape(N, H, W, 3)
    else:
        pixels = depth

    if sp.enable_noise and noise_key is not None:
        pixels = apply_noise(sp, pixels, noise_key)

    if not (sp.return_pointcloud and sp.pointcloud_in_world_frame):
        pixels = apply_range_limits(sp, pixels)
        if sp.normalize_range:
            pixels = pixels / sp.max_range

    emit_seg = sp.segmentation_camera if want_seg is None else want_seg
    return pixels, (sem_img if emit_seg else None)


def apply_noise(sp: RaySensorParams, pixels, noise_key):
    """std = a*x^2 + b*x + c gaussian + dropout (warp_sensor.py:229-247)."""
    k1, k2 = jax.random.split(noise_key)
    std = sp.std_a * pixels**2 + sp.std_b * pixels + sp.std_c
    noise = jax.random.normal(k1, pixels.shape, jnp.float32)
    pixels = pixels - sp.mean_offset + std * noise
    drop = jax.random.uniform(k2, pixels.shape) < sp.pixel_dropout_prob
    return jnp.where(drop, sp.near_out_value, pixels)


def apply_range_limits(sp: RaySensorParams, pixels):
    if pixels.ndim == 4:  # pointcloud in sensor frame: clamp by norm
        r = jnp.linalg.norm(pixels, axis=-1, keepdims=True)
        pixels = jnp.where(r > sp.max_range, sp.far_out_value, pixels)
        pixels = jnp.where(r < sp.min_range, sp.near_out_value, pixels)
        return pixels
    pixels = jnp.where(pixels > sp.max_range, sp.far_out_value, pixels)
    pixels = jnp.where(pixels < sp.min_range, sp.near_out_value, pixels)
    return pixels


def render_normal_faceid(params: SimParams, state: SimState,
                         sp: RaySensorParams, mount_pos, mount_quat):
    """NormalFaceID capture (reference WarpNormalFaceIDCam / -Lidar,
    warp_camera_kernels.py:68-121): per-pixel world-frame surface normal +
    hit primitive index (the face-id analog of the primitive renderer),
    plus depth/range and segmentation.

    On TPU this rides the Pallas kernel's want_normals mode — the same
    training-rate path as depth rendering (in-kernel normal candidates
    selected by the winning-primitive min-reduction); the pure-JAX oracle
    (raycast_batched_normals) is the CPU fallback and correctness anchor.

    Returns (depth (N,H,W), normals (N,H,W,3), face_id (N,H,W), seg (N,H,W));
    with num_sensors > 1 every output gains the sensor axis at position 1.
    """
    if mount_pos.ndim == 3:
        outs = [render_normal_faceid(params, state, sp, mount_pos[:, s],
                                     mount_quat[:, s])
                for s in range(mount_pos.shape[1])]
        return tuple(jnp.stack(parts, axis=1) for parts in zip(*outs))
    N = state.pos.shape[0]
    H, W = sp.height, sp.width
    R = H * W
    pos_w, quat_w = sensor_world_pose(sp, state, mount_pos, mount_quat)
    dirs_flat = sp.dirs.reshape(R, 3)
    sc = params.scene
    if sc is None or sc.num_env_prims == 0:
        depth = jnp.full((N, H, W), raycast.NO_HIT_RAY_VAL, jnp.float32)
        return (depth, jnp.zeros((N, H, W, 3), jnp.float32),
                jnp.full((N, H, W), -1, jnp.int32),
                jnp.full((N, H, W), raycast.NO_HIT_SEGMENTATION_VAL, jnp.int32))
    if jax.default_backend() == "tpu":
        from ..ops import raycast_pallas as rp
        # same column-half tile ordering as render(): tighter view cones
        split = (W % 2 == 0) and (R >= 2 * rp.TILE_RAYS)
        dirs_use = column_split_dirs(dirs_flat, H, W) if split else dirs_flat
        ones = jnp.ones((R,), jnp.float32)
        prims = rp.pack_prims_world(sc, state.obstacle_pos, state.obstacle_quat)
        t, sem, normals, face = rp.raycast_pallas(
            rp.pack_pose(pos_w, quat_w), prims, dirs_use, ones, sc.n_box,
            sc.n_cyl, sc.n_sph, float(sp.max_range), want_seg=True,
            n_tri=sc.n_tri, want_normals=True)
        if split:
            t = column_unsplit_image(t, N, H, W)
            sem = column_unsplit_image(sem, N, H, W)
            face = column_unsplit_image(face, N, H, W)
            normals = column_unsplit_image(normals, N, H, W)
    else:
        rd_world = quat_rotate(quat_w[:, None, :], dirs_flat[None, :, :])
        t, sem, normals, face = raycast.raycast_batched_normals(
            sc, state.obstacle_pos, state.obstacle_quat, pos_w, rd_world,
            sp.max_range)
    mult = sp.depth_multiplier.reshape(R)
    depth = jnp.where(face >= 0, t * mult[None, :], raycast.NO_HIT_RAY_VAL)
    return (depth.reshape(N, H, W), normals.reshape(N, H, W, 3),
            face.reshape(N, H, W), sem.reshape(N, H, W))


# ---------------------------------------------------------------------------
# RGB camera modality
# ---------------------------------------------------------------------------

# Shading constants live next to the oracle caster (ops/raycast.py) so the
# Pallas in-kernel shader shares them without an import cycle; re-exported
# here under the historical names for existing importers.
from ..ops.raycast import (RGB_AMBIENT as _RGB_AMBIENT, SEG_ALBEDO,
                           SKY_RGB as _SKY_RGB, SUN_DIR as _SUN_DIR)


def shade_rgb(depth, normals, face_id, seg, max_range):
    """Lambertian shading of a primitive-soup render -> (N, H, W, 3) f32 in
    [0, 1]: albedo from the segmentation palette, double-sided diffuse from
    the world-frame surface normal, mild distance attenuation, sky where
    nothing was hit. Pure jnp — runs inside the jitted step like every
    other sensor op.

    All math is PLANAR (per-channel (N, H, W) arrays, stacked only at the
    end): a palette gather `SEG_ALBEDO[k]` lowers to a one-hot whose minor
    dim (palette size) pads to the TPU's 128-lane tile — a 12.8x buffer
    blow-up that OOMed 16 GB of HBM at 1024 envs x 135x240 (measured,
    round 3). The select-sum below fuses to elementwise VPU work with no
    materialized intermediate."""
    n_pal = SEG_ALBEDO.shape[0]
    k = jnp.abs(seg) % n_pal                                   # (N, H, W)
    # double-sided: primitives are watertight solids, the camera may see
    # either face orientation
    lambert = jnp.abs(normals[..., 0] * float(_SUN_DIR[0])
                      + normals[..., 1] * float(_SUN_DIR[1])
                      + normals[..., 2] * float(_SUN_DIR[2]))
    shade = _RGB_AMBIENT + (1.0 - _RGB_AMBIENT) * lambert
    fade = 1.0 - 0.5 * jnp.clip(depth / max_range, 0.0, 1.0)
    lit = shade * fade                                         # (N, H, W)
    hit = face_id >= 0
    chans = []
    for c in range(3):
        albedo_c = jnp.zeros_like(lit)
        for pal_k in range(n_pal):
            albedo_c = jnp.where(k == pal_k, float(SEG_ALBEDO[pal_k, c]),
                                 albedo_c)
        chans.append(jnp.where(hit, albedo_c * lit, float(_SKY_RGB[c])))
    return jnp.stack(chans, axis=-1)


def render_rgb(params: SimParams, state: SimState, sp: RaySensorParams,
               mount_pos, mount_quat):
    """Onboard RGB capture — the modality the reference only had through
    Isaac Gym's native camera (sensors/isaacgym_camera_sensor.py:137 reads
    gymapi.IMAGE_COLOR; warp_sensor's own code says "At some point, RGB cam
    support for Warp would be added on our end", isaacgym_camera_sensor.py:
    136). Here it is one more shading of the unified ray-cast render, fully
    on device.

    On TPU the whole modality runs in ONE Pallas kernel pass (want_rgb
    mode): the kernel tracks a single Lambert scalar per ray instead of
    the full normal + face id, shades against the palette constants at
    tile end, and emits the three RGB planes directly — no face/normal
    image DMAs and no XLA-side shading (round-3 rgb_breakdown: 44.1
    ms/frame via the normals path at 1024x135x240; the in-kernel path
    drops the 10.7 ms XLA shade + 4 image DMAs and most of the per-prim
    normal tracking). The oracle path below (render_normal_faceid +
    shade_rgb) is the CPU fallback and the correctness anchor
    (tests/test_raycast_pallas.py rgb differential).

    Returns (rgb (N,H,W,3) f32 in [0,1], depth (N,H,W), seg (N,H,W));
    with num_sensors > 1 every output gains the sensor axis at position 1.
    """
    if mount_pos.ndim == 3:
        outs = [render_rgb(params, state, sp, mount_pos[:, s],
                           mount_quat[:, s])
                for s in range(mount_pos.shape[1])]
        return tuple(jnp.stack(parts, axis=1) for parts in zip(*outs))
    sc = params.scene
    if (jax.default_backend() == "tpu" and sc is not None
            and sc.num_env_prims > 0):
        from ..ops import raycast_pallas as rp

        N = state.pos.shape[0]
        H, W = sp.height, sp.width
        R = H * W
        pos_w, quat_w = sensor_world_pose(sp, state, mount_pos, mount_quat)
        dirs_flat = sp.dirs.reshape(R, 3)
        mult = sp.depth_multiplier.reshape(R)
        split = (W % 2 == 0) and (R >= 2 * rp.TILE_RAYS)
        dirs_use = column_split_dirs(dirs_flat, H, W) if split else dirs_flat
        mult_use = column_split_flat(mult, H, W) if split else mult
        prims = rp.pack_prims_world(sc, state.obstacle_pos,
                                    state.obstacle_quat)
        depth, seg, rgb = rp.raycast_pallas(
            rp.pack_pose(pos_w, quat_w), prims, dirs_use, mult_use,
            sc.n_box, sc.n_cyl, sc.n_sph, float(sp.max_range),
            n_tri=sc.n_tri, want_rgb=True)
        if split:
            depth = column_unsplit_image(depth, N, H, W)
            seg = column_unsplit_image(seg, N, H, W)
            rgb = column_unsplit_image(rgb, N, H, W)
        return (rgb.reshape(N, H, W, 3), depth.reshape(N, H, W),
                seg.reshape(N, H, W))
    depth, normals, face, seg = render_normal_faceid(params, state, sp,
                                                     mount_pos, mount_quat)
    rgb = shade_rgb(depth, normals, face, seg, sp.max_range)
    return rgb, depth, seg


def render_rgb_camera(params: SimParams, state: SimState):
    return render_rgb(params, state, params.camera,
                      state.cam_mount_pos, state.cam_mount_quat)


def render_normal_faceid_camera(params: SimParams, state: SimState):
    return render_normal_faceid(params, state, params.camera,
                                state.cam_mount_pos, state.cam_mount_quat)


def render_normal_faceid_lidar(params: SimParams, state: SimState):
    return render_normal_faceid(params, state, params.lidar,
                                state.lidar_mount_pos, state.lidar_mount_quat)


def render_camera(params: SimParams, state: SimState, noise_key=None,
                  want_seg=None):
    return render(params, state, params.camera, state.cam_mount_pos,
                  state.cam_mount_quat, noise_key, want_seg=want_seg)


def render_lidar(params: SimParams, state: SimState, noise_key=None,
                 want_seg=None):
    return render(params, state, params.lidar, state.lidar_mount_pos,
                  state.lidar_mount_quat, noise_key, want_seg=want_seg)
