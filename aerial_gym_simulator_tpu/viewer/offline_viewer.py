"""Offline viewer — headless render-to-image substitute for the reference's
interactive Isaac Gym viewer (IGE_viewer_control.py:16-296).

TPU pods have no display; the equivalent workflow is: attach an
OfflineViewer to a running sim, call ``render()`` every step (or every Nth),
and get chase-camera color frames (numpy uint8) colorized from the
ray-cast depth + segmentation. Frames can be written as PPM files or an
uncompressed .avi (raw RGB) playable anywhere, with no external imaging
dependency.

Camera modes mirror the reference's follow modes:
  * "follow_robot"  — chase camera behind env i's robot (FOLLOW_ROBOT)
  * "fixed"         — static camera at a configured pose (FIXED)
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import raycast
from ..sensors.raycast_sensor import camera_ray_dirs
from ..utils.logging import CustomLogger
from ..utils.math import quat_rotate

logger = CustomLogger("offline_viewer")

# distinct colors for segmentation ids (cycled)
_PALETTE = np.array([
    [230, 80, 60], [60, 160, 230], [90, 200, 90], [240, 190, 60],
    [170, 110, 220], [240, 130, 180], [120, 210, 200], [250, 150, 70],
], np.uint8)


class OfflineViewer:
    def __init__(self, params, width: int = 320, height: int = 240,
                 hfov_deg: float = 90.0, env_id: int = 0,
                 mode: str = "follow_robot",
                 camera_position=(-2.5, 0.0, 1.5),
                 lookat_offset=(0.0, 0.0, 0.0),
                 max_range: float = 30.0):
        self.params = params
        self.width, self.height = width, height
        self.env_id = env_id
        self.mode = mode
        self.camera_position = np.asarray(camera_position, np.float32)
        self.lookat_offset = np.asarray(lookat_offset, np.float32)
        self.max_range = max_range
        dirs, _ = camera_ray_dirs(height, width, hfov_deg)
        self._dirs = jnp.asarray(dirs.reshape(-1, 3))
        self._render = jax.jit(self._render_fn)
        self.frames = []

    # -- core ---------------------------------------------------------------
    def _camera_pose(self, state):
        i = self.env_id
        target = state.pos[i] + jnp.asarray(self.lookat_offset)
        if self.mode == "follow_robot":
            cam = state.pos[i] + jnp.asarray(self.camera_position)
        else:
            cam = jnp.asarray(self.camera_position)
        return cam, target

    def _render_fn(self, state):
        cam, target = self._camera_pose(state)
        fwd = target - cam
        fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-6)
        up0 = jnp.array([0.0, 0.0, 1.0])
        right = jnp.cross(fwd, up0)
        right = right / jnp.maximum(jnp.linalg.norm(right), 1e-6)
        up = jnp.cross(right, fwd)
        # camera_ray_dirs produces OPTICAL-frame dirs (x right in image,
        # y down in image, z forward); map optical -> world look-at basis
        R = jnp.stack([right, -up, fwd], axis=1)      # (3,3): cols = basis
        rd = self._dirs @ R.T

        i = self.env_id
        sc = self.params.scene
        if sc is not None and sc.num_env_prims > 0:
            t, sem = raycast.raycast_env(
                sc.env_prim_kind[i], sc.env_prim_size[i], sc.env_prim_pos[i],
                sc.env_prim_rot[i], sc.env_prim_semantic[i],
                sc.env_prim_slot[i], state.obstacle_pos[i],
                state.obstacle_quat[i], cam, rd, self.max_range)
        else:
            Rr = rd.shape[0]
            t = jnp.full((Rr,), raycast.NO_HIT_RAY_VAL, jnp.float32)
            sem = jnp.full((Rr,), raycast.NO_HIT_SEGMENTATION_VAL, jnp.int32)

        # robot marker: bounding sphere at the robot position
        ro_r = cam - state.pos[i]
        t_robot = raycast.ray_sphere(ro_r[None, :] + 0.0 * rd, rd,
                                     self.params.robot.collision_radius)
        robot_closer = t_robot < t
        t = jnp.where(robot_closer, t_robot, t)
        sem = jnp.where(robot_closer, -10, sem)
        return t.reshape(self.height, self.width), \
            sem.reshape(self.height, self.width)

    def render(self, state, store: bool = True) -> np.ndarray:
        """Render one RGB frame (H, W, 3) uint8."""
        t, sem = self._render(state)
        t = np.asarray(t)
        sem = np.asarray(sem)
        shade = np.clip(1.0 - t / self.max_range, 0.0, 1.0)
        img = np.zeros((self.height, self.width, 3), np.uint8)
        hit = t < raycast.NO_HIT_RAY_VAL * 0.9
        colors = _PALETTE[np.abs(sem) % len(_PALETTE)]
        img[hit] = (colors[hit] * shade[hit][..., None]).astype(np.uint8)
        img[~hit] = np.array([20, 24, 38], np.uint8)         # sky
        img[sem == -10] = (np.array([255, 255, 255]) *
                           shade[sem == -10][..., None]).astype(np.uint8)
        if store:
            self.frames.append(img)
        return img

    # -- output -------------------------------------------------------------
    def save_ppm_sequence(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        for i, img in enumerate(self.frames):
            with open(os.path.join(out_dir, f"frame_{i:05d}.ppm"), "wb") as f:
                f.write(f"P6\n{self.width} {self.height}\n255\n".encode())
                f.write(img.tobytes())
        logger.info(f"wrote {len(self.frames)} frames to {out_dir}")

    def save_avi(self, path: str, fps: int = 30):
        """Minimal uncompressed AVI writer (RGB24, no external deps)."""
        frames = self.frames
        if not frames:
            raise ValueError("no frames recorded")
        h, w = self.height, self.width
        frame_size = w * h * 3
        n = len(frames)

        def chunk(tag, payload):
            pad = b"\x00" if len(payload) % 2 else b""
            return tag + struct.pack("<I", len(payload)) + payload + pad

        # BGR bottom-up rows for RGB24 AVI
        raw = []
        for img in frames:
            bgr = img[::-1, :, ::-1]
            raw.append(bgr.tobytes())

        # AVIMAINHEADER (no index chunk is written, so no AVIF_HASINDEX)
        avih = struct.pack("<14I", int(1e6 / fps), frame_size * fps, 0, 0,
                           n, 0, 1, frame_size, w, h, 0, 0, 0, 0)
        # AVISTREAMHEADER: fccType fccHandler flags prio+lang initialframes
        # scale rate start length suggestedbuf quality samplesize rcFrame(4H)
        strh = (b"vids" + b"DIB "
                + struct.pack("<IIIIIIIIIi4H", 0, 0, 0, 1, fps, 0, n,
                              frame_size, 0xFFFFFFFF & -1, 0, 0, 0, w, h))
        strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size,
                           0, 0, 0, 0)
        strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                     + chunk(b"strf", strf))
        hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
        movi_payload = b"movi" + b"".join(chunk(b"00db", r) for r in raw)
        movi = chunk(b"LIST", movi_payload)
        riff = b"AVI " + hdrl + movi
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)
        logger.info(f"wrote {n}-frame AVI to {path}")

    def reset(self):
        self.frames = []
