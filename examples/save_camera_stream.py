"""Save rendered depth + RGB frames to disk (reference
examples/save_camera_stream.py).

Writes PGM depth images and PPM RGB images (no external image deps) while
flying forward through the obstacle env. The RGB stream is the modality the
reference could only get from Isaac Gym's native camera
(isaacgym_camera_sensor.py:136-137); here it is shaded on device from the
same unified ray-cast render.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import argparse
import os

import jax.numpy as jnp
import numpy as np

import aerial_gym_simulator_tpu as ag


def save_pgm(path: str, img01: np.ndarray):
    """Write a [0,1] float image as binary 8-bit PGM."""
    h, w = img01.shape
    data = (np.clip(img01, 0.0, 1.0) * 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(data.tobytes())


def save_ppm(path: str, rgb01: np.ndarray):
    """Write a [0,1] float RGB image as binary 8-bit PPM."""
    h, w, _ = rgb01.shape
    data = (np.clip(rgb01, 0.0, 1.0) * 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(data.tobytes())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="/tmp/aerial_gym_tpu_frames")
    p.add_argument("--frames", type=int, default=50)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    task = ag.task_registry.make_task("navigation_task", num_envs=4, seed=3)
    task.reset()
    actions = jnp.tile(jnp.array([0.4, 0.0, 0.0, 0.0], jnp.float32), (4, 1))
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import (
        render_camera, render_rgb_camera)
    for i in range(args.frames):
        task.step(actions)
        # latest rendered depth + RGB images of env 0 via the sensor pipeline
        pixels, _ = render_camera(task.params, task.state)
        rgb, _, _ = render_rgb_camera(task.params, task.state)
        save_pgm(os.path.join(args.out_dir, f"frame_{i:04d}.pgm"),
                 np.asarray(pixels[0]))
        save_ppm(os.path.join(args.out_dir, f"rgb_frame_{i:04d}.ppm"),
                 np.asarray(rgb[0]))
    print(f"wrote {args.frames} depth + rgb frame pairs to {args.out_dir}")
