"""Normal + face-id dataset capture (reference
examples/save_camera_stream_normal_faceID.py): writes surface-normal
(RGB-encoded), face-id and depth frames while flying through obstacles."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import os

import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder
from aerial_gym_simulator_tpu.sensors.raycast_sensor import (
    render_normal_faceid_camera,
)


def save_ppm(path, rgb):
    h, w, _ = rgb.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(rgb.astype(np.uint8).tobytes())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="/tmp/aerial_gym_tpu_nfid")
    p.add_argument("--frames", type=int, default=20)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    env = SimBuilder().build_env(
        "base_sim", "env_with_obstacles", "base_quadrotor_with_camera",
        "lee_velocity_control", num_envs=2, seed=11)
    env.reset()
    fwd = jnp.tile(jnp.array([0.4, 0.0, 0.0, 0.0], jnp.float32), (2, 1))
    import jax
    capture = jax.jit(lambda s: render_normal_faceid_camera(env.params, s))
    for i in range(args.frames):
        env.step(fwd)
        depth, normals, face, seg = capture(env.state)
        n = np.asarray(normals[0])
        rgb = ((n * 0.5 + 0.5) * 255).astype(np.uint8)      # [-1,1] -> RGB
        save_ppm(os.path.join(args.out_dir, f"normal_{i:04d}.ppm"), rgb)
        np.save(os.path.join(args.out_dir, f"faceid_{i:04d}.npy"),
                np.asarray(face[0]))
        np.save(os.path.join(args.out_dir, f"depth_{i:04d}.npy"),
                np.asarray(depth[0]))
    print(f"wrote {args.frames} normal/face-id/depth frames to {args.out_dir}")
