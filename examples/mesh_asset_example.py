"""User triangle-mesh obstacle assets end to end.

The reference loads URDF `<mesh>` trimeshes through urdfpy/trimesh + Warp
BVH (assets/warp_asset.py). Here the same user workflow — drop an STL/OBJ
into a URDF and use it as an environment obstacle — flows through the
triangle-primitive path (assets/mesh.py): this script

  1. writes an icosphere STL to disk,
  2. registers a custom AssetTypeConfig whose URDF references the mesh
     (absolute path, so URDF-string assets resolve it),
  3. builds an obstacle env containing it next to the stock panels,
  4. flies the depth-camera quad and saves a rendered frame proving the
     mesh renders (and collides) like any primitive.

Run: python examples/mesh_asset_example.py [--cpu]
"""

import os as _os
import struct as _struct
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import dataclasses

import numpy as np


def write_icosphere_stl(path: str, radius: float = 0.8, subdiv: int = 2):
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(subdiv):
        mid, verts = {}, list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = verts[a] + verts[b]
                mid[key] = len(verts)
                verts.append(m / np.linalg.norm(m))
            return mid[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v, f = np.asarray(verts), np.asarray(nf)
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(_struct.pack("<I", len(f)))
        for tri in f:
            fh.write(_struct.pack("<3f", 0, 0, 0))
            for vi in tri:
                fh.write(_struct.pack("<3f", *(v[vi] * radius)))
            fh.write(_struct.pack("<H", 0))


def mesh_urdf(stl_path: str) -> str:
    return f"""<?xml version="1.0"?>
<robot name="mesh_blob">
  <link name="base_link">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.1" ixy="0" ixz="0" iyy="0.1" iyz="0" izz="0.1"/>
    </inertial>
    <collision><origin xyz="0 0 0" rpy="0 0 0"/>
      <geometry><mesh filename="{stl_path}"/></geometry>
    </collision>
  </link>
</robot>
"""


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--num_envs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--out", default="/tmp/mesh_asset_frame.ppm")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from aerial_gym_simulator_tpu.config.asset_config import env_object_config as eoc
    from aerial_gym_simulator_tpu.config.env_config.obstacle_envs import (
        EnvWithObstaclesConfig,
    )
    from aerial_gym_simulator_tpu.envs.scene import build_scene_params
    from aerial_gym_simulator_tpu.registry.registries import (
        controller_registry,
        robot_registry,
        sim_config_registry,
    )
    from aerial_gym_simulator_tpu.sim.env_manager import EnvManager
    from aerial_gym_simulator_tpu.sim.params import build_sim_params
    from aerial_gym_simulator_tpu.viewer import OfflineViewer
    import aerial_gym_simulator_tpu  # noqa: F401  (registers configs)

    stl = "/tmp/user_mesh_sphere.stl"
    write_icosphere_stl(stl)

    mesh_asset = eoc.AssetTypeConfig(
        name="user_mesh_blobs",
        num_assets=2,
        urdf_variants=[mesh_urdf(stl)],
        min_state_ratio=eoc._ratio(0.35, 0.2, 0.3),
        max_state_ratio=eoc._ratio(0.85, 0.8, 0.7),
        keep_in_env=True,
        semantic_id=42,
    )
    env_cfg = EnvWithObstaclesConfig()
    env_cfg.asset_types = list(env_cfg.asset_types) + [mesh_asset]
    env_cfg.__post_init__()

    sim_cfg = sim_config_registry.make("base_sim")
    robot_cfg = robot_registry.make("base_quadrotor_with_camera")
    ctrl_cfg = controller_registry.make("lee_velocity_control")
    scene = build_scene_params(env_cfg, args.num_envs)
    params = build_sim_params(sim_cfg, env_cfg, robot_cfg, ctrl_cfg,
                              num_envs=args.num_envs, scene=scene)
    env = EnvManager(params, seed=0, sim_config=sim_cfg, env_config=env_cfg,
                     robot_config=robot_cfg, controller_config=ctrl_cfg)
    env.reset()
    print(f"scene primitives per env: {params.scene.num_env_prims} "
          f"(boxes {params.scene.n_box}, cylinders {params.scene.n_cyl}, "
          f"spheres {params.scene.n_sph}, TRIANGLES {params.scene.n_tri})")
    assert params.scene.n_tri > 0, "mesh did not compile to triangles"

    viewer = OfflineViewer(params, width=480, height=320, env_id=0)
    for i in range(args.steps):
        env.step(jnp.zeros((args.num_envs, 4), jnp.float32))
        if i % 10 == 0:
            viewer.render(env.state)
    viewer.save_ppm_sequence(_os.path.dirname(args.out) or ".")
    print(f"rendered {len(viewer.frames)} frames "
          f"(mesh spheres have semantic id 42) -> frame_*.ppm")
