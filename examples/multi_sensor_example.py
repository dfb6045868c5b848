"""Multi-sensor capture: camera + lidar together, and num_sensors > 1.

Two capabilities the reference cannot express (round 5):

  * camera AND lidar enabled on ONE robot, both captured in one fused
    jit program — the reference asserts this combination out
    (robots/robot_manager.py:185-187: "Do not use both camera and lidar
    sensors together for now"); here the lidar scan simply rides its own
    obs keys (lidar_range_pixels / lidar_segmentation_pixels).
  * num_sensors > 1 copies of a sensor per robot, each with an
    independently randomized mount — the reference's kernels launch over
    (num_envs, num_sensors, W, H) (sensors/warp/warp_cam.py:74) but every
    shipped config sets num_sensors = 1; here the captures stack to
    (N, S, H, W).

Run: python examples/run_cpu.py examples/multi_sensor_example.py
     (or directly on a TPU host)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.config.robot_config.catalog import base_quadrotor
from aerial_gym_simulator_tpu.config.sensor_config.sensor_configs import (
    BaseDepthCameraConfig)
from aerial_gym_simulator_tpu.registry.registries import robot_registry
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder


def build_robot():
    cfg = base_quadrotor()
    cfg.name = "multi_sensor_demo"
    cfg.sensor_config.enable_camera = True
    cfg.sensor_config.enable_lidar = True          # BOTH, simultaneously
    cam = BaseDepthCameraConfig()
    cam.num_sensors = 2                            # twin depth cameras
    cfg.sensor_config.camera_config = cam
    return cfg


def main():
    try:
        robot_registry.register("multi_sensor_demo", build_robot)
    except Exception:
        pass
    env = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                 "multi_sensor_demo", "lee_velocity_control",
                                 num_envs=4, seed=0)
    env.reset()
    actions = jnp.zeros((4, env.num_robot_actions))
    for step in range(10):
        env.step(actions)
        env.render()
    obs = env.get_obs()
    cam = np.asarray(obs["depth_range_pixels"])    # (N, 2, H, W)
    lid = np.asarray(obs["lidar_range_pixels"])    # (N, Hl, Wl)
    print(f"twin-camera frames: {cam.shape} "
          f"(sensor mounts {np.asarray(env.state.cam_mount_pos).shape})")
    print(f"lidar scan (same program): {lid.shape}")
    print(f"camera copies differ (independent mounts): "
          f"{not np.array_equal(cam[:, 0], cam[:, 1])}")
    assert np.isfinite(cam).all() and np.isfinite(lid).all()


if __name__ == "__main__":
    main()
