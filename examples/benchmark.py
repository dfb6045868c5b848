"""Throughput benchmark (reference examples/benchmark.py).

Two modes, like the reference:
  physics: 256+ envs, empty env, no_control — env-steps/s + realtime speedup
  render:  16 envs, 270x480 depth camera, obstacle env — frames/s

    python examples/benchmark.py --mode physics --num_envs 4096 --steps 500
    python examples/benchmark.py --mode render --num_envs 16 --steps 100
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import argparse
import time

import jax
import jax.numpy as jnp

from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder


def bench_physics(num_envs: int, steps: int):
    env = SimBuilder().build_env(
        sim_name="base_sim", env_name="empty_env",
        robot_name="base_quadrotor", controller_name="no_control",
        num_envs=num_envs, seed=0)
    env.reset()
    actions = jnp.full((num_envs, 4), 0.6133, jnp.float32)  # ~hover thrust

    for _ in range(20):
        env.step(actions)
    jax.block_until_ready(env.state.pos)

    t0 = time.perf_counter()
    for _ in range(steps):
        env.step(actions)
    jax.block_until_ready(env.state.pos)
    dt = time.perf_counter() - t0

    sps = steps * num_envs / dt
    print(f"physics: {num_envs} envs, {steps} steps in {dt:.3f}s")
    print(f"  {sps:,.0f} env-steps/s")
    print(f"  realtime speedup: {sps * float(env.params.dt):,.0f}x")


def bench_render(num_envs: int, steps: int):
    from aerial_gym_simulator_tpu.registry.registries import robot_registry
    from aerial_gym_simulator_tpu.config.sensor_config.sensor_configs import (
        NavDepthCameraConfig,
    )

    # 270x480 depth camera — the reference benchmark's configuration
    def robot_270x480():
        cfg = robot_registry.make("base_quadrotor_with_camera")
        cfg.sensor_config.camera_config = NavDepthCameraConfig()
        return cfg
    robot_registry.register("bench_quad_270x480", robot_270x480)

    env = SimBuilder().build_env(
        sim_name="base_sim", env_name="env_with_obstacles",
        robot_name="bench_quad_270x480",
        controller_name="lee_velocity_control",
        num_envs=num_envs, seed=0)
    env.reset()
    H, W = env.params.camera.height, env.params.camera.width

    pixels = env.render("sensors")
    jax.block_until_ready(pixels)

    t0 = time.perf_counter()
    for _ in range(steps):
        pixels = env.render("sensors")
    jax.block_until_ready(pixels)
    dt = time.perf_counter() - t0

    fps = steps * num_envs / dt
    rays = fps * H * W
    print(f"render: {num_envs} envs x {H}x{W} depth, {steps} frames in {dt:.3f}s")
    print(f"  {fps:,.0f} frames/s   ({rays/1e6:,.1f} M rays/s)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["physics", "render"], default="physics")
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    args = p.parse_args()
    if args.mode == "physics":
        bench_physics(args.num_envs or 256, args.steps or 500)
    else:
        bench_render(args.num_envs or 16, args.steps or 100)
