"""Multi-device scaling-efficiency benchmark.

Measures aggregate env-steps/s of the fused task step at 1, 2, 4, ... N
devices with the env axis sharded over the mesh, and reports scaling
efficiency vs the single-device rate. Run on a real TPU slice, or on a
virtual CPU mesh for plumbing checks:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/scaling_benchmark.py --envs_per_device 512
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import time

import jax
import jax.numpy as jnp


def bench_devices(n_dev: int, envs_per_device: int, steps: int,
                  task_name: str):
    import aerial_gym_simulator_tpu as ag
    from aerial_gym_simulator_tpu.parallel import mesh as meshlib

    num_envs = n_dev * envs_per_device
    task = ag.task_registry.make_task(task_name, num_envs=num_envs, seed=0)
    task.reset()
    step_fn, carry, obs = task.make_step_fn()
    m = meshlib.make_mesh(n_dev)
    carry = meshlib.shard_env_pytree(carry, m)
    actions = meshlib.shard_env_pytree(
        jnp.zeros((num_envs, task.action_space_dim), jnp.float32), m)

    # keep obs + reward live so XLA cannot dead-code-eliminate the
    # observation/reward work the PPO rollout actually performs
    jitted = jax.jit(lambda c, a: step_fn(c, a)[:3])
    carry, obs, rew = jitted(carry, actions)
    for _ in range(9):
        carry, obs, rew = jitted(carry, actions)
    jax.block_until_ready(obs)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry, obs, rew = jitted(carry, actions)
    jax.block_until_ready(obs)
    dt = time.perf_counter() - t0
    return steps * num_envs / dt


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="position_setpoint_task")
    p.add_argument("--envs_per_device", type=int, default=2048)
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()

    n_total = len(jax.devices())
    counts = [1]
    while counts[-1] * 2 <= n_total:
        counts.append(counts[-1] * 2)
    if counts[-1] != n_total:
        counts.append(n_total)          # always benchmark the full slice

    base_rate_per_dev = None
    print(f"{'devices':>8s} {'envs':>8s} {'steps/s':>14s} {'efficiency':>11s}")
    for n in counts:
        rate = bench_devices(n, args.envs_per_device, args.steps, args.task)
        if base_rate_per_dev is None:
            base_rate_per_dev = rate
        eff = rate / (base_rate_per_dev * n)
        print(f"{n:8d} {n * args.envs_per_device:8d} {rate:14,.0f} "
              f"{100 * eff:10.1f}%")
