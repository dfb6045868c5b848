"""Closed-loop rollout of a trained rl-games policy (reference
examples/rl_games_example/rl_env_closed_loop_example.py).

Loads a reference-framework rl-games checkpoint (e.g. the shipped
``networks/attitude_policy.pth``) through the deployment importer and flies
it in this simulator's position_setpoint_task — the observation packing and
controller semantics match the reference, so its policies transfer with no
retraining (see also examples/reference_policy_replay.py for the
CLI-driven variant with error statistics).

Run:  python examples/rl_games_example/rl_env_closed_loop_example.py \\
          --pth <reference>/aerial_gym/examples/rl_games_example/networks/attitude_policy.pth
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import time

import numpy as np
import jax.numpy as jnp

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.utils.logging import CustomLogger

from rl_games_inference import MLP  # noqa: E402  (reference import style)

logger = CustomLogger(__name__)

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True, help="rl-games checkpoint (.pth)")
    p.add_argument("--task", default="position_setpoint_task")
    p.add_argument("--num_envs", type=int, default=24)
    p.add_argument("--steps", type=int, default=1000)
    args = p.parse_args()

    seed = 42
    np.random.seed(seed)

    rl_task_env = ag.task_registry.make_task(
        args.task, seed=seed, headless=True, num_envs=args.num_envs)
    obs, *_ = rl_task_env.reset()

    model = MLP(
        rl_task_env.task_config.observation_space_dim,
        rl_task_env.task_config.action_space_dim,
        args.pth,
    ).eval()

    actions = jnp.zeros((rl_task_env.num_envs,
                         rl_task_env.task_config.action_space_dim),
                        jnp.float32)
    error_list = []
    start = time.time()
    for i in range(args.steps):
        if i == 100:
            start = time.time()  # exclude compile time, like the reference
        obs, reward, terminated, truncated, infos = rl_task_env.step(actions)
        actions = jnp.asarray(model(np.asarray(obs["observations"])),
                              jnp.float32)
        err = float(np.linalg.norm(
            np.asarray(rl_task_env.sim_env.state.pos), axis=-1).mean())
        error_list.append(err)
        if i % 100 == 0:
            logger.info(f"step {i}: mean distance-to-origin {err:.3f} m, "
                        f"reward {float(reward.mean()):.2f}")
    elapsed = time.time() - start
    n_timed = max(args.steps - 100, 1)
    logger.info(
        f"{n_timed} steps x {rl_task_env.num_envs} envs in {elapsed:.2f}s "
        f"({n_timed * rl_task_env.num_envs / elapsed:.0f} env-steps/s); "
        f"final mean error {error_list[-1]:.3f} m")
