"""Run a trained navigation policy (reference examples/dce_rl_navigation/
run_trained_navigation_policy.sh + shipped checkpoint).

Loads a PPO checkpoint (train one with
`python -m aerial_gym_simulator_tpu.rl.ppo --task navigation_task ...`),
rolls the deterministic policy through the depth-camera navigation task
and reports success / crash / timeout statistics.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", ".."))

import argparse

import jax.numpy as jnp
import numpy as np

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer, enable_compilation_cache

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="/tmp/navigation_task_ppo.ckpt")
    p.add_argument("--vae_params", default=None,
                   help="depth-VAE params pickle the policy was trained with "
                        "(models.train_vae output) — MUST match training")
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--steps", type=int, default=400)
    args = p.parse_args()

    enable_compilation_cache()
    from aerial_gym_simulator_tpu.tasks.navigation_task import (
        NavigationTask, NavigationTaskConfig)
    cfg = NavigationTaskConfig()
    cfg.num_envs = args.num_envs
    if args.vae_params:
        cfg.vae_params_path = args.vae_params
    task = NavigationTask(cfg, seed=0)
    trainer = PPOTrainer(task, PPOConfig(num_envs=args.num_envs, horizon=8,
                                         minibatch_size=256))
    if _os.path.exists(args.checkpoint):
        trainer.load_checkpoint(args.checkpoint)
    else:
        print(f"WARNING: {args.checkpoint} not found — flying the untrained "
              f"policy (train one with rl.ppo --task navigation_task)")

    obs, *_ = task.reset()
    successes = crashes = timeouts = 0
    dones = None  # recurrent policies zero per-env hidden at episode starts
    for i in range(args.steps):
        action = trainer.act(obs["observations"], deterministic=True,
                             done_prev=dones)
        obs, reward, term, trunc, infos = task.step(action)
        dones = jnp.maximum(term, trunc)
        successes += int(np.asarray(infos["successes"]).sum())
        crashes += int(np.asarray(infos["crashes"]).sum())
        timeouts += int(np.asarray(infos["timeouts"]).sum())
        if i % 100 == 99:
            total = max(successes + crashes + timeouts, 1)
            print(f"step {i}: success {successes} ({100*successes/total:.0f}%) "
                  f"crash {crashes} timeout {timeouts} "
                  f"level {float(infos['curriculum_level']):.0f}")
