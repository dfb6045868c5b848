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

_SHIPPED = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "selected_network")

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help="PPOTrainer checkpoint; default: the SHIPPED "
                        "selected_network/navigation_policy.npz anchor")
    p.add_argument("--npz", default=_os.path.join(_SHIPPED,
                                                  "navigation_policy.npz"),
                   help="exported .npz policy (numpy inference path)")
    p.add_argument("--vae_params", default=None,
                   help="depth-VAE params pickle the policy was trained with "
                        "(models.train_vae output) — MUST match training; "
                        "default: the shipped selected_network/depth_vae.pkl")
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    enable_compilation_cache()
    from aerial_gym_simulator_tpu.tasks.navigation_task import (
        NavigationTask, NavigationTaskConfig)
    cfg = NavigationTaskConfig()
    cfg.num_envs = args.num_envs
    if args.vae_params:
        cfg.vae_params_path = args.vae_params
    elif _os.path.exists(_os.path.join(_SHIPPED, "depth_vae.pkl")):
        cfg.vae_params_path = _os.path.join(_SHIPPED, "depth_vae.pkl")
    task = NavigationTask(cfg, seed=0)

    policy = None
    trainer = None
    if args.checkpoint and not _os.path.exists(args.checkpoint):
        # an EXPLICIT checkpoint that doesn't exist must fail loudly —
        # silently falling back to the shipped npz evaluates the wrong
        # policy and poisons result logs (r5 incident: a killed training
        # run left no checkpoint and the fallback produced plausible-
        # looking 0% lines against a mismatched encoder)
        raise FileNotFoundError(f"--checkpoint {args.checkpoint} not found")
    if args.checkpoint and _os.path.exists(args.checkpoint):
        trainer = PPOTrainer(task, PPOConfig(num_envs=args.num_envs,
                                             horizon=8, minibatch_size=256))
        trainer.load_checkpoint(args.checkpoint)
    elif _os.path.exists(args.npz):
        from aerial_gym_simulator_tpu.sim2real.numpy_policy import load_policy_npz
        policy = load_policy_npz(args.npz, num_envs=args.num_envs)
        print(f"flying shipped policy {args.npz}")
    else:
        trainer = PPOTrainer(task, PPOConfig(num_envs=args.num_envs,
                                             horizon=8, minibatch_size=256))
        print(f"WARNING: no checkpoint/npz found — flying the untrained "
              f"policy (train one with rl.ppo --task navigation_task)")

    obs, *_ = task.reset()
    successes = crashes = timeouts = 0
    dones = None  # recurrent policies zero per-env hidden at episode starts
    for i in range(args.steps):
        if policy is not None:
            action = jnp.asarray(policy(np.asarray(obs["observations"])))
        else:
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
