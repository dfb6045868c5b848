"""Policy inference demo (reference examples/inference_example.py):
train briefly, export to numpy, and fly the task closed-loop with the
deployment-side NumpyPolicy (no JAX in the control loop)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np
import jax.numpy as jnp

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer, enable_compilation_cache
from aerial_gym_simulator_tpu.sim2real import NumpyPolicy, export_policy_npz

if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=2048)
    p.add_argument("--total_steps", type=int, default=20_000_000)
    p.add_argument("--play_steps", type=int, default=300)
    args = p.parse_args()

    enable_compilation_cache()
    num_envs = args.num_envs
    task = ag.task_registry.make_task("position_setpoint_task",
                                      num_envs=num_envs, seed=0)
    cfg = PPOConfig(num_envs=num_envs, horizon=32,
                    minibatch_size=min(8192, num_envs * 32),
                    total_env_steps=args.total_steps, seed=0)
    trainer = PPOTrainer(task, cfg)
    trainer.train()
    trainer.save_checkpoint("/tmp/inference_example.ckpt")
    export_policy_npz("/tmp/inference_example.ckpt",
                      "/tmp/inference_example.npz")

    policy = NumpyPolicy("/tmp/inference_example.npz")
    obs, *_ = task.reset()
    total = 0.0
    for i in range(args.play_steps):
        actions = policy(np.asarray(obs["observations"]))
        obs, reward, term, trunc, infos = task.step(jnp.asarray(actions))
        total += float(reward.mean())
        if i % 50 == 49:
            print(f"step {i}: mean reward {total / (i + 1):.3f} "
                  f"crashes {int(term.sum())}")
    print(f"numpy-policy closed loop done; mean step reward {total/args.play_steps:.3f}")

    # LibTorch-only deployment artifact (reference convert_model.py flow)
    try:
        from aerial_gym_simulator_tpu.sim2real import (
            convert_model_to_script_model)
        pt = convert_model_to_script_model("/tmp/inference_example.npz",
                                           "/tmp/inference_example.pt")
        import torch
        m = torch.jit.load(pt)
        a = m(torch.as_tensor(np.asarray(obs["observations"][:2]).copy()))
        print(f"TorchScript deployment module written to {pt}; "
              f"sample action {np.asarray(a.detach())[0].round(3)}")
    except ImportError:
        print("torch unavailable — skipped the TorchScript export step")
