"""Single-file PPO training script (CleanRL style).

Parity with reference rl_training/cleanrl/ppo_continuous_action.py: one
runnable file, argparse flags, optional tensorboard logging, checkpoint
save/load — but the rollout storage, GAE and PPO update are the framework's
fused on-device learner rather than a host-side python loop.

Usage:
    python -m aerial_gym_simulator_tpu.rl_training.cleanrl.ppo_continuous_action \
        --task position_setpoint_task --num_envs 8192 --total_steps 50000000
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="position_setpoint_task")
    p.add_argument("--exp_name", default="ppo_aerial")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--num_envs", type=int, default=8192)
    p.add_argument("--total_steps", type=int, default=50_000_000)
    p.add_argument("--num_steps", type=int, default=32,
                   help="rollout horizon per env")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--gae_lambda", type=float, default=0.95)
    p.add_argument("--update_epochs", type=int, default=4)
    p.add_argument("--minibatch_size", type=int, default=8192)
    p.add_argument("--clip_coef", type=float, default=0.2)
    p.add_argument("--ent_coef", type=float, default=0.0)
    p.add_argument("--vf_coef", type=float, default=2.0)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--reward_scale", type=float, default=0.1)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--save_path", default=None)
    p.add_argument("--track", action="store_true",
                   help="write tensorboard scalars")
    p.add_argument("--log_dir", default="/tmp/aerial_gym_tpu_tb")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend before first device use (the axon TPU plugin ignores JAX_PLATFORMS=cpu)")
    args = p.parse_args()
    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    return args


def main():
    args = parse_args()

    import aerial_gym_simulator_tpu as ag
    from aerial_gym_simulator_tpu.rl.ppo import (
        PPOConfig,
        PPOTrainer,
        enable_compilation_cache,
    )

    enable_compilation_cache()

    task = ag.task_registry.make_task(args.task, num_envs=args.num_envs,
                                      seed=args.seed)
    cfg = PPOConfig(
        num_envs=args.num_envs,
        horizon=args.num_steps,
        minibatch_size=min(args.minibatch_size,
                           args.num_envs * args.num_steps),
        epochs=args.update_epochs,
        gamma=args.gamma,
        gae_lambda=args.gae_lambda,
        clip_eps=args.clip_coef,
        value_coef=args.vf_coef,
        entropy_coef=args.ent_coef,
        lr=args.learning_rate,
        # CleanRL semantics: constant lr (the reference script's anneal_lr
        # is a linear decay, not rl-games' adaptive KL scheduler), truncation
        # treated as terminal (no time_outs bootstrap), no rl-games bounds
        # loss or value normalization
        lr_schedule="fixed",
        value_bootstrap=False,
        bounds_loss_coef=0.0,
        normalize_value=False,
        max_grad_norm=args.max_grad_norm,
        total_env_steps=args.total_steps,
        reward_scale=args.reward_scale,
        seed=args.seed,
    )
    trainer = PPOTrainer(task, cfg)
    if args.checkpoint and os.path.exists(args.checkpoint):
        trainer.load_checkpoint(args.checkpoint)

    writer = None
    if args.track:
        try:
            from torch.utils.tensorboard import SummaryWriter
            run_name = f"{args.task}__{args.exp_name}__{args.seed}__{int(time.time())}"
            writer = SummaryWriter(os.path.join(args.log_dir, run_name))
        except Exception as e:  # tensorboard optional
            print(f"tensorboard unavailable: {e}")

    history = trainer.train()

    if writer is not None:
        for m in history:
            step = m["env_steps"]
            for k in ("reward_mean", "crash_rate", "pg_loss", "v_loss",
                      "entropy", "env_steps_per_s"):
                writer.add_scalar(f"charts/{k}", m[k], step)
        writer.close()

    save_path = args.save_path or f"/tmp/{args.task}_cleanrl.ckpt"
    trainer.save_checkpoint(save_path)
    last = history[-1]
    print(f"done: reward {last['reward_mean']:.3f} "
          f"steps/s {last['env_steps_per_s']:.0f} wall {last['wall_s']:.1f}s")


if __name__ == "__main__":
    main()
