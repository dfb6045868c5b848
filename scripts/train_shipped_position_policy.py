"""Train + ship the repo's own position-control policy artifacts.

Produces the policy-regression anchors the reference ships as trained
checkpoints (examples/rl_games_example/networks/, sim2real/weights/ —
VERDICT r1 item 4), plus the committed learning-curve artifact for the
"sub-minute position PPO" headline (BASELINE.md):

  aerial_gym_simulator_tpu/sim2real/weights/position_policy.npz
  aerial_gym_simulator_tpu/sim2real/weights/position_policy_eval.json
  aerial_gym_simulator_tpu/sim2real/weights/position_learning_curve.json

Run ALONE on the chip:  python scripts/train_shipped_position_policy.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "aerial_gym_simulator_tpu", "sim2real", "weights")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=8192)
    ap.add_argument("--total_steps", type=int, default=40_000_000)
    ap.add_argument("--reward_threshold", type=float, default=12.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import aerial_gym_simulator_tpu as ag
    from aerial_gym_simulator_tpu.rl.ppo import (PPOConfig, PPOTrainer,
                                                 enable_compilation_cache)
    from aerial_gym_simulator_tpu.sim2real.numpy_policy import (
        export_policy_npz,
        load_policy_npz,
    )

    enable_compilation_cache()
    os.makedirs(OUT_DIR, exist_ok=True)

    N = args.num_envs
    task = ag.task_registry.make_task("position_setpoint_task", num_envs=N,
                                      seed=0)
    cfg = PPOConfig(num_envs=N, horizon=32, minibatch_size=8192, epochs=4,
                    seed=0, total_env_steps=args.total_steps)
    trainer = PPOTrainer(task, cfg)
    t0 = time.perf_counter()
    history = trainer.train(log_every=5)
    wall = time.perf_counter() - t0

    # learning curve: first log point crossing the reward threshold
    cross = next((m for m in history
                  if m["reward_mean"] >= args.reward_threshold), None)
    curve = {
        "reward_threshold": args.reward_threshold,
        "env_steps_to_threshold": cross["env_steps"] if cross else None,
        "wall_s_to_threshold": round(cross["wall_s"], 1) if cross else None,
        "final_reward": round(history[-1]["reward_mean"], 3),
        "total_env_steps": history[-1]["env_steps"],
        "total_wall_s": round(wall, 1),
        "steady_state_steps_per_s": round(history[-1]["env_steps_per_s"]),
        "num_envs": N,
        "history": [{k: (round(v, 4) if isinstance(v, float) else v)
                     for k, v in m.items()} for m in history],
    }
    with open(os.path.join(OUT_DIR, "position_learning_curve.json"), "w") as f:
        json.dump(curve, f, indent=1)
    print(f"threshold {args.reward_threshold} crossed at "
          f"{curve['env_steps_to_threshold']} steps / "
          f"{curve['wall_s_to_threshold']}s wall "
          f"(total {wall:.1f}s incl. compile)")

    ckpt = "/tmp/shipped_position.ckpt"
    trainer.save_checkpoint(ckpt)
    npz = os.path.join(OUT_DIR, "position_policy.npz")
    export_policy_npz(ckpt, npz)

    # deterministic closed-loop eval through the NUMPY runner (exactly what
    # a deployment consumer runs)
    eval_envs = 256
    etask = ag.task_registry.make_task("position_setpoint_task",
                                       num_envs=eval_envs, seed=123)
    policy = load_policy_npz(npz, num_envs=eval_envs)
    obs, *_ = etask.reset()
    crashes = 0
    errs = []
    for i in range(300):
        act = policy(np.asarray(obs["observations"]))
        obs, r, term, trunc, info = etask.step(jnp.asarray(act))
        crashes += int(np.asarray(term).sum())
        if i >= 100:   # steady hover window (target = origin)
            errs.append(np.linalg.norm(np.asarray(etask.state.pos), axis=-1))
    err = float(np.mean(errs))
    ev = {"eval_envs": eval_envs, "steps": 300, "crashes": crashes,
          "mean_distance_to_target_m": round(err, 4),
          "final_reward_train": curve["final_reward"]}
    with open(os.path.join(OUT_DIR, "position_policy_eval.json"), "w") as f:
        json.dump(ev, f, indent=1)
    print("eval:", ev)


if __name__ == "__main__":
    main()
