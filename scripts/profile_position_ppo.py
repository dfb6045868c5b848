"""A/B the position-PPO parity knobs on chip to localize the r2 regression.

PERF_REMEASURE.jsonl r2: position PPO = 5.93M steps/s steady state vs the
12.3M measured before the reference-parity sweep (adaptive-KL lr,
value_bootstrap, normalize_value, bounds_loss). Everything is in one jitted
scan (no host syncs), so the cost must be in-graph — this script times the
fused train step under each knob toggled off, plus the all-off combination.

Run ALONE on the chip:  python scripts/profile_position_ppo.py
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
    ap.add_argument("--num_envs", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import aerial_gym_simulator_tpu as ag
    from aerial_gym_simulator_tpu.rl.ppo import (PPOConfig, PPOTrainer,
                                                 enable_compilation_cache)
    enable_compilation_cache()

    N = args.num_envs
    base = dict(num_envs=N, horizon=32, minibatch_size=8192, epochs=4,
                seed=0)
    variants = {
        "full (shipped)": {},
        "lr_schedule=fixed": dict(lr_schedule="fixed"),
        "normalize_value=off": dict(normalize_value=False),
        "value_bootstrap=off": dict(value_bootstrap=False),
        "bounds_loss=off": dict(bounds_loss_coef=0.0),
        "all parity knobs off": dict(lr_schedule="fixed",
                                     normalize_value=False,
                                     value_bootstrap=False,
                                     bounds_loss_coef=0.0),
    }

    steps_per_iter = N * 32
    results = {}
    for name, kw in variants.items():
        # fresh task per variant: the previous trainer DONATED the task's
        # carry buffers (donate_argnums), so reusing the task makes the next
        # trainer close over dead device arrays
        task = ag.task_registry.make_task("position_setpoint_task",
                                          num_envs=N, seed=0)
        cfg = PPOConfig(**{**base, **kw})
        trainer = PPOTrainer(task, cfg)
        ts, carry, obs, key, norm = (trainer.train_state, trainer.env_carry,
                                     trainer.obs, trainer.key, trainer.norm)
        # compile + warmup
        ts, carry, obs, key, norm, m = trainer._train_step(ts, carry, obs,
                                                           key, norm)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            ts, carry, obs, key, norm, m = trainer._train_step(
                ts, carry, obs, key, norm)
        jax.block_until_ready(m)
        dt = time.perf_counter() - t0
        sps = args.iters * steps_per_iter / dt
        results[name] = sps
        print(f"{name:28s} {sps/1e6:7.2f}M steps/s "
              f"({1e3 * dt / args.iters:.2f} ms/iter)")

    # the full train() loop (what remeasure_tpu.sh measures) vs the raw
    # step: quantifies host-loop overhead
    task = ag.task_registry.make_task("position_setpoint_task", num_envs=N,
                                      seed=0)
    trainer = PPOTrainer(task, PPOConfig(**base))
    hist = trainer.train(total_env_steps=steps_per_iter * (args.iters + 2),
                         log_every=10)
    results["train() loop (shipped)"] = hist[-1]["env_steps_per_s"]
    print(f"{'train() loop (shipped)':28s} "
          f"{hist[-1]['env_steps_per_s']/1e6:7.2f}M steps/s")

    print(json.dumps({k: round(v) for k, v in results.items()}))


if __name__ == "__main__":
    main()
