#!/usr/bin/env bash
# Radar navigation end-to-end on the chip (RADAR_TRAIN.jsonl).
#
# The radar task is the hardest shipped combination: the lmf2 fake-radar
# cone sees only +-60 deg AND 80% of downsampled returns are invalidated
# every frame (reference radar_navigation_task.py:16-19). The reference
# trains it ONLY through sample-factory with a GRU core and budgets 131 B
# env steps (train_aerialgym.py:223-245) — it publishes no success number.
# Ablations (PERF.md round 3): the robot/env/controller learn with clean
# obs, and the magpie lidar robot learns WITH 80% dropout; the cone+dropout
# combination is the hard part. Train recurrent, train long.
#
# Run ALONE (TPU exclusivity — .claude/skills/verify/SKILL.md).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-RADAR_TRAIN.jsonl}"
STEPS="${RADAR_STEPS:-300000000}"
: > "$OUT"

echo "== 1/2 radar navigation PPO ($STEPS steps, GRU-128, 512 envs)" >&2
T0=$SECONDS
# --entropy_coef 0.001 is LOAD-BEARING (the reference's
# exploration_loss_coeff for this task): without it the policy collapses
# to a hover local optimum and flatlines at reward -0.4 for 160M+ steps
# (measured, PERF.md round 3); with it the reward passes +3 by 40M.
timeout 5400 python -m aerial_gym_simulator_tpu.rl.ppo \
  --task radar_navigation_task --num_envs 512 --total_steps "$STEPS" \
  --rnn gru --rnn_hidden 128 --entropy_coef 0.001 --seed 7 \
  --save /tmp/radar_nav.ckpt 2>&1 | tee /tmp/radar_nav.log | tail -3 || exit 1
PPO_S=$((SECONDS - T0))

echo "== 2/2 eval (recurrent, episode-boundary hidden resets)" >&2
timeout 1800 python - "$OUT" <<PYEOF
import json, re
import numpy as np
import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer, enable_compilation_cache
enable_compilation_cache()
task = ag.task_registry.make_task("radar_navigation_task", num_envs=64, seed=1)
trainer = PPOTrainer(task, PPOConfig(num_envs=64, horizon=8, minibatch_size=256,
                                     rnn="gru", rnn_hidden=128))
trainer.load_checkpoint("/tmp/radar_nav.ckpt")
obs, *_ = task.reset()
succ = crash = timo = 0
done_prev = None
for i in range(800):
    a = trainer.act(obs["observations"], deterministic=True, done_prev=done_prev)
    obs, r, term, trunc, infos = task.step(a)
    done_prev = (np.asarray(term) > 0) | (np.asarray(trunc) > 0)
    succ += int(np.asarray(infos["successes"]).sum())
    crash += int(np.asarray(infos["crashes"]).sum())
    timo += int(np.asarray(infos["timeouts"]).sum())
tot = max(succ + crash + timo, 1)
sps = [int(x) for x in re.findall(r"sps (\d+)", open("/tmp/radar_nav.log").read())]
rew = re.findall(r"reward\s+([-\d.]+)", open("/tmp/radar_nav.log").read())
rec = {"metric": "radar_navigation_e2e", "ppo_s": $PPO_S,
       "ppo_steps_per_s": sps[-1] if sps else None,
       "final_train_reward": float(rew[-1]) if rew else None,
       "success": succ, "success_pct": round(100.0 * succ / tot, 1),
       "crash": crash, "timeout": timo}
open("$OUT", "a").write(json.dumps(rec) + "\n")
print(json.dumps(rec))
PYEOF
echo "done -> $OUT" >&2
